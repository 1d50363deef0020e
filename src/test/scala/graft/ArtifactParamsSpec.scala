package graft

import org.scalatest.funsuite.AnyFunSuite

/** The parameter-blind-artifact CI tripwire ([[ArtifactParams]] — the
  * round-15 systematization of a class that bit in round 13 (champost
  * parameterizations) and twice in round 14 (PQ books geometry,
  * correlated-seed labels/docglobal): for every version-keyed artifact
  * family, the GOLDEN rows below pin (version, parameter fingerprint) as
  * they were when the version was last bumped. Changing a
  * content-determining constant (a seed family, a signature width, a
  * hash-space choice, an upstream version) without bumping the family's
  * version fails here with the exact parameter diff — BEFORE a stale
  * artifact gets a chance to serve a wrong decision that only a full
  * oracle run could catch.
  *
  * On a legitimate derivation change: bump the family's version constant
  * AND update its golden row (both sides of the change are then visible
  * in the same diff, which is the point).
  *
  * Parameter-carrying kinds (`graft_champost_<inv>_<cap>`,
  * `graft_pqcodes_m<M>k<K>`, `graft_ivf_m<mod>_c<cells>`…) re-key on any
  * parameter change by construction — the structural tests below pin
  * that the parameters really are in the kind string. */
class ArtifactParamsSpec extends AnyFunSuite {

  private val golden: Seq[(String, Int, String)] = Seq(
    ("graft_bands", 3, "minhash_k=32;bands=8;shingle_words=3;perm_family=893357628/649024612,493524570/973333486,323194151/322486345"),
    ("graft_fuzzylsh", 2, "hashes=32;rows_per_band=2;perm_family=893357628/649024612,493524570/973333486,323194151/322486345"),
    ("graft_labels", 2, "bands_version=3;minhash_k=32;bands=8;shingle_words=3;perm_family=893357628/649024612,493524570/973333486,323194151/322486345"),
    ("graft_docbase", 3, "identity_hash=xxhash64"),
    ("graft_docwins", 2, "identity_hash=xxhash64"),
    ("graft_docglobal", 3, "identity_hash=xxhash64;docbase_version=3;docwins_version=2;bands_version=3;minhash_k=32;perm_family=893357628/649024612,493524570/973333486,323194151/322486345"),
    ("graft_kmeans", 2, "quant_scale=1000000;mean=spherical-unit-normalized"),
    ("graft_ivfpq_t", 1, "kmeans_version=2;quant_scale=1000000;train_iters=2"))

  test("every version-keyed family's parameters match the fingerprint its version was pinned at") {
    val goldenByKind = golden.map(g => g._1 -> g).toMap
    ArtifactParams.registry.foreach { f =>
      val g = goldenByKind.getOrElse(f.kind, fail(
        s"family '${f.kind}' is registered but has no golden row — add " +
          s"""("${f.kind}", ${f.version}, "${f.fingerprint}") to ArtifactParamsSpec"""))
      assert(g._2 == f.version && g._3 == f.fingerprint,
        s"\nartifact family '${f.kind}' changed without a clean version bump:" +
          s"\n  golden:  v${g._2}  ${g._3}" +
          s"\n  current: v${f.version}  ${f.fingerprint}" +
          "\nIf the derivation change is intentional: bump the family's " +
          "version constant AND update this spec's golden row (an unbumped " +
          "version would keep serving artifacts built under the old " +
          "parameters — the round-13/14 stale-artifact class).")
    }
  }

  test("the registry covers every golden family (no silent deregistration)") {
    val registered = ArtifactParams.registry.map(_.kind).toSet
    golden.foreach { case (kind, _, _) =>
      assert(registered.contains(kind),
        s"golden family '$kind' vanished from ArtifactParams.registry — " +
          "if the artifact family was removed, delete its golden row too")
    }
  }

  test("parameter-carrying kinds embed their content-determining parameters in the kind string") {
    import graft.operators.Similarity
    // PQ code artifacts: the round-14 geometry bug class — 8-subspace
    // books decoded under a 16-subspace encode could only happen because
    // geometry was NOT in the kind; it is now, so a geometry change
    // re-keys instead of mis-decoding
    assert(s"graft_pqcodes_m${Similarity.PqM}k${Similarity.PqK}" ==
      "graft_pqcodes_m16k64")
    // champion posting artifacts: cut parameters are the key (round 13)
    val inv = 7L; val cap = 3
    assert(s"graft_champost_${inv}_$cap" == "graft_champost_7_3")
  }
}
