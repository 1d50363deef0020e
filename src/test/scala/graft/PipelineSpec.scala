package graft

import graft.operators.{Cdc, EventOps, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-operator invariants of the corpus-assembly family — relations
  * BETWEEN gated queries that the per-query oracle cannot see (each gate
  * checks one result in isolation; these check the family agrees with
  * itself). */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("pipeline-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("chunks tile each document exactly: lengths sum to n_pieces, contiguous") {
    val pack = Pipeline.docPack(spark, dir)
      .select(col("doc_id"), col("n_pieces")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Pipeline.docChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    chunks.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._4).sum == pack(docId), s"doc $docId lengths")
      // contiguous, starting at 0
      assert(sorted.head._3 == 0L, s"doc $docId first offset")
      sorted.sliding(2).foreach {
        case Array((_, _, off1, len1), (_, _, off2, _)) =>
          assert(off2 == off1 + len1, s"doc $docId gap at pack boundary")
        case _ => ()
      }
    }
    // every doc with pieces has chunks; empty docs have none
    assert(chunks.keySet == pack.filter(_._2 > 0).keySet)
  }

  test("stratified sample hits the exact per-mille rates where they are total") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Pipeline.sampleStratified(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fr keeps 1000/1000 — exact; en keeps 250/1000 — hash-binomial
    assert(kept("fr") == docs("fr"))
    val enRatio = kept.getOrElse("en", 0L).toDouble / docs("en")
    assert(enRatio > 0.1 && enRatio < 0.45, s"en ratio $enRatio")
  }

  test("deterministic shuffle is a permutation: every doc exactly once") {
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val s = Pipeline.corpusShuffle(spark, dir)
    assert(s.count() == total)
    assert(s.select("doc_id").distinct().count() == total)
    // positions are dense 1..count(shard) within each shard
    val bad = s.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.count() == 0)
  }

  test("temperature mix upsamples the rare source to its sqrt share on skewed data") {
    import spark.implicits._
    // big: 100 docs, rare: 4. Strides: floor(1e6/10)=100000, floor(1e6/2)=500000.
    // Merged ascending positions, top 30 = 26 big + ALL 4 rare — a sqrt-share
    // ~1/6 emission vs the proportional ~1/26 a straight interleave gives.
    val d = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "rare"))).toDF("doc_id", "source")
    val out = Pipeline.mixTemperatureOver(d, limit = 30).collect()
    assert(out.length == 30)
    val bySrc = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySrc == Map("big" -> 26, "rare" -> 4), bySrc.toString)
    // seq is a total order 1..30
    assert(out.map(_.getLong(0)).toSeq == (1L to 30L))
  }

  test("epoch-capped mix water-fills: small sources cap at 4 epochs, budget lands exactly") {
    import spark.implicits._
    // Skewed: a and b's sqrt-shares of the 3x target far exceed 4 epochs
    // of themselves -> both saturate; c absorbs the freed budget.
    val per = Seq(("a", 100L), ("b", 10000L), ("c", 1000000L)).toDF("source", "n_tok")
    val out = Pipeline.mixEpochCapOver(per).collect()
    val m = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m("a") == ((100L, 400L, 400L, 4000L)), m.toString)
    assert(m("b") == ((10000L, 40000L, 40000L, 4000L)), m.toString)
    // T = (1010100 * 3000) div 1000 = 3030300; the single uncapped source
    // absorbs the remainder exactly (floor is exact when one source is left)
    assert(m("c")._3 == 3030300L - 400L - 40000L, m.toString)
    assert(m("c")._4 == 2989L, m.toString)
    out.foreach(r => assert(r.getLong(3) <= r.getLong(2), "alloc exceeds cap"))
  }

  test("epoch schedule lands each source near its allocated token volume") {
    import org.apache.spark.sql.functions._
    val plan = Pipeline.mixEpochCap(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val docTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(lower(col("text"))))
          .cast("long").as("tok"))
    val sched = Pipeline.mixEpochApply(spark, dir)
    val landed = sched.join(docTok, Seq("doc_id", "source"))
      .groupBy(col("source"))
      .agg(sum(col("n_copies") * col("tok")).as("got")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    landed.foreach { case (src, got) =>
      val want = plan(src).toDouble
      assert(got > 0.85 * want && got < 1.15 * want,
        s"$src landed $got vs alloc $want — hash coin off its rate")
    }
    // copies only ever take the two adjacent values base/base+1
    val counts = sched.select(col("source"), col("n_copies")).distinct()
      .groupBy(col("source")).agg(countDistinct(col("n_copies")).as("k"))
      .collect()
    counts.foreach(r => assert(r.getLong(1) <= 2, r.toString))
  }

  test("epoch-capped mix degenerates to the tau share when nothing caps") {
    import spark.implicits._
    val per = Seq(("x", 1000L), ("y", 1000L), ("z", 1000L)).toDF("source", "n_tok")
    val out = Pipeline.mixEpochCapOver(per).collect()
    // uniform sources, 3x target, 4-epoch cap: everyone trains 3 epochs
    out.foreach { r =>
      assert(r.getLong(3) == 3000L, r.toString)
      assert(r.getLong(4) == 3000L, r.toString)
    }
  }

  test("CDC merge applies updates and removes deletions") {
    val merged = Cdc.mergeUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(3))).toMap
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.keys.foreach { k =>
      (k % Cdc.UpdateMod) match {
        case Cdc.DeleteRem => assert(!merged.contains(k), s"key $k not deleted")
        case Cdc.UpdateRem =>
          assert(merged(k) == ((base(k) + Cdc.PriceBump, 2L)), s"key $k not updated")
        case _ => assert(merged(k) == ((base(k), 1L)), s"key $k changed")
      }
    }
  }

  test("funnel conversion counts are weakly decreasing down the steps") {
    val ns = EventOps.funnel(spark, dir).collect().sortBy(_.getLong(0)).map(_.getLong(2))
    assert(ns.length == EventOps.FunnelSteps.length)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns.toSeq.toString)
    assert(ns.head > 0)
  }

  test("split leakage agrees with dedup_minhash ⋈ corpus_split recomposed") {
    import graft.operators.{Dedup, Pipeline}
    // threshold 0: EVERY straddling banded pair counts — the consistency
    // surface is maximal and sf0.001 is guaranteed non-vacuous
    val got = Pipeline.splitLeakage(spark, dir, threshold = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val splits = Pipeline.corpusSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val want = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (a, b, splits(a), splits(b)) }
      .filter { case (_, _, sa, sb) => sa != sb }.toSet
    assert(want.nonEmpty, "no straddling banded pair — the pin is vacuous")
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("split-after-dedup: clean splits are leakage-free where raw splits are not") {
    import graft.operators.Pipeline
    val Array(naive, surviving, clean) =
      Pipeline.splitLeakageClean(spark, dir).collect().head
        .toSeq.map(_.asInstanceOf[Long]).toArray
    // the hazard is real on the raw corpus (else the pin is vacuous) ...
    assert(naive > 0, s"no straddling near-dup pair at the threshold — vacuous")
    // ... and structurally impossible after dedup-then-split: every pair at
    // est >= PipelineEstThreshold demoted its larger id from canonicality,
    // so the clean-split universe contains NO near-dup pair at all
    assert(surviving == 0L, s"$surviving near-dup pairs survived dedup")
    assert(clean == 0L, s"$clean straddling pairs in clean splits")
  }

  test("corpus_split_clean is corpus_split restricted to canonical survivors") {
    import graft.operators.{Dedup, Pipeline}
    val canon = Dedup.dedupPipeline(spark, dir).collect()
      .filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    val raw = Pipeline.corpusSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = raw.filter(t => canon(t._1)).toSeq
    val got = Pipeline.corpusSplitClean(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(got.nonEmpty && got == want)
    // a surviving doc's split equals its raw-corpus split: assignment is a
    // pure function of doc_id, so re-splitting after dedup never MOVES an
    // eval doc into train (the cross-version contamination guarantee)
    assert(got.toSet.subsetOf(raw.toSet))
  }

  test("manifest shard volumes agree with the shuffle permutation") {
    import graft.operators.Pipeline
    val manifest = Pipeline.corpusManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shuffle = Pipeline.corpusShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perShard = shuffle.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    assert(manifest == perShard, s"manifest=$manifest shuffle=$perShard")
    assert(manifest.size == Pipeline.NumShards && manifest.values.forall(_ > 0),
      s"empty shard: $manifest")
    assert(manifest.values.sum == Tables.documents(spark, dir).count())
  }

  test("token-budget cut is the MAXIMAL prefix of the shuffle order") {
    import graft.operators.Pipeline
    val docs = Tables.documents(spark, dir)
    val total = docs.select(
      sum(size(graft.functions.TextFunctions.tokens(lower(col("text")))).cast("long")))
      .collect().head.getLong(0)
    val budget = total * Pipeline.TokenBudgetPermille / 1000
    val kept = Pipeline.corpusTakeBudget(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // non-vacuous at both ends: a real cut, not empty and not everything
    assert(kept.nonEmpty && kept.length < docs.count())
    // within budget, and the running column is the true cumulative sum
    val last = kept.map(_._4).max
    assert(last <= budget, s"run $last > budget $budget")
    assert(kept.map(_._3).sum == last, "run_tok drifts from the token sum")
    // MAXIMAL: the first excluded doc in shuffle order would break the
    // budget (recompose the global order independently of the operator)
    val keptIds = kept.map(_._2).toSet
    val ordered = Pipeline.corpusShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val firstOut = ordered.find(t => !keptIds.contains(t._3))
    firstOut.foreach { case (_, _, id) =>
      val tok = docs.filter(col("doc_id") === id)
        .select(size(graft.functions.TextFunctions.tokens(lower(col("text")))).cast("long"))
        .collect().head.getLong(0)
      assert(last + tok > budget,
        s"doc $id (tok=$tok) was excluded but fits: $last + $tok <= $budget")
      // and everything after the cut point is excluded too (prefix shape)
      val cutIdx = ordered.indexWhere(_._3 == id)
      assert(ordered.drop(cutIdx).forall(t => !keptIds.contains(t._3)),
        "kept docs appear after the first excluded doc — not a prefix")
    }
  }

  test("contamination fraction agrees with the boolean screen, graded strictly") {
    import graft.operators.CorpusPrep
    val frac = CorpusPrep.contaminationFrac(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val flag = CorpusPrep.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(frac.keySet == flag.keySet)
    // dirty_permille > 0 ⟺ contaminated — the graded face never disagrees
    // with the screen on WHO is dirty, only says how much
    frac.foreach { case (id, pm) =>
      assert((pm > 0) == flag(id), s"doc $id: permille=$pm flag=${flag(id)}")
    }
    // non-vacuous AND strictly graded: a partially-dirty doc exists
    val dirty = frac.values.filter(_ > 0)
    assert(dirty.nonEmpty, "no contaminated doc — pin is vacuous")
    assert(dirty.exists(pm => pm < 1000L),
      s"every dirty doc is 100% dirty — grading shows nothing: $dirty")
  }

  test("e2e chain staleness is transitive: a data re-publish rebuilds through to the layout") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("e2e_stale").toFile.getAbsolutePath
    val tmp2 = Files.createTempDirectory("e2e_fresh").toFile.getAbsolutePath
    val srcDocs = spark.read.parquet(s"$dir/documents.parquet")
    srcDocs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def manifest(d: String) =
      Pipeline.corpusE2e(spark, d).collect().map(_.toSeq).toSeq
    val m1 = manifest(tmp)
    // re-publish: the corpus replaced WHOLESALE by its first half — every
    // chained artifact (docmeta → clean → lmcut → budget → pack → shards)
    // must go stale in turn; serving any intermediate stage stale would
    // leave the manifest at m1 or diverge from a fresh build
    val half = srcDocs.filter(col("doc_id") < 250)
    half.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m2 = manifest(tmp)
    assert(m1 != m2, "layout served stale after a data re-publish")
    // the transitively rebuilt chain must equal a from-scratch build of
    // the same re-published corpus in a virgin directory
    half.write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    assert(m2 == manifest(tmp2),
      "rebuilt chain diverges from a fresh build — some stage served stale")
  }

  test("corpus_e2e composition invariants: lm cut, budget maximality, epoch copies, order-free checksums") {
    import graft.operators.CorpusPrep
    import graft.functions.TextFunctions.polyHash
    val shardsPath = Pipeline.ensureCorpusE2e(spark, dir)
    val layout = spark.read.parquet(shardsPath)
    val meta = CorpusPrep.docMetaIndexed(spark, dir)
    // INDEPENDENT driver-side recomputation of the whole chain (not the
    // operators' own code, which a shared bug would satisfy).
    // 1. LM-fluency cut: exact interpolated median over the canonical
    //    slice (all splits), keep lm_score >= median.
    val cleanRows = meta.filter(col("is_canonical"))
      .select(col("doc_id"), col("n_tok"), col("lm_score"), col("source"),
        polyHash(concat(lit(Pipeline.ShuffleSalt), col("doc_id").cast("string")))
          .as("h"),
        pmod(polyHash(concat(lit(Pipeline.SplitSalt), col("doc_id").cast("string"))),
          lit(1000L)).as("split_coin"),
        pmod(polyHash(concat(lit(Pipeline.EpochSalt), col("doc_id").cast("string"))),
          lit(1000L)).as("epoch_coin"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Double]("lm_score"), r.getAs[Long]("h"),
        r.getAs[Long]("split_coin"), r.getAs[Long]("epoch_coin"),
        r.getAs[String]("source")))
    val scores = cleanRows.map(_._3).sorted
    val rank = 0.5 * (scores.length - 1)
    val lo = rank.toInt
    val med = if (lo + 1 < scores.length)
      scores(lo) + (rank - lo) * (scores(lo + 1) - scores(lo)) else scores(lo)
    val lmKept = cleanRows.filter(_._3 >= med)
    assert(lmKept.length < cleanRows.length && lmKept.nonEmpty,
      "lm cut is vacuous or total at this SF")
    // 2. budget MAXIMALITY over the lm-kept TRAIN slice: order by the
    //    shuffle permutation (shard, h, doc_id), walk the prefix sum, and
    //    the kept set must be the maximal prefix fitting 600 permille.
    val train = lmKept.filter(_._5 < Pipeline.SplitTrainUpto)
    val ordered = train
      .map(t => (math.floorMod(t._4, Pipeline.NumShards.toLong), t._4, t._1, t._2, t._6, t._7))
      .sortBy(t => (t._1, t._2, t._3)) // (shard, h, doc_id)
    val budget = ordered.map(_._4).sum * Pipeline.TokenBudgetPermille / 1000
    var run = 0L
    val expectKept = ordered.takeWhile { case (_, _, _, tok, _, _) =>
      run += tok; run <= budget
    }
    assert(expectKept.nonEmpty && expectKept.length < ordered.length,
      "budget cut is vacuous or total at this SF")
    // 3. epoch schedule: water-filling plan over the budgeted slice's
    //    per-source token totals, then the hash-Bernoulli repetition
    //    count per doc — the layout must hold exactly n_copies rows per
    //    kept doc (docs scheduled at 0 copies absent entirely).
    val perSource = expectKept.groupBy(_._6).view.mapValues(_.map(_._4).sum).toMap
    val srcs = perSource.toSeq.map { case (s, n) =>
      (s, n, math.floor(math.sqrt(n.toDouble) * 1000.0).toLong,
        n * Pipeline.EpochCapMax)
    }.sortBy(t => (t._2, t._1)) // (n_tok, source)
    val totW = srcs.map(_._3).sum
    val target = perSource.values.sum * Pipeline.EpochTargetPermille / 1000
    var cumCap = 0L; var cumW = 0L
    val walked = srcs.map { case (s, n, w, cap) =>
      cumCap += cap; cumW += w
      val sat = cap * (totW - cumW) <= (target - cumCap) * w
      (s, n, w, cap, cumCap, cumW, sat)
    }
    val satCap = walked.filter(_._7).map(_._5).maxOption.getOrElse(0L)
    val satW = walked.filter(_._7).map(_._6).maxOption.getOrElse(0L)
    val epochsMilli = walked.map { case (s, n, w, cap, _, _, sat) =>
      // mirror the operator's guard: saturated sources take their cap
      // outright; the water-level division only runs for unsaturated
      // sources, where totW > satW necessarily holds (an unsaturated
      // source's own w is outside the saturated prefix) — asserted so an
      // all-saturated corpus fails with a meaningful message, not /0
      val alloc = if (sat) cap else {
        assert(totW > satW,
          s"unsaturated source $s but zero unsaturated weight (totW=$totW)")
        w * (target - satCap) / (totW - satW)
      }
      s -> alloc * 1000 / n
    }.toMap
    val expectCopies = expectKept.map { case (_, _, id, _, coin, src) =>
      val em = epochsMilli(src)
      id -> (em / 1000 + (if (coin < em % 1000) 1L else 0L))
    }.toMap
    val gotCopies = layout.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCopies == expectCopies.filter(_._2 > 0),
      s"layout copy counts diverge: got ${gotCopies.size} docs, " +
        s"expected ${expectCopies.count(_._2 > 0)}")
    // repetition is real at this SF: some doc is served more than once
    assert(expectCopies.values.exists(_ > 1), "epoch schedule is vacuous")
    // 4. layout balance: every shard populated, none beyond 2x the mean
    //    (regression guard for the affine-mod-8 key bias: the budget
    //    prefix's residue classes leaked into single-hashed layout keys
    //    — round-9's layout had EMPTY shards and the single-hash v3/v4
    //    layouts a 5.8x/3.9x hump; the double-hashed key is multinomial)
    val byShard = layout.groupBy(col("shard")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    assert(byShard.length == Pipeline.NumShards,
      s"only ${byShard.length}/${Pipeline.NumShards} shards populated")
    val meanC = byShard.sum.toDouble / byShard.length
    assert(byShard.max <= 2.0 * meanC,
      s"shard hump: max ${byShard.max} vs mean $meanC")
    // 5. the manifest's checksums are ORDER-FREE: recomputing over a
    //    re-partitioned layout (different partial-aggregation order)
    //    gives identical rows
    val a = Pipeline.corpusE2e(spark, dir).collect().map(_.toSeq).toSeq
    val b = graft.operators.Pipeline
      .e2eManifestOver(layout.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(a == b, "manifest not reproducible under re-partitioning")
    assert(a.nonEmpty && a.map(_.head).distinct.size == a.size)
  }
}
