package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SCALE.md's sf1 serving-tier rehearsal: the
  * indexed serving families' sub-linear-read claim, MEASURED at 10× the
  * bench scale instead of extrapolated from sf0.1.
  *
  * Usage (one JSON line per dir, in order):
  *   runMain graft.ServingScaleProbe <dir> [<srcDir>*<k>=<destDir>] ...
  *
  * The `src*k=dest` form materializes a k× replica of every table the six
  * families read (ids offset per replica; `documents.text`, `p_name`, and
  * embeddings IDENTICAL across replicas — replication preserves the
  * term/trigram document-frequency shape, so posting lists scale ×k, the
  * honest "same corpus, bigger" model; geo coordinates DERIVE from the
  * offset ids, so shapes get k× new distinct locations). Small dimension
  * tables copy verbatim. Caveat, documented with the numbers: identical
  * replica text makes every document a 10-clone near-dup cluster, so the
  * dedup screen's rehearsal is its all-duplicates WORST CASE, an upper
  * bound — term-stat families are unaffected.
  *
  * Per family it reports: `build` = first run (artifact ensure() + read)
  * and `read` = median of 3 further runs (artifacts exist — the serving
  * path). Nothing outside dest is written.
  */
object ServingScaleProbe {

  /** The indexed serving families of VERDICT r5 "Next #7", plus the
    * artifact-served stop-gram batch — the mitigation the rehearsal's one
    * finding (fuzzy_batch_indexed's candidate cliff at sf1) calls for —
    * plus the remaining indexed/serving-twin rows so the sub-linear-read
    * claim is measured for the WHOLE serving tier, not a sample. */
  val Families: Seq[String] = Seq(
    "fuzzy_batch_indexed", "fuzzy_batch_stopgram_indexed", "text_bm25_batch",
    "dedup_incremental", "dsir_weights_indexed", "ann_int8_topk",
    "geo_radius_latlng_indexed",
    "text_bm25_topk", "ann_pq_indexed", "quality_lr_indexed",
    "corpus_stats_indexed", "corpus_prep_indexed", "fuzzy_indexed",
    "search_hybrid_ivf",
    // round 9: the two-level + compressed serving stack over graft_ivf /
    // graft_ivfpq (single-probe served forms, the batch ADC face, and the
    // int8-refined full ladder)
    "ann_ivf2_bucketed", "ann_ivf2pq_bucketed", "ann_ivfpq_batch",
    "ann_ivf2pq_refine",
    // late round 9: the trained-LM fluency filter's serving face
    // (kind-pruned graft_lmmodel read + bigram-key scoring join)
    "lm_score_indexed",
    // round 9: the minseg tokenizer's served encode (per-word DP
    // table join), plus the two winnowing rows — NOT serving reads but
    // batch ops measured here because the identical-replica corpus is
    // their df-hot WORST CASE (every fingerprint 10× hot, pair buckets
    // ×45) — the honest upper bound for the df-cap escalation note
    "tok_minseg_indexed", "text_winnow", "dedup_winnow_pairs",
    // round 10: the full hybrid ladder (coarse groups → PQ shortlist →
    // int8 refine, zero float-vector scans), the composed e2e DAG's
    // manifest read (ONE final-artifact scan; build = the whole
    // six-artifact chain incl. docmeta + LM model — the ingest cost),
    // the capped winnow join (the df-cap escalation at its clone-heavy
    // worst case), and the containment auto dispatch (prediction +
    // chosen branch)
    "search_hybrid_ladder", "corpus_e2e", "dedup_winnow_capped",
    "dedup_containment_auto",
    // the trainer's shard read (partition-pruned layout scan) and the
    // asymmetric ingest screen (batch-vs-corpus prefix probe)
    "corpus_e2e_read", "dedup_containment_screen",
    // tier 3 of the batch-fuzzy ladder: the champion (absolute-truncation)
    // index — the 100x rehearsal's answer to the stop-gram tier's
    // residual quadratic
    "fuzzy_batch_champ",
    // round 11: the wired winnow dispatch (prediction + chosen branch),
    // the auto-sized IVF read, the two-level-assigned index read, and
    // the winnow pairs served from the materialized selection artifact
    "dedup_winnow_auto", "ann_ivf_auto", "ann_ivf2_assigned",
    "dedup_winnow_indexed")

  private[graft] def replicate(spark: SparkSession, src: String, k: Int, dest: String): Unit = {
    // dest == src would overwrite the source tables mid-read; the id-space
    // shift must also survive non-long id columns and empty tables (max of
    // an empty relation is null → coalesce to 0).
    require(src != dest, s"replicate: dest must differ from src ($src)")
    val reps = spark.range(k).select(col("id").as("rep"))
    def rep(table: String, idCol: String): Unit = {
      val t = spark.read.parquet(s"$src/$table.parquet")
      val maxId = t.agg(coalesce(max(col(idCol).cast("long")), lit(-1L)))
        .head().getLong(0) + 1L
      // The shift promotes the id to BIGINT (rep is a long); cast back to
      // the source column's type — tools/compare.py is type-exact, so a
      // replica with a widened id would fail the gate it rehearses for.
      val idType = t.schema(idCol).dataType
      t.crossJoin(reps)
        .withColumn(idCol, (col(idCol) + col("rep") * maxId).cast(idType))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dest/$table.parquet")
    }
    rep("documents", "doc_id")
    rep("embeddings", "vec_id")
    rep("part", "p_partkey")
    rep("customer", "c_custkey")
    Seq("region", "nation", "supplier", "orders", "lineitem", "events")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dest/$t.parquet")
      }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.length - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ServingScaleProbe <dir | src*k=dest> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = "(.+)\\*(\\d+)=(.+)".r
    args.foreach { a =>
      val dir = a match {
        case spec(src, k, dest) => replicate(spark, src, k.toInt, dest); dest
        case d => d
      }
      // SPARK_GRAFT_PROBE_FAMILIES=a,b,c restricts the run (local
      // iteration on a new family without rebuilding the other artifacts)
      val only = sys.env.get("SPARK_GRAFT_PROBE_FAMILIES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      val rows = Families.filter(n => only.forall(_.contains(n))).map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val build = (System.nanoTime() - t0) / 1e9
        val reads = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          System.gc()
          val t1 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t1) / 1e9
        }
        f""""$name":{"build":$build%.2f,"read":${median(reads)}%.2f}"""
      }
      println(s"""{"metric":"serving_scale","dir":"$dir","families":{${rows.mkString(",")}}}""")
    }
    spark.stop()
  }
}
