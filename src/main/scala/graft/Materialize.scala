package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine-materialized artifacts: posting indexes, cell-partitioned ANN
  * indexes, dedup label tables, nested-layout round-trips, bucketed join
  * tables. At 100 TB these writes ARE the ingest — they run once and every
  * query is a read. Three properties are enforced here (and only here, so
  * no operator hand-rolls its own layout):
  *
  *  - **Config-derived location** — rooted under `spark.sql.warehouse.dir`
  *    (overridable via `spark.graft.materialize.dir`), never a hardcoded
  *    checkout path: relocated repos and concurrent sessions with distinct
  *    warehouses cannot collide.
  *  - **Write-once, append-extend** — an artifact is keyed by (kind, input
  *    dir fingerprint, version) and only built when its `_SUCCESS` marker
  *    is absent, so repeat queries pay the pruned read, not the rebuild.
  *    This mirrors the production split: index build at ingest, index scan
  *    per query. New data batches extend an existing artifact via
  *    [[append]] (new files in the same layout) — no wholesale rebuild per
  *    ingest increment.
  *  - **Versioned** — callers bump `version` whenever the derivation
  *    changes; a stale layout written by earlier code is then simply a
  *    different path and can never be read by mistake. The key also folds
  *    in a cheap fingerprint of the input dir (latest mtime of its direct
  *    children), so regenerating test data IN PLACE keys a fresh artifact
  *    instead of silently reusing a stale one.
  *
  * Concurrency limit (documented, not guarded): exists-then-build is not
  * atomic. Two sessions sharing ONE warehouse can both miss the `_SUCCESS`
  * check and race on the same path — the harness runs a single driver per
  * warehouse, which is the supported mode; concurrent sessions must use
  * distinct warehouses (or distinct `spark.graft.materialize.dir`).
  */
object Materialize {

  /** Filesystem-safe tag for an input data directory. */
  def tag(dir: String): String = dir.replaceAll("[^0-9a-zA-Z]+", "_")

  private def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.materialize.dir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        "/graft_artifacts")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Cheap input-data fingerprint: the latest modification time among the
    * input dir's direct children (the per-table parquet entries), hex.
    * One driver-side `listStatus` — no data read, no job. Catches in-place
    * regeneration of a data dir; does NOT catch an edit that preserves
    * every child mtime (then the dir must be re-pathed or `version`
    * bumped). */
  def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    try {
      val kids = fs.listStatus(p)
      if (kids.isEmpty) "0" else kids.map(_.getModificationTime).max.toHexString
    } catch { case _: java.io.IOException => "0" }
  }

  def artifactPath(spark: SparkSession, kind: String, dir: String, version: Int): String =
    s"${root(spark)}/$kind/${tag(dir)}_${fingerprint(spark, dir)}_v$version"

  /** Write-once parquet materialization: `build(path)` runs only when the
    * artifact is absent (no `_SUCCESS` marker). Returns the artifact path.
    * `build` must finish with a committed write to `path` (parquet commit
    * protocol drops the marker). */
  def ensure(spark: SparkSession, kind: String, dir: String, version: Int)
            (build: String => Unit): String = {
    val p = artifactPath(spark, kind, dir, version)
    val marker = new Path(p, "_SUCCESS")
    if (!fsOf(spark, marker).exists(marker)) build(p)
    p
  }

  /** Incremental artifact refresh — the materialized-layout face of the
    * reference's `add_entity` (geo_manager.py:451-476): `appendBuild(path)`
    * must finish with a committed `mode("append")` write, landing the new
    * batch's rows as NEW FILES in the artifact's existing layout (same
    * schema, same partitioning). Readers then see old ∪ new.
    *
    * Exactness holds for row-local derivations (posting explode, cell
    * assignment under a FROZEN codebook): derive(corpus ∪ batch) ==
    * derive(corpus) ∪ derive(batch), so append-then-read is bit-identical
    * to rebuild-then-read (IncrementalIndexSpec pins both index kinds).
    * The trade is file-level, not row-level: appended files cluster the
    * BATCH by the layout key, so per-file min/max stats stay tight but the
    * artifact accumulates one file set per batch — at scale a periodic
    * compaction (rewrite-in-place under a version bump) restores the
    * single-sorted-run read. */
  def append(spark: SparkSession, kind: String, dir: String, version: Int)
            (appendBuild: String => Unit): String = {
    val p = artifactPath(spark, kind, dir, version)
    val marker = new Path(p, "_SUCCESS")
    require(fsOf(spark, marker).exists(marker),
      s"append to absent artifact $p — build it with ensure() first")
    appendBuild(p)
    p
  }

  /** Periodic compaction of an appended artifact: every [[append]] lands
    * one batch-sized file set, so reads accumulate small files and lose
    * the single-sorted-run property; `rewrite(current, tmpPath)` must
    * re-derive the CANONICAL layout (the same write [[ensure]]'s build
    * performs) from the artifact's current contents into `tmpPath`, which
    * is then swapped in place of the old file set. Contents are unchanged
    * — compaction reorganizes files, it does not re-derive from source —
    * so compact-then-read == read (IncrementalIndexSpec pins it against a
    * wholesale rebuild). Swap is delete-then-rename: not atomic for
    * concurrent readers, same single-driver-per-warehouse limit as the
    * exists-then-build check above. */
  def compact(spark: SparkSession, kind: String, dir: String, version: Int)
             (rewrite: (DataFrame, String) => Unit): String = {
    val p = artifactPath(spark, kind, dir, version)
    val cur = new Path(p)
    val fs = fsOf(spark, cur)
    require(fs.exists(new Path(p, "_SUCCESS")),
      s"compact of absent artifact $p — build it with ensure() first")
    val tmp = new Path(p + ".compacting")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    rewrite(spark.read.parquet(p), tmp.toString)
    require(fs.exists(new Path(tmp, "_SUCCESS")),
      s"rewrite did not commit to $tmp")
    fs.delete(cur, true)
    fs.rename(tmp, cur)
    p
  }

  /** Write-once BUCKETED table: bucket layout needs catalog metadata, but
    * the session catalog is in-memory (fresh per JVM), so "exists" has two
    * layers — if the table is registered, reuse it; if only the files
    * exist (written by an earlier session), re-register them as an
    * external bucketed table over the same location (no data rewrite);
    * else write bucketBy+sortBy parquet and register. Returns the
    * dir-and-version-keyed table name. */
  def ensureBucketedTable(spark: SparkSession, kind: String, dir: String,
                          version: Int, buckets: Int, key: String)
                         (build: => DataFrame): String = {
    val table = s"${kind}_${tag(dir)}_v$version"
    if (!spark.catalog.tableExists(table)) {
      val p = artifactPath(spark, kind, dir, version)
      val marker = new Path(p, "_SUCCESS")
      if (fsOf(spark, marker).exists(marker)) {
        val schemaDdl = spark.read.parquet(p).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $table ($schemaDdl) USING parquet
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$p'""".stripMargin)
      } else {
        build.write.mode("overwrite").format("parquet")
          .bucketBy(buckets, key).sortBy(key)
          .option("path", p).saveAsTable(table)
      }
    }
    table
  }
}
