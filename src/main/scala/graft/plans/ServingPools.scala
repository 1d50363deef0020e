package graft.plans

import org.apache.spark.sql.SparkSession

/** The measured concurrent-serving configuration (round-14 rehearsal,
  * SCALE.md §concurrent-serve): a shared session serving N concurrent
  * requests must run `spark.scheduler.mode=FAIR` with ONE POOL PER
  * REQUEST THREAD. Spark's FAIR scheduler round-robins across POOLS
  * while each pool is internally FIFO, so all-requests-in-one-pool
  * FAIR degenerates to FIFO — and FIFO head-of-line blocks short
  * requests (a radius lookup) behind long multi-stage ones (an ANN
  * ladder): measured at the 10× diversity replica, 64 mixed requests
  * at 32 threads served 4.8 req/s FIFO vs 7.6 req/s FAIR-pooled with
  * p95 11.0 s vs 8.1 s.
  *
  * The pool property is a thread-LOCAL SparkContext property, so each
  * serving thread claims its own pool once; jobs it submits inherit
  * it. Undeclared pools get the default minShare/weight — for mixed
  * request streams that is the right neutral config (no family
  * starves); a deployment wanting weighted tiers declares them via
  * `spark.scheduler.allocation.file` without code changes. */
object ServingPools {
  /** Bound on the registered-pool set. Spark's FAIR scheduler registers
    * every newly named pool in `rootPool` PERMANENTLY — `release` clears
    * only the thread-local property, never deregisters — so raw
    * per-thread-id pool names under thread churn (a cached/per-request
    * executor) would grow the scheduler's pool registry without bound in
    * a long-lived serving session. Thread ids therefore hash into a
    * fixed slot space: at most [[PoolSlots]] pools ever register, and two
    * live threads sharing a slot degrade only THAT slot to FIFO between
    * the two of them (round-robin across slots — the property the
    * round-14 measurement priced — is preserved). Sized 2× the measured
    * n=32 serving config so collisions are rare at the measured load. */
  val PoolSlots = 64

  /** Claim a FAIR pool slot for the calling request thread; returns the
    * pool name (stable per thread). No-op semantics under FIFO mode: the
    * property is set but FIFO ignores pools. */
  def claim(spark: SparkSession): String = {
    val pool = "serve-" + (Thread.currentThread().getId % PoolSlots)
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    pool
  }

  /** Release the calling thread's pool claim (a pooled executor thread
    * returning to a non-serving role). */
  def release(spark: SparkSession): Unit =
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
}
