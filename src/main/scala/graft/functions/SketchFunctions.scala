package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.GraftShim

/** Column builders over Spark's own bloom-filter sketch expressions.
  *
  * Spark registers `bloom_filter_agg` / `might_contain` only in its
  * INTERNAL function registry — they exist for the optimizer's
  * runtime-filter rewrite (InjectRuntimeFilter), whose size thresholds
  * (10 GB application side) never fire at test scale. Exposing them as
  * Column builders makes the pre-shuffle semi-join pruning pattern
  * explicit, testable, and usable where the engine KNOWS the build side is
  * selective, instead of hoping the optimizer's heuristics agree. */
object SketchFunctions {

  /** Aggregate a long key column into a serialized bloom filter (binary). */
  def bloomFilterAgg(key: Column, estItems: Long, numBits: Long): Column =
    GraftShim.column(new BloomFilterAggregate(GraftShim.expression(key),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Probabilistic membership probe. `bloom` must be constant-foldable or
    * a scalar subquery (pass `bloomDf.scalar()`): Spark evaluates the
    * subquery once and the probe stays inside whole-stage codegen. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftShim.column(BloomFilterMightContain(GraftShim.expression(bloom),
      GraftShim.expression(key)))
}
