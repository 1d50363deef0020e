package graft

import graft.operators.KMeans
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the Lloyd trainer that the bit-exact oracle gate cannot
  * see on its own: codebook shape, mass conservation of the membership
  * counts, and the trained-IVF query contract. */
class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("kmeans-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("trained codebook keeps constant size and full dimensionality") {
    val cent = KMeans.trainedCentroids(spark, dir).collect()
    assert(cent.length <= Similarity_C && cent.length > 1)
    assert(cent.forall(_.getSeq[Double](1).length == 64))
  }

  private def Similarity_C = graft.operators.Similarity.IvfNumCentroids

  test("membership counts partition the corpus exactly") {
    val rows = KMeans.kmeansTrain(spark, dir).collect()
    assert(rows.length % 64 == 0)
    val perCell = rows.groupBy(_.getLong(0)).view.mapValues { rs =>
      // n_members is constant across a cell's 64 dim rows
      val ns = rs.map(_.getLong(3)).distinct
      assert(ns.length == 1)
      ns.head
    }.toMap
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(perCell.values.sum == total)
  }

  test("Lloyd objective is non-decreasing across iterations") {
    val o0 = KMeans.objective(spark, dir, iters = 0)
    val o1 = KMeans.objective(spark, dir, iters = 1)
    val o2 = KMeans.objective(spark, dir, iters = 2)
    // 1e-6 slack absorbs the floor(el*1e6) centroid quantization.
    assert(o1 >= o0 - 1e-6, s"iter1 $o1 < seed $o0")
    assert(o2 >= o1 - 1e-6, s"iter2 $o2 < iter1 $o1")
    // training must actually move the needle off the raw sample codebook
    assert(o2 > o0, s"no improvement: $o2 vs $o0")
  }

  test("trained IVF returns k descending-cosine rows") {
    val rows = KMeans.ivfTrainedTopK(spark, dir, probeId = 7L, k = 10).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }
}
