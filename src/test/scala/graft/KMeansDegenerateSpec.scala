package graft

import graft.operators.KMeans
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Lloyd's degenerate edges on a CRAFTED corpus the driver tables can't
  * produce: a centroid that loses every member (drops out — standard
  * Lloyd) and an all-zero vector (NaN cosine everywhere → smallest-cid
  * cell; zero numerator but counted in `n`). The corpus is built so the
  * drop is forced, not incidental: seed 6 is colinear with seed 4, so
  * every vector — including seed 6 itself — ties at cosine 1 and the
  * smallest-cid tie-break starves centroid 6 on the first assignment. */
class KMeansDegenerateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val tmp = Files.createTempDirectory("graft-kmeans-degenerate").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.graft.materialize.dir", s"$tmp/artifacts")
    .appName("kmeans-degenerate-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val dir: String = {
    import spark.implicits._
    Seq(
      (0L, "a", Array(0f, 1f, 0f, 0f)),
      (1L, "a", Array(0f, 0.9f, 0.1f, 0f)),
      (2L, "b", Array(0f, 0f, 1f, 0f)),
      (3L, "b", Array(0f, 0.1f, 0.9f, 0f)),
      (4L, "c", Array(1f, 0f, 0f, 0f)),
      (5L, "c", Array(0.9f, 0f, 0f, 0.1f)),
      (6L, "dup", Array(2f, 0f, 0f, 0f)), // colinear with seed 4: cos ties at 1
      (7L, "zero", Array(0f, 0f, 0f, 0f))
    ).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/data/embeddings.parquet")
    s"$tmp/data"
  }

  test("a centroid losing all members drops out and training still converges") {
    val cent = KMeans.trainedCentroids(spark, dir, iters = 2, mod = 2L,
      numCentroids = 4).collect()
    // seeds were {0, 2, 4, 6}; 6 starves on the first assignment
    assert(cent.map(_.getLong(0)).sorted.toSeq == Seq(0L, 2L, 4L))
    assert(cent.forall(_.getSeq[Double](1).length == 4))
  }

  test("membership still partitions the corpus after a drop (zero vector included)") {
    val rows = KMeans.kmeansTrain(spark, dir, iters = 2, mod = 2L,
      numCentroids = 4).collect()
    assert(rows.length == 3 * 4) // 3 surviving cells x 4 dims
    val perCell = rows.groupBy(_.getLong(0)).view.mapValues(_.head.getLong(3)).toMap
    assert(perCell.values.sum == 8L)
    // the zero vector lands in the smallest-cid cell (NaN-greatest tie-break)
    assert(perCell(0L) >= 3L)
  }

  test("Lloyd objective stays monotone through the centroid drop") {
    val o0 = KMeans.objective(spark, dir, iters = 0, mod = 2L, numCentroids = 4)
    val o1 = KMeans.objective(spark, dir, iters = 1, mod = 2L, numCentroids = 4)
    val o2 = KMeans.objective(spark, dir, iters = 2, mod = 2L, numCentroids = 4)
    assert(o1 >= o0 - 1e-6, s"iter1 $o1 < seed $o0")
    assert(o2 >= o1 - 1e-6, s"iter2 $o2 < iter1 $o1")
  }
}
