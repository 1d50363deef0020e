package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchFpJ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    import graft.operators.Dedup
    val t = Dedup.MinhashRecallThreshold
    val sh = graft.functions.MinHashSignature.shingleHashes(lower(col("text")), Dedup.ShingleWords)
    val ds = Tables.documents(spark, dir).select(col("doc_id"), sh.as("sh")).filter(size(col("sh")) > 0)
    val szs = ds.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val pred = Dedup.minhashPairs(spark, dir).filter(col("est_jaccard") >= t)
      .join(szs.select(col("doc_id").as("doc_a"), col("n_sh").as("la")), "doc_a")
      .join(szs.select(col("doc_id").as("doc_b"), col("n_sh").as("lb")), "doc_b")
      .filter(least(col("la"), col("lb")) * 2L >= greatest(col("la"), col("lb")))
    val g = ds
    val withJ = pred
      .join(g.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("j", size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb"))).cast("double"))
      .filter(col("j") < t)
      .withColumn("bucket", floor(col("j") * 20) / 20.0)
    withJ.groupBy("bucket").count().orderBy("bucket").collect()
      .foreach(r => println(s"FPJ bucket=${r.getDouble(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
