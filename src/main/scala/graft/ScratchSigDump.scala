package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchSigDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    import graft.operators.Dedup
    val sh = graft.functions.MinHashSignature.shingleHashes(lower(col("text")), Dedup.ShingleWords)
    val ds = Tables.documents(spark, dir).select(col("doc_id"), sh.as("sh"), col("text"))
    val szs = ds.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val pred = Dedup.minhashPairs(spark, dir).filter(col("est_jaccard") >= 0.5)
      .join(szs.select(col("doc_id").as("doc_a"), col("n_sh").as("la")), "doc_a")
      .join(szs.select(col("doc_id").as("doc_b"), col("n_sh").as("lb")), "doc_b")
      .filter(least(col("la"), col("lb")) * 2L >= greatest(col("la"), col("lb")))
    val withJ = pred
      .join(ds.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("text").as("ta")), "doc_a")
      .join(ds.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("text").as("tb")), "doc_b")
      .withColumn("j", size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb"))).cast("double"))
      .filter(col("j") < 0.1).limit(1)
    val r = withJ.collect().head
    println(s"PAIR a=${r.getAs[Long]("doc_a")} b=${r.getAs[Long]("doc_b")} j=${r.getAs[Double]("j")} est=${r.getAs[Double]("est_jaccard")}")
    println(s"TEXTA ${r.getAs[String]("ta").take(120)}")
    println(s"TEXTB ${r.getAs[String]("tb").take(120)}")
    val sha = r.getAs[scala.collection.Seq[Long]]("sha")
    val shb = r.getAs[scala.collection.Seq[Long]]("shb")
    println(s"SHA n=${sha.size} min=${sha.min} sorted10=${sha.sorted.take(10).mkString(",")}")
    println(s"SHB n=${shb.size} min=${shb.min} sorted10=${shb.sorted.take(10).mkString(",")}")
    val sigs = Dedup.minhashSignatures(spark, dir)
      .filter(col("doc_id").isin(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[scala.collection.Seq[Long]]("sig")).toMap
    sigs.foreach { case (id, sg) => println(s"SIG $id ${sg.mkString(",")}") }
    spark.stop()
  }
}
