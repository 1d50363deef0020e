package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchPairDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    import graft.operators.Dedup
    val sigs = Dedup.minhashSignatures(spark, dir)
      .filter(col("doc_id").isin(66L, 426L)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Long]]("sig")).toMap
    sigs.toSeq.sortBy(_._1).foreach { case (id, sg) => println(s"SPARKSIG $id ${sg.mkString(",")}") }
    val a = sigs(66L); val b = sigs(426L)
    println(s"SPARKEST ${(0 until 32).count(i => a(i) == b(i))}/32")
    spark.stop()
  }
}
