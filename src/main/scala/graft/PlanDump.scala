package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries (or every query) to
  * `<outDir>/<name>.txt` — the optimization rounds' plan-evidence surface
  * (plans/r15/<query>_before.txt / _after.txt are copies of these dumps).
  *
  * Uses the same session shape as Bench (master/shuffle partitions from the
  * env) so the dumped plan is the one the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[plandump] $name ok")
        } catch { case scala.util.control.NonFatal(e) =>
          // stderr + non-zero exit (r15 advice): a failed dump must not
          // look like success to scripts copying plan evidence
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          failed += 1
        }
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
