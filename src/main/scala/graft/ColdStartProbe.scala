package graft

import org.apache.spark.sql.SparkSession

/** Serving cold-start instrument (round-13 verdict item 6): bench medians
  * hide the first-call wall a fresh serving process pays — JVM + Spark
  * startup aside, the first query also pays artifact manifest reads,
  * plan analysis, and whole-stage codegen JIT. This probe measures it
  * honestly: the parent ENSURES every family's artifacts (so children
  * never pay a build), then forks ONE FRESH JVM per family whose child
  * times its first call (cold, artifacts present) and three same-JVM
  * repeats (warm median) — the pair of numbers a serving deployment
  * actually plans around. Session startup is reported separately so the
  * cold number isolates the QUERY's own first-call wall, not SparkContext
  * bring-up.
  *
  *   runMain graft.ColdStartProbe <sfDir> [family ...]
  *   (default families = ServingScaleProbe.Families, the serving tier)
  */
object ColdStartProbe {
  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def session(cpus: String, artDir: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.materialize.dir", artDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def childMode(args: Array[String]): Unit = {
    val Array(_, sfDir, family, artDir, cpus) = args.take(5)
    val t0 = System.nanoTime()
    val spark = session(cpus, artDir)
    val startup = (System.nanoTime() - t0) / 1e9
    val fn = SparkEntry.queries(family)
    val t1 = System.nanoTime()
    fn(spark, sfDir).count()
    val cold = (System.nanoTime() - t1) / 1e9
    val warm = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t) / 1e9
    }.sorted.apply(1)
    println(f"""GRAFT_COLD {"family":"$family","startup":$startup%.2f,"cold_first":$cold%.2f,"warm_median":$warm%.2f}""")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--child")) { childMode(args); return }
    require(args.nonEmpty, "usage: ColdStartProbe <sfDir> [family ...]")
    val sfDir = args.head
    val families =
      if (args.length > 1) args.drop(1).toSeq else ServingScaleProbe.Families
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val artDir = sys.env.getOrElse("SPARK_GRAFT_COLD_ART",
      java.nio.file.Files.createTempDirectory("graft-cold-art").toString)
    val spark = session(cpus, artDir)
    // build every artifact ONCE in the parent so each child's first call
    // is a genuine serving read (artifacts present), never an ingest
    families.foreach(f => SparkEntry.queries(f)(spark, sfDir).count())
    families.foreach { f =>
      val cmd = Seq("java") ++ AddOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-Xmx8g", "-cp", sys.props("java.class.path"),
        "graft.ColdStartProbe", "--child", sfDir, f, artDir, cpus)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      require(proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS) &&
        proc.exitValue() == 0, s"cold-start child for $f failed:\n$out")
      out.linesIterator.filter(_.startsWith("GRAFT_COLD "))
        .foreach(l => println(l.stripPrefix("GRAFT_COLD ")))
    }
    spark.stop()
  }
}
