package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL-registered engine functions: the FunctionRegistry path (config
  * `spark.sql.extensions=graft.plans.GraftExtensions` uses the same
  * injections). */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .withExtensions(new GraftExtensions)
    .appName("extensions-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("damerau_levenshtein is callable from SQL and counts transpositions") {
    val r = spark.sql(
      "SELECT damerau_levenshtein('ca', 'ac') AS d1, damerau_levenshtein('kitten', 'sitting') AS d2")
      .collect().head
    assert(r.getInt(0) == 1) // one transposition (plain levenshtein = 2)
    assert(r.getInt(1) == 3)
  }

  test("vector functions are callable from SQL") {
    val r = spark.sql(
      """SELECT vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       round(cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS c,
        |       lsh_signature(array(1.0F, 0.0F), 4) AS sig
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getLong(2) >= 0L && r.getLong(2) < 16L)
  }

  test("text functions are callable from SQL") {
    val r = spark.sql(
      """SELECT char_ngrams('banana', 3) AS g,
        |       char_ngram_set('banana', 3) AS gs,
        |       minhash_signature('one two three four', 3, 16) AS sig,
        |       simhash_fingerprint('one two three four', 48) AS fp,
        |       simhash_fingerprint('one two three four', 48) AS fp2,
        |       simhash_fingerprint('completely different words here', 48) AS fp3
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("ban", "ana", "nan", "ana"))
    assert(r.getSeq[String](1) == Seq("ban", "ana", "nan"))
    assert(r.getSeq[Long](2).length == 16)
    assert(r.getLong(3) == r.getLong(4)) // deterministic
    assert(r.getLong(3) != r.getLong(5)) // discriminative
    assert(r.getLong(3) >= 0 && r.getLong(3) < (1L << 48))
  }

  test("hash kernels are callable from SQL") {
    val r = spark.sql(
      """SELECT poly_hash('') AS z, poly_hash('ab') AS h,
        |       gram_buckets('one two', 4096) AS gb
        |""".stripMargin).collect().head
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == (97L * 31 + 98) % 1000000007L) // 'a','b' fold
    // unigrams then the bigram window: 3 buckets, all in [0, 4096)
    assert(r.getSeq[Long](2).length == 3 &&
      r.getSeq[Long](2).forall(b => b >= 0 && b < 4096))
  }

  test("non-literal plane count is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT lsh_signature(array(1.0F), length('ab'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("fuzzy_search is callable as a SQL table function == Scala API") {
    val viaSql = spark.sql(
      s"SELECT * FROM fuzzy_search('$dir', 'smal widget', 15)")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.operators.FuzzySearch
      .fuzzySearch(spark, dir, "smal widget", 15)
      .collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty && viaSql == viaApi)
  }

  test("radius_search is callable as a SQL table function == Scala API") {
    val viaSql = spark.sql(
      s"SELECT * FROM radius_search('$dir', ${SparkEntry.P.RadiusProbe}, " +
        s"${SparkEntry.P.RadiusMiles}, true)")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.operators.RadiusSearch
      .radiusSearch(spark, dir, SparkEntry.P.RadiusProbe,
        SparkEntry.P.RadiusMiles, countryExact = true)
      .collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty && viaSql == viaApi)
  }

  test("bm25_topk is callable as a SQL table function (vararg terms) == Scala API") {
    val terms = SparkEntry.P.Bm25Query
    val viaSql = spark.sql(
      s"SELECT * FROM bm25_topk('$dir', ${SparkEntry.P.Bm25K}, " +
        terms.map(t => s"'$t'").mkString(", ") + ")")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.operators.Retrieval
      .bm25TopK(spark, dir, terms, SparkEntry.P.Bm25K)
      .collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty && viaSql == viaApi)
  }

  test("fuzzy_batch_auto is callable as a SQL table function == Scala API") {
    val viaSql = spark.sql(
      s"SELECT * FROM fuzzy_batch_auto('$dir', ${SparkEntry.P.FuzzyK})")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.operators.FuzzySearch
      .batchFuzzySearchAuto(spark, dir, SparkEntry.P.FuzzyK,
        SparkEntry.P.StopGramInv)
      .collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty && viaSql == viaApi)
  }

  test("ann_topk is callable as a SQL table function == Scala API") {
    val viaSql = spark.sql(
      s"SELECT * FROM ann_topk('$dir', ${SparkEntry.P.IvfProbe}, " +
        s"${SparkEntry.P.IvfK})")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.operators.Similarity
      .ivf2PqRefineTopK(spark, dir, SparkEntry.P.IvfProbe, SparkEntry.P.IvfK,
        nprobe = SparkEntry.P.IvfNprobe)
      .collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty && viaSql == viaApi)
  }

  test("table functions work on a plain session via programmatic register") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    val r = s2.sql(s"SELECT * FROM fuzzy_search('$dir', 'smal widget', 5)")
      .collect()
    assert(r.length == 5)
  }

  test("non-literal table-function argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM fuzzy_search('$dir', lower('X'), 5)").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }
}
