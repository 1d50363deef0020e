package graft

import graft.sources.{GeoIngest, RemoteFetch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

/** The versioned remote fetch transport (geo_manager.py:671-763) against a
  * loopback HTTP server: URL scheme, gzip decode, 200-or-raise, the
  * directory-existence cache short-circuit, forceDbFetch, cacheLocal, and
  * the Spark dict readers' equivalence with the JSONL ingest path. */
class RemoteFetchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("remote-fetch-spec")
    .getOrCreate()

  /** Two-record shape dict keyed by ref_code, string-typed lat/lng/bbox as
    * in the real dump (README.md:81-106). */
  private val nashville =
    """{"value": "Nashville, TN", "clean_value": "nashville tn", "id": 89,
      |"area": 1362.6, "bbox": {"ll_latitude": "35.9677", "ur_latitude": "36.4054",
      |"ll_longitude": "-87.0547", "ur_longitude": "-86.5155"},
      |"geo_type": "City", "latitude": "36.1622", "longitude": "-86.7744",
      |"ref_data": {"city": "Nashville", "country": "US", "zip_code": null,
      |"state_prov": "TN", "metro": null, "metro_size": null},
      |"population": 1313939, "is_zip_code": false, "is_aggregate": false,
      |"long_display": "Nashville, TN, US", "short_display": "Nashville, TN",
      |"primary_source": null, "primary_source_id": null,
      |"reference_code": "us__tn__nashville", "primary_timezone": "America/Chicago",
      |"related_shape_id": 31408, "is_three_digit_zip_code": false}""".stripMargin.replaceAll("\n", " ")

  private val memphis =
    """{"value": "Memphis, TN", "clean_value": "memphis tn", "id": 90,
      |"latitude": "35.1495", "longitude": "-90.0490", "geo_type": "City",
      |"population": 633104, "is_aggregate": false,
      |"reference_code": "us__tn__memphis", "primary_timezone": "America/Chicago"}""".stripMargin.replaceAll("\n", " ")

  private val shapeDictJson =
    s"""{"us__tn__nashville": $nashville, "us__tn__memphis": $memphis}"""

  // Posting lists with a repeated id — multiplicity must survive the read
  // (the reference appends one entry per trigram OCCURRENCE).
  private val searchDictJson =
    """{"nas": [89], "shv": [89], "mem": [90], "tn ": [89, 90, 90]}"""

  // A divergent v2 shape dict for version-path tests.
  private val shapeDictV2Json = s"""{"us__tn__memphis": $memphis}"""

  private def gzipBytes(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
    bos.toByteArray
  }

  private var server: HttpServer = _
  private var base: String = _
  private val hits = new ConcurrentHashMap[String, Integer]()

  private def route(path: String, body: Array[Byte], status: Int = 200): Unit =
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        hits.merge(path, 1, (a, b) => a + b)
        ex.sendResponseHeaders(status, body.length.toLong)
        ex.getResponseBody.write(body); ex.close()
      }
    })

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val utf8 = (s: String) => s.getBytes(StandardCharsets.UTF_8)
    route("/" + RemoteFetch.ShapeFileName, utf8(shapeDictJson))
    route("/" + RemoteFetch.SearchFileName, utf8(searchDictJson))
    route("/" + RemoteFetch.ShapeFileName + ".gz", gzipBytes(shapeDictJson))
    route("/" + RemoteFetch.SearchFileName + ".gz", gzipBytes(searchDictJson))
    route("/v/2024.1/" + RemoteFetch.ShapeFileName, utf8(shapeDictV2Json))
    route("/v/2024.1/" + RemoteFetch.SearchFileName, utf8(searchDictJson))
    route("/gone/" + RemoteFetch.ShapeFileName, utf8("no such dump"), status = 404)
    route("/gone/" + RemoteFetch.SearchFileName, utf8("no such dump"), status = 404)
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    spark.stop()
  }

  private def freshDir(): String =
    Files.createTempDirectory("remote_fetch_spec").toString

  test("url scheme: bare base and v/<version>/ prefix (geo_manager.py:671-675)") {
    assert(RemoteFetch.baseUrl("http://x/", None) == "http://x/")
    assert(RemoteFetch.baseUrl("http://x", Some("2024.1")) == "http://x/v/2024.1/")
  }

  test("loadData fetches both dumps and yields the coerced shape relation") {
    val db = RemoteFetch.loadData(spark, base, freshDir())
    val rows = db.shapes.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[Double]("latitude") == 36.1622) // string → double at read
    assert(rows.head.getAs[org.apache.spark.sql.Row]("bbox").getAs[Double]("ur_longitude") == -86.5155)
    assert(rows.head.getAs[String]("reference_code") == "us__tn__nashville")
    // Posting pairs: multiplicity preserved ("tn " lists 90 twice).
    val posts = db.postings.groupBy("ngram").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(posts == Map("nas" -> 1L, "shv" -> 1L, "mem" -> 1L, "tn " -> 3L))
  }

  test("compressed fetch gunzips to the identical relation") {
    val plain = RemoteFetch.loadData(spark, base, freshDir(), compressed = false)
    val gz    = RemoteFetch.loadData(spark, base, freshDir(), compressed = true)
    assert(gz.shapes.orderBy("id").collect().toSeq == plain.shapes.orderBy("id").collect().toSeq)
    assert(gz.postings.orderBy("ngram", "id").collect().toSeq ==
      plain.postings.orderBy("ngram", "id").collect().toSeq)
    // The cache stores DECOMPRESSED json either way (:751-759): a local
    // re-load of the gz-fetched cache works with no codec knowledge.
  }

  test("a versioned fetch takes the v/<version>/ path and caches under it") {
    val dir = freshDir()
    val db = RemoteFetch.loadData(spark, base, dir, version = Some("2024.1"))
    assert(db.shapes.select("id").collect().map(_.getLong(0)).toSet == Set(90L))
    assert(Files.exists(java.nio.file.Paths.get(dir, "geo_db", "2024.1", RemoteFetch.ShapeFileName)))
    assert(hits.get("/v/2024.1/" + RemoteFetch.ShapeFileName) == 1)
  }

  test("non-200 raises carrying the response body text (:735, :744)") {
    val e = intercept[IllegalArgumentException] {
      RemoteFetch.fetchDump(base + "/gone", freshDir())
    }
    assert(e.getMessage.contains("no such dump"))
  }

  test("an existing cache dir short-circuits the network; forceDbFetch bypasses it") {
    val dir = freshDir()
    val before = hits.getOrDefault("/" + RemoteFetch.ShapeFileName, 0).intValue()
    RemoteFetch.loadData(spark, base, dir)
    val afterFirst = hits.get("/" + RemoteFetch.ShapeFileName).intValue()
    assert(afterFirst == before + 1)

    // Second load: served from the cache dir, zero requests — and the
    // relation is identical.
    val cached = RemoteFetch.loadData(spark, base, dir)
    assert(hits.get("/" + RemoteFetch.ShapeFileName).intValue() == afterFirst)
    assert(cached.shapes.count() == 2)

    // forceDbFetch refetches even with the cache present (:706).
    RemoteFetch.loadData(spark, base, dir, forceDbFetch = true)
    assert(hits.get("/" + RemoteFetch.ShapeFileName).intValue() == afterFirst + 1)
  }

  test("cacheLocal=false lands nothing under the data dir") {
    val dir = freshDir()
    val db = RemoteFetch.loadData(spark, base, dir, cacheLocal = false)
    assert(db.shapes.count() == 2)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "geo_db")))
  }

  test("syncToCanonical: version lifecycle end-to-end from the transport") {
    val dir = freshDir()
    spark.conf.set("spark.graft.materialize.dir",
      Files.createTempDirectory("remote_sync_artifacts").toString)
    try {
      // First sync: fetch + canonical build.
      val canon = RemoteFetch.syncToCanonical(spark, base, dir)
      val back = spark.read.parquet(canon)
      assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(89L, 90L))
      assert(back.columns.contains("z_key")) // the canonical z-ordered layout

      // Unchanged cache: repeat sync is a no-op — zero network, zero build
      // (the _SUCCESS marker's mtime does not move).
      val marker = java.nio.file.Paths.get(canon, "_SUCCESS")
      val mtime = Files.getLastModifiedTime(marker)
      val netBefore = hits.get("/" + RemoteFetch.ShapeFileName).intValue()
      assert(RemoteFetch.syncToCanonical(spark, base, dir) == canon)
      assert(Files.getLastModifiedTime(marker) == mtime)
      assert(hits.get("/" + RemoteFetch.ShapeFileName).intValue() == netBefore)

      // Re-publish of "current": forceDbFetch overwrites the cached dumps,
      // the staleness manifest sees the moved children, the canonical
      // artifact rebuilds — as a NEW GENERATION (round 15: the stale one
      // keeps serving in-flight readers until gc), so the rebuild shows
      // as a fresh returned path, not a moved marker.
      Thread.sleep(1100) // mtime granularity can be a full second
      val canon2 = RemoteFetch.syncToCanonical(spark, base, dir, forceDbFetch = true)
      assert(canon2 != canon,
        "a re-published version must rebuild the canonical artifact as a new generation")
      assert(spark.read.parquet(canon2).select("id")
        .collect().map(_.getLong(0)).toSet == Set(89L, 90L))
      assert(Files.getLastModifiedTime(marker) == mtime,
        "the superseded generation must be left untouched for in-flight readers")

      // A NAMED version lands beside it under its own artifact key.
      val v2 = RemoteFetch.syncToCanonical(spark, base, dir, version = Some("2024.1"))
      assert(v2 != canon)
      assert(spark.read.parquet(v2).select("id").collect().map(_.getLong(0)).toSet == Set(90L))
    } finally spark.conf.unset("spark.graft.materialize.dir")
  }

  test("the dict reader and the JSONL ingest path are interchangeable") {
    // Same two records as JSONL through GeoIngest.readJson: the exploded
    // dict rows must match field-for-field, so every downstream operator
    // is blind to which format the corpus arrived in.
    val dir = freshDir()
    val jf = java.nio.file.Paths.get(dir, "shapes.jsonl")
    Files.write(jf, s"$nashville\n$memphis\n".getBytes(StandardCharsets.UTF_8))
    val viaJsonl = GeoIngest.readJson(spark, jf.toString).orderBy("id").collect().toSeq

    val db = RemoteFetch.loadData(spark, base, freshDir())
    val viaDict = db.shapes.orderBy("id").collect().toSeq
    assert(viaDict == viaJsonl)
  }
}
