package graft

import graft.functions.{CharNgramsExpr, DamerauLevenshtein, GramBucketsExpr, PolyHashExpr, TextFunctions}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the scalar kernels (SURVEY §5): invariants that
  * hold for ALL inputs, not just the oracle corpus. Pure JVM — no Spark
  * session needed. (Raw ScalaCheck runner: the scalatestplus bridge is
  * not in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("DL: identity, symmetry, bounds") {
    check(Prop.forAll(word, word) { (a, b) =>
      val d = dl(a, b)
      dl(a, a) == 0 &&
        d == dl(b, a) &&
        d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length)
    })
  }

  test("DL: triangle inequality") {
    check(Prop.forAll(word, word, word) { (a, b, c) =>
      dl(a, c) <= dl(a, b) + dl(b, c)
    })
  }

  test("DL: single transposition costs 1") {
    check(Prop.forAll(word, Gen.alphaLowerChar, Gen.alphaLowerChar) { (w, x, y) =>
      (x == y) || {
        val a = w + x.toString + y.toString
        val b = w + y.toString + x.toString
        dl(a, b) == 1
      }
    })
  }

  test("ngrams: count, width, and set-subset invariants") {
    check(Prop.forAll(word, Gen.chooseNum(1, 5)) { (s, n) =>
      val grams = CharNgramsExpr.kernel(UTF8String.fromString(s), n, distinct = false)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      val set = CharNgramsExpr.kernel(UTF8String.fromString(s), n, distinct = true)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      val expectedCount = math.max(0, s.length - n + 1)
      grams.length == expectedCount &&
        grams.forall(_.length == n) &&
        set.toSet == grams.toSet &&
        set.distinct.length == set.length
    })
  }

  test("tversky (kernel math): range and empty-side zero") {
    // Mirror of the expression arithmetic on plain Scala sets.
    def tv(a: Set[String], b: Set[String], al: Double, be: Double): Double = {
      val s = al + be
      val (x, y) = (al / s, be / s)
      val ia = a.intersect(b).size.toDouble
      if (a.isEmpty || b.isEmpty) 0.0
      else {
        val denom = ia + x * (a.size - ia) + y * (b.size - ia)
        if (denom == 0.0) 0.0 else ia / denom
      }
    }
    check(Prop.forAll(word, word) { (a, b) =>
      def grams(s: String) = s.sliding(3).filter(_.length == 3).toSet
      val t = tv(grams(a), grams(b), 0.85, 0.15)
      t >= 0.0 && t <= 1.0 && (a != b || grams(a).isEmpty || t == 1.0)
    })
  }

  test("ellipse pre-filter contains the exact haversine disk (soundness)") {
    // For points the reference would return (haversine <= r), the ellipse
    // test must also pass — the pre-filter may over-approximate but must
    // not drop true matches. Radii/latitudes away from poles/antimeridian
    // (the reference shares these caveats, geo_manager.py:191-192).
    val latGen = Gen.chooseNum(-60.0, 60.0)
    val lngGen = Gen.chooseNum(-170.0, 170.0)
    val rGen = Gen.chooseNum(1.0, 500.0)
    val R = 3958.756
    check(Prop.forAll(latGen, lngGen, latGen, lngGen, rGen) { (clat, clng, plat, plng, r) =>
      def hav(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
        val dLat = math.toRadians(lat2 - lat1) / 2
        val dLng = math.toRadians(lng2 - lng1) / 2
        val a = math.sin(dLat) * math.sin(dLat) +
          math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
            math.sin(dLng) * math.sin(dLng)
        2 * R * math.atan2(math.sqrt(a), math.sqrt(1 - a))
      }
      val dist = hav(clat, clng, plat, plng)
      (dist > r * 0.99) || {
        val latD = r / R * (180.0 / math.Pi)
        val lngD = r / (R * math.cos(math.toRadians(clat))) * (180.0 / math.Pi)
        val x = (plat - clat) / latD
        val y = (plng - clng) / lngD
        x * x + y * y < 1.0
      }
    })
  }

  test("int8 codec: codes bounded, reconstruction within scale/2, zero-safe") {
    // Same double arithmetic the emb_int8 Column expressions evaluate:
    // scale = max|x|/127, code = floor(x/scale + 0.5).
    val vec: Gen[List[Float]] = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f)))
    check(Prop.forAll(vec) { xs =>
      val m = xs.map(x => math.abs(x.toDouble)).max
      val scale = m / 127.0
      if (scale == 0.0) xs.forall(_ == 0.0f)
      else xs.forall { x =>
        val code = math.floor(x.toDouble / scale + 0.5).toLong
        math.abs(code) <= 127 &&
          math.abs(code * scale - x.toDouble) <= scale / 2.0 + 1e-12
      }
    })
  }

  test("BM25 tf saturation: strictly increasing in tf, bounded by k1+1") {
    // Same double arithmetic as bm25TopK's tfNorm (k1 = 1.2, b = 0.75).
    val (k1, b) = (1.2, 0.75)
    def tfNorm(tf: Long, dl: Long, avgdl: Double): Double =
      (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    val tfGen = Gen.chooseNum(1L, 1000L)
    val dlGen = Gen.chooseNum(1L, 500L)
    val avgGen = Gen.chooseNum(1.0, 500.0)
    check(Prop.forAll(tfGen, dlGen, avgGen) { (tf, dl, avg) =>
      val v = tfNorm(tf, dl, avg)
      v > 0.0 && v < k1 + 1.0 && v < tfNorm(tf + 1, dl, avg)
    })
  }

  // Text soup for the hash kernels: words, whitespace runs (the WsClass
  // members), accents, CJK, and a SUPPLEMENTARY-plane char (surrogate
  // pair — the case a charAt-based fold would get wrong).
  private val soupChar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r"),
    1 -> Gen.oneOf("é", "ß", "日", "語", "𝄞"))
  private val soup: Gen[String] = Gen.chooseNum(0, 60).flatMap(n =>
    Gen.listOfN(n, soupChar).map(_.mkString))

  private def refPolyHash(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31L + cp) % 1000000007L)
    h
  }

  test("PolyHash kernel == code-point fold reference, for ALL strings") {
    check(Prop.forAll(soup) { s =>
      PolyHashExpr.kernel(UTF8String.fromString(s)) == refPolyHash(s)
    })
  }

  test("GramBuckets rolling join == hashing the materialized gram string") {
    // the kernel never builds "tok1 tok2" strings; this pins that the
    // rolling 0x20 fold is EXACTLY polyHash of the joined gram, and that
    // tokenization/order match the composed derivation
    val B = 4096L
    check(Prop.forAll(soup) { s =>
      val toks = s.trim.split(TextFunctions.WsClass + "+").filter(_.nonEmpty)
      val grams = toks.toSeq ++ toks.toSeq.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))
      val expect = grams.map(g => refPolyHash(g) % B)
      val got = GramBucketsExpr(null, B)
        .nullSafeEval(UTF8String.fromString(s)).asInstanceOf[ArrayData]
        .toLongArray().toSeq
      got == expect
    })
  }
}
