package graft.oracle

/** DuckDB SQL fragment builders for the driver's oracle.
  *
  * Parity rules (the driver hash-compares values):
  *  - squares are written `x*x`, never `pow(x, 2)` (libm vs JVM ulp drift);
  *  - compound constants (e.g. 180/π) are computed ONCE in Scala and
  *    interpolated as shortest-roundtrip doubles, so both engines parse the
  *    identical bit pattern instead of re-deriving it in different orders;
  *  - integer outputs are BIGINT on both sides;
  *  - every query ends in a total-order ORDER BY.
  */
object OracleSql {

  val HashMod: Long = 1000000007L
  val EarthRadiusMiles: Double = 3958.756
  /** 180/π, Scala-computed; interpolated verbatim into SQL. */
  val DegPerRad: Double = 180.0 / math.Pi
  /** 2R, Scala-computed. */
  val TwoR: Double = 2 * EarthRadiusMiles

  /** geo_manager.py:445-449 — DuckDB needs the 'g' flag for global replace
    * (Spark's regexp_replace is global by default). */
  def clean(e: String): String =
    s"lower(regexp_replace($e, '[^0-9a-zA-Z ]+', '', 'g'))"

  /** fuzzy.py:5-6 — character trigram list; range(1, n) is empty when n<=1
    * so short strings yield [] without a guard. */
  def trigrams(e: String): String =
    s"list_transform(range(1, length($e) - 1), i -> substring($e, i::INT, 3))"

  def trigramSet(e: String): String = s"list_distinct(${trigrams(e)})"

  /** fuzzy.py:9-31 — Tversky over two distinct-gram list expressions,
    * using |A\B| = |A| - |A∩B|. Weights pre-normalized in Scala. */
  def tversky(aGrams: String, bGrams: String, alpha: Double, beta: Double): String = {
    val s = alpha + beta
    val (a, b) = (alpha / s, beta / s)
    val ia = s"len(list_intersect($aGrams, $bGrams))::DOUBLE"
    val na = s"len($aGrams)::DOUBLE"
    val nb = s"len($bGrams)::DOUBLE"
    s"""(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0
       | ELSE coalesce($ia / nullif($ia + $a * ($na - $ia) + $b * ($nb - $ia), 0.0), 0.0)
       | END)""".stripMargin.replaceAll("\n", " ")
  }

  /** geometry.py:7-34 — haversine miles, atan2 form, explicit squares. */
  def haversineMiles(lat1: String, lng1: String, lat2: String, lng2: String): String = {
    val dLat = s"(radians(($lat2) - ($lat1)) / 2)"
    val dLng = s"(radians(($lng2) - ($lng1)) / 2)"
    val a = s"(sin($dLat) * sin($dLat) + cos(radians($lat1)) * cos(radians($lat2)) * sin($dLng) * sin($dLng))"
    s"($TwoR * atan2(sqrt($a), sqrt(1.0 - $a)))"
  }

  /** geometry.py:37-53 — degrees of latitude per `miles` (literal radius). */
  def latDelta(miles: Double): String =
    s"(${miles / EarthRadiusMiles * DegPerRad})"

  /** geometry.py:56-75 — degrees of longitude per `miles` at latitude expr. */
  def lngDelta(lat: String, miles: Double): String =
    s"($miles / ($EarthRadiusMiles * cos(radians($lat))) * $DegPerRad)"

  /** geo_manager.py:197-199 — ellipse membership, explicit squares. */
  def ellipseContains(cLat: String, cLng: String, lat: String, lng: String,
                      latD: String, lngD: String): String = {
    val x = s"((($lat) - ($cLat)) / $latD)"
    val y = s"((($lng) - ($cLng)) / $lngD)"
    s"($x * $x + $y * $y < 1)"
  }

  /** Z-order (Morton) key — mirrors GeoFunctions.zorderKey: 16-bit
    * quantization per dimension, bits interleaved (lat odd, lng even). */
  def zorderKey(lat: String, lng: String): String = {
    val max = 65535
    val qlat = s"least(floor((($lat) + 90.0) / 180.0 * $max), $max)::BIGINT"
    val qlng = s"least(floor((($lng) + 180.0) / 360.0 * $max), $max)::BIGINT"
    val terms = (0 until 16).map { b =>
      s"((($qlat) >> $b) % 2) * ${1L << (2 * b + 1)} + ((($qlng) >> $b) % 2) * ${1L << (2 * b)}"
    }.mkString("\n        + ")
    s"($terms)::BIGINT"
  }

  /** Whitespace tokens of trimmed lowered text — explicit class, see
    * TextFunctions.WsClass (Java vs RE2 `\s` divergence on \x0B). */
  def tokens(e: String): String =
    s"list_filter(string_split_regex(trim($e), '[ \\t\\n\\x0B\\f\\r]+'), t -> length(t) > 0)"

  /** Token win-gram windows of a token-list expr — mirrors
    * TextFunctions.tokenWindows (inclusive sequence(0, n-win) ↔
    * range(0, n-win+1), 1-based win-length slices, space-joined). */
  def tokenWindows(tk: String, win: Int): String =
    s"""CASE WHEN len($tk) >= $win
       | THEN list_transform(range(0, len($tk) - $win + 1),
       |        i -> array_to_string($tk[i + 1 : i + $win], ' '))
       | ELSE [] END""".stripMargin.replaceAll("\n", " ")

  /** Polynomial rolling hash of a string expr — mirrors
    * TextFunctions.polyHash: fold (acc*31 + code) mod 1e9+7 over code
    * points, empty string → 0. */
  def polyHash(e: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       | list_transform(range(1, length($e) + 1), i -> ord(substring($e, i::INT, 1))::BIGINT)),
       | (acc, x) -> (acc * 31 + x) % $HashMod)""".stripMargin.replaceAll("\n", " ")
}
