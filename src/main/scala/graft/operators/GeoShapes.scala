package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's geo-shape table (SURVEY.md §1.2/§1.3), derived
  * deterministically from the driver's `customer` parquet so every geo
  * operator has a DuckDB-checkable oracle on the same inputs.
  *
  * Field semantics mirror the reference record (README.md:81-106):
  * `id`, `value`, `clean_value`, `latitude`/`longitude`, `population`
  * (0 == unknown, scoring guard geo_manager.py:499), `is_aggregate`
  * (bbox-matched in radius search, geo_manager.py:184-188), `area`
  * (distance normalization, geo_manager.py:397-413), bbox corners,
  * `country` (country_exact filter, geo_manager.py:269-271), `geo_type`
  * (display/quote-location branches, geo_manager.py:97-149),
  * `reference_code` (hierarchical natural key `<country>__<state>__<name>`,
  * README.md:71-72), `long_display`/`short_display` (geo_manager.py:137-149),
  * `state_prov`/`city`/`zip_code` (the `ref_data` struct, README.md:91-94),
  * `metro_size` (metro quote-location, geo_manager.py:102-108),
  * `primary_timezone` (nullable IANA tz, geo_manager.py:151-158),
  * `related_shape_id` (nullable link, README.md:104).
  *
  * All derivations are integer-mod arithmetic + one exact double divide,
  * so Spark and DuckDB produce bit-identical values.
  */
object GeoShapes {

  /** IANA zones for `primary_timezone`; index id%5, 4 → NULL (the reference
    * treats a missing tz as naive local time, geo_manager.py:156-158). */
  val Timezones: Seq[String] = Seq("America/Chicago", "America/New_York",
    "America/Denver", "America/Los_Angeles")

  /** Shape table as a DataFrame. Pure projection over the customer scan —
    * Catalyst prunes/pushes through it. */
  def shapes(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(
      col("c_custkey").as("id"),
      col("c_name").as("value"),
      TextFunctions.cleanEntity(col("c_name")).as("clean_value"),
      ((col("c_custkey") * 7919L % 17000L) / 100.0 - 85.0).as("latitude"),
      ((col("c_custkey") * 104729L % 36000L) / 100.0 - 180.0).as("longitude"),
      (col("c_custkey") * 37L % 1000000L).as("population"),
      (col("c_custkey") % 10L === 0L).as("is_aggregate"),
      ((col("c_custkey") % 500L) + 1.0).as("area"),
      when(col("c_nationkey") % 3 === 0, "US")
        .when(col("c_nationkey") % 3 === 1, "CA")
        .otherwise("MX").as("country"),
      when(col("c_custkey") % 4L === 0L, "City")
        .when(col("c_custkey") % 4L === 1L, "ZipCode")
        .when(col("c_custkey") % 4L === 2L, "County")
        .otherwise("MetroArea").as("geo_type"),
      concat(lit("ST"), (col("c_nationkey") % 25L).cast("string")).as("state_prov"),
      lpad((lit(10000L) + col("c_custkey") % 90000L).cast("string"), 5, "0").as("zip_code"))
      .withColumn("ll_latitude", col("latitude") - 0.5)
      .withColumn("ur_latitude", col("latitude") + 0.5)
      .withColumn("ll_longitude", col("longitude") - 0.5)
      .withColumn("ur_longitude", col("longitude") + 0.5)
      .withColumn("reference_code",
        concat(lower(col("country")), lit("__"), lower(col("state_prov")),
          lit("__"), regexp_replace(col("clean_value"), " ", "_")))
      .withColumn("short_display", col("value"))
      .withColumn("long_display",
        concat(col("value"), lit(", "), col("state_prov"), lit(", "), col("country")))
      .withColumn("metro_size", when(col("geo_type") === "MetroArea",
        (col("id") % 100L) + 1L))
      .withColumn("primary_timezone",
        when(col("id") % 5L === 0L, Timezones(0))
          .when(col("id") % 5L === 1L, Timezones(1))
          .when(col("id") % 5L === 2L, Timezones(2))
          .when(col("id") % 5L === 3L, Timezones(3)))  // % 5 == 4 → NULL
      .withColumn("related_shape_id",
        when(col("id") % 7L =!= 0L, col("id") - col("id") % 7L))  // 1-edge link; NULL every 7th
  }

  /** The shape table in the reference's RECORD layout (GeoIngest.rawSchema,
    * README.md:81-106): `ref_data` and `bbox` as real nested structs. This
    * is what the ingested parquet looks like before `_generate_maps`
    * flattens projections — dot-path filters (utils.py:15-21) run against
    * THIS shape. */
  def nestedShapes(spark: SparkSession, dir: String): DataFrame =
    shapes(spark, dir).select(
      col("id"), col("value"), col("clean_value"),
      col("latitude"), col("longitude"), col("population"),
      col("is_aggregate"), col("area"), col("geo_type"), col("reference_code"),
      struct(col("ll_latitude"), col("ur_latitude"),
        col("ll_longitude"), col("ur_longitude")).as("bbox"),
      struct(col("country"), col("zip_code"), col("state_prov"),
        col("metro_size")).as("ref_data"))

  /** The same derivation as a DuckDB CTE body (oracle side). */
  val oracleCte: String =
    """SELECT c_custkey AS id,
      |       c_name AS value,
      |       lower(regexp_replace(c_name, '[^0-9a-zA-Z ]+', '', 'g')) AS clean_value,
      |       (c_custkey * 7919 % 17000) / 100.0 - 85.0 AS latitude,
      |       (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS longitude,
      |       c_custkey * 37 % 1000000 AS population,
      |       (c_custkey % 10 = 0) AS is_aggregate,
      |       (c_custkey % 500) + 1.0 AS area,
      |       CASE (c_nationkey % 3) WHEN 0 THEN 'US' WHEN 1 THEN 'CA' ELSE 'MX' END AS country,
      |       CASE (c_custkey % 4) WHEN 0 THEN 'City' WHEN 1 THEN 'ZipCode' WHEN 2 THEN 'County' ELSE 'MetroArea' END AS geo_type,
      |       'ST' || (c_nationkey % 25)::VARCHAR AS state_prov,
      |       lpad((10000 + c_custkey % 90000)::VARCHAR, 5, '0') AS zip_code,
      |       (c_custkey * 7919 % 17000) / 100.0 - 85.0 - 0.5 AS ll_latitude,
      |       (c_custkey * 7919 % 17000) / 100.0 - 85.0 + 0.5 AS ur_latitude,
      |       (c_custkey * 104729 % 36000) / 100.0 - 180.0 - 0.5 AS ll_longitude,
      |       (c_custkey * 104729 % 36000) / 100.0 - 180.0 + 0.5 AS ur_longitude,
      |       lower(CASE (c_nationkey % 3) WHEN 0 THEN 'US' WHEN 1 THEN 'CA' ELSE 'MX' END) ||
      |         '__' || lower('ST' || (c_nationkey % 25)::VARCHAR) ||
      |         '__' || replace(lower(regexp_replace(c_name, '[^0-9a-zA-Z ]+', '', 'g')), ' ', '_') AS reference_code,
      |       c_name AS short_display,
      |       c_name || ', ' || 'ST' || (c_nationkey % 25)::VARCHAR || ', ' ||
      |         CASE (c_nationkey % 3) WHEN 0 THEN 'US' WHEN 1 THEN 'CA' ELSE 'MX' END AS long_display,
      |       CASE WHEN c_custkey % 4 = 3 THEN (c_custkey % 100) + 1 END AS metro_size,
      |       CASE (c_custkey % 5) WHEN 0 THEN 'America/Chicago' WHEN 1 THEN 'America/New_York'
      |            WHEN 2 THEN 'America/Denver' WHEN 3 THEN 'America/Los_Angeles' END AS primary_timezone,
      |       CASE WHEN c_custkey % 7 <> 0 THEN c_custkey // 7 * 7 END AS related_shape_id
      |FROM customer""".stripMargin
}
