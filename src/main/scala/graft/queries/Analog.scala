package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The YouBike star schema (SURVEY §1.2) transplanted onto the driver's
  * TPC-H-ish testdata (SURVEY §7.0):
  *
  *   station_status (fact)  ← events   (station_no=user_id, record_time=ts,
  *                                       bikes_available=value)
  *   station_info (dim)     ← customer ⋈ nation (district = n_name;
  *                                       capacity/coords synthesized
  *                                       deterministically from the key)
  *   MRT stations           ← supplier (coords synthesized from the key)
  *   taipei_weather_hourly  ← hourly roll-up of events (temperature =
  *                                       hourly avg value; rain mm derived
  *                                       deterministically from the hour)
  *
  * Every synthesized column is pure integer/double arithmetic on the key so
  * the DuckDB oracle can reproduce it bit-for-bit. The Spark builders and the
  * SQL CTE snippets below are maintained as pairs — change one, change both.
  */
object Analog {

  // ---- station_status (fact) --------------------------------------------
  def status(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").cast("string").as("station_no"),
      col("value").as("bikes_available"),
      col("ts").as("record_time"),
      col("event_id"),
      col("event_type"))

  val statusSql: String =
    """SELECT CAST(user_id AS VARCHAR) AS station_no, value AS bikes_available,
      |       ts AS record_time, event_id, event_type
      |FROM events""".stripMargin

  /** [[status]] restricted to a station-id set, with the membership
    * filter applied to the TYPED source key (`user_id`) before the
    * public string cast. `cast(user_id AS string) IN ('2','3',…)` never
    * reaches the parquet scan — there is no safe unwrap for string
    * casts (the string '02' would have to match), so the filter
    * evaluates post-scan and a 100 TB fact table is read in full. On
    * the source-typed key the scan receives `PushedFilters:
    * [In(user_id, …)]` and skips row groups by min/max stats
    * (PlanAuditSpec asserts exactly this on the f6 plan). */
  def statusForStations(s: SparkSession, d: String, ids: Seq[Long]): DataFrame =
    Tables.events(s, d).filter(col("user_id").isin(ids: _*)).select(
      col("user_id").cast("string").as("station_no"),
      col("value").as("bikes_available"),
      col("ts").as("record_time"),
      col("event_id"),
      col("event_type"))

  // ---- station_info (dimension) -----------------------------------------
  /** Capacity and coordinates are key-derived:
    *   total_spaces = 100 + c_custkey % 400
    *   lat = 24.8 + (c_custkey % 1000) / 2000.0
    *   lng = 121.3 + ((c_custkey * 7) % 1000) / 2000.0
    */
  def info(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey").cast("string").as("station_no"),
        col("c_name").as("name_tw"),
        col("n_name").as("district"),
        (lit(100) + col("c_custkey") % 400).cast("int").as("total_spaces"),
        (lit(24.8) + (col("c_custkey") % 1000) / 2000.0).as("lat"),
        (lit(121.3) + ((col("c_custkey") * 7) % 1000) / 2000.0).as("lng"))

  val infoSql: String =
    """SELECT CAST(c_custkey AS VARCHAR) AS station_no, c_name AS name_tw,
      |       n_name AS district,
      |       CAST(100 + c_custkey % 400 AS INT) AS total_spaces,
      |       24.8 + (c_custkey % 1000) / 2000.0 AS lat,
      |       121.3 + ((c_custkey * 7) % 1000) / 2000.0 AS lng
      |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  // ---- MRT stations (tiny broadcast side of the NN spatial join) ---------
  def mrt(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      col("s_suppkey").as("mrt_id"),
      (lit(24.8) + ((col("s_suppkey") * 37) % 1000) / 2000.0).as("mrt_lat"),
      (lit(121.3) + ((col("s_suppkey") * 13) % 1000) / 2000.0).as("mrt_lng"))

  val mrtSql: String =
    """SELECT s_suppkey AS mrt_id,
      |       24.8 + ((s_suppkey * 37) % 1000) / 2000.0 AS mrt_lat,
      |       121.3 + ((s_suppkey * 13) % 1000) / 2000.0 AS mrt_lng
      |FROM supplier""".stripMargin

  // ---- taipei_weather_hourly ---------------------------------------------
  /** Hourly roll-up of the fact stream: temperature = avg(value) for the
    * hour; rain mm = ((hour_of_day * 7) % 13) so all four rain categories
    * (05_multistation_lstm.ipynb:84-94) occur. */
  def weather(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_key"))
      .agg(avg("value").as("temperature"))
      .withColumn("rain", ((hour(col("hour_key")) * 7) % 13).cast("double"))

  val weatherSql: String =
    """SELECT date_trunc('hour', ts) AS hour_key, avg(value) AS temperature,
      |       CAST((CAST(hour(ts) AS INT) * 7) % 13 AS DOUBLE) AS rain
      |FROM events GROUP BY date_trunc('hour', ts), hour(ts)""".stripMargin
}
