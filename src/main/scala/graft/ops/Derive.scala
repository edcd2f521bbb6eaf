package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure column-expression derivations — the reference's scalar helper
  * surface re-expressed as codegen-friendly `Column` composites (no
  * UDFs, so every one of these stays inside WholeStageCodegen and is
  * pushdown/prune-transparent to Catalyst).
  *
  * Reference provenance (file:line in /root/reference):
  *  - filling_rate: notebooks/01_youbike_analysis.ipynb:66
  *  - hour / weekday flags: 01:68-69, 01:1130
  *  - is_peak: 01:278
  *  - risk label: 01:964
  *  - rain category: notebooks/05_multistation_lstm.ipynb:84-94
  *    (duplicated at api/app/main.py:150-156 and dashboard/app.py:55-59 —
  *    here it is ONE shared definition)
  *  - haversine: 01:33-40
  *  - tz normalize: etl_job.py:106-109
  *  - clamp/round: api/app/main.py:199
  */
object Derive {

  /** Great-circle distance in meters, R = 6 371 000 (01:33-40).
    * Pure expression composite — stays codegen'd. */
  def haversineMeters(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val r = lit(6371000.0)
    val dLat = radians(lat2 - lat1)
    val dLng = radians(lng2 - lng1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLng / 2), 2)
    lit(2.0) * r * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** bikes_available / total_spaces (01:66). */
  def fillingRate(bikes: Column, total: Column): Column = bikes / total

  /** pandas `.dt.dayofweek < 5` (Mon=0) → Spark dayofweek (Sun=1):
    * weekday = Mon..Fri = dayofweek in [2,6]. The convention trap is
    * unit-tested explicitly (SURVEY §7.3 #3). */
  def isWeekday(ts: Column): Column = dayofweek(ts).between(2, 6)

  def isWeekend(ts: Column): Column = !isWeekday(ts)

  /** hour ∈ {7,8,9,17,18,19} (01:278). */
  def isPeak(hourCol: Column): Column = hourCol.isin(7, 8, 9, 17, 18, 19)

  /** filling_rate < 0.1 → 'Shortage' else 'Normal' (01:964). */
  def riskLabel(rate: Column): Column =
    when(rate < 0.1, "Shortage").otherwise("Normal")

  /** rain mm → category {0,1,2,3}: null/0→0, ≤2→1, ≤10→2, else 3
    * (05:84-94; the reference does `fillna(0)` first at 05:91, so NULL
    * rain is category 0). Single shared definition for the three
    * reference copies. */
  def rainCategory(rain: Column): Column =
    when(rain.isNull || rain === 0.0, 0)
      .when(rain <= 2.0, 1).when(rain <= 10.0, 2).otherwise(3)

  /** Naive Asia/Taipei wall time → naive UTC (etl_job.py:106-109).
    * Taipei has no DST, so this is an exact −8 h shift. */
  def taipeiToUtc(ts: Column): Column = to_utc_timestamp(ts, "Asia/Taipei")

  /** Hour-truncated timestamp join key (03_data_merge.ipynb:79). */
  def hourKey(ts: Column): Column = date_trunc("hour", ts)

  /** `max(0, int(round(x)))` (api/app/main.py:199). */
  def clampRoundNonNeg(x: Column): Column =
    greatest(lit(0), round(x).cast("int"))

  /** Strip the "YouBike2.0_" style prefix (05:55). */
  def stripPrefix(name: Column, prefix: String): Column =
    regexp_replace(name, "^" + java.util.regex.Pattern.quote(prefix), "")
}
