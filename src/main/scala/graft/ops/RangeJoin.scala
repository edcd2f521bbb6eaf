package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the range-join optimization
  * (popularized by Databricks' range-join hints and Spark's own
  * SPARK-8682 discussions) restated as an explicit plan shape: Spark
  * plans a raw `p.ts BETWEEN i.start AND i.end` join as
  * BroadcastNestedLoop or a cartesian (there is no equi-key), which is
  * O(|points|·|intervals|) at any scale. Bucketing manufactures the
  * equi-key: points map to their fixed-width time bucket, intervals
  * EXPLODE into every bucket they overlap, the join runs as a plain
  * shuffle-hash equi-join on the bucket, and the exact predicate is a
  * residual filter. Cost: |points| + |intervals|·(dur/width + 1)
  * exploded rows and only same-bucket candidate pairs — never
  * all-pairs.
  *
  * Each matching (point, interval) pair meets in EXACTLY ONE bucket
  * (the point's), so no post-join dedup is needed — the property that
  * keeps the output a plain join result.
  *
  * Width picks the trade: width ≈ max interval duration → ≤2 buckets
  * per interval and ~(width+dur)/dur candidate inflation. At 100 TB
  * the bucket becomes the co-partitioning key for both sides (the
  * ss2-cells / tx16-grams move), so a bucket's points and intervals
  * land on the same executor and the residual filter runs map-side.
  *
  * Reference provenance: the reference joins status snapshots to
  * weather OBSERVATION HOURS by truncated-hour equality
  * (etl_job.py:160 — a degenerate width-=-duration range join); this
  * is the general form for variable-length windows (maintenance
  * periods, promotions, incident intervals).
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * [startCol, endCol) half-open window contains ptCol. Columns must
    * be timestamps. A reversed window (end < start) matches nothing —
    * enforced by an explicit pre-filter, NOT left to the residual
    * predicate: Spark's sequence() DESCENDS for stop < start, so one
    * corrupt far-past end would otherwise explode into |bucket-span|
    * rows (or throw on the array allocation) before the filter ever
    * ran. `bucketWidthSec` should be >= the typical interval
    * duration. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, s"bucket width must be positive, got $bucketWidthSec")
    val pb = points.withColumn("__bk",
      floor(unix_timestamp(col(ptCol)).cast("double") / bucketWidthSec).cast("long"))
    val ib = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bk",
        explode(sequence(
          floor(unix_timestamp(col(startCol)).cast("double") / bucketWidthSec).cast("long"),
          floor(unix_timestamp(col(endCol)).cast("double") / bucketWidthSec).cast("long"))))
    // interval side explodes and re-keys — shuffle_hash, never SMJ and
    // never broadcast (intervals are fact-scale in the general case)
    pb.join(ib.hint("shuffle_hash"), Seq("__bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bk")
  }
}
