package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series join SURVEY §2.4 J2 only
  * approximates by hour-bucketing: for every left row, attach the
  * value of the LATEST right row whose time is ≤ the left row's time,
  * per key (sensor readings, slowly-changing dimensions, checkpoint
  * state). Spark has no built-in; the naive range join explodes to a
  * per-key cartesian.
  *
  * Recipe (the standard shuffle-bounded one): tag both sides, union
  * on a common schema, sort each key's rows by (time, right-first on
  * ties), and carry the right side's values forward with a running
  * `last(ignoreNulls)` frame — ONE shuffle on the key, one per-key
  * sort (spill-safe), no range explosion, O(n log n) per key. Right
  * rows at exactly the left row's timestamp apply (≥ semantics, the
  * same contract as DuckDB's native ASOF JOIN, which the oracle uses).
  *
  * Contract: `right` must be unique per (keyCols, rightTime) — two
  * right rows at the same instant would make the carried value
  * order-dependent. Left rows with no earlier right row get NULLs.
  * At 100 TB the shuffle is keyed like any windowed op; a KEYLESS
  * as-of (one global series) instead range-partitions the time axis
  * and carries boundary values across partitions —
  * [[asofBackwardGlobal]].
  */
object AsOf {

  /** Attach `valCols` (as `outPrefix + name`) from the latest `right`
    * row at or before each `left` row's time, matching on `keyCols`. */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String, valCols: Seq[String],
                   outPrefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "asofBackward needs at least one key column " +
      "(a keyless global as-of must range-partition the time axis instead)")
    require(valCols.nonEmpty, "valCols must be non-empty")
    val lCols = left.columns.toSeq
    val outCols = valCols.map(outPrefix + _)
    require(!lCols.exists(outCols.contains),
      s"left already has ${outCols.filter(lCols.contains)} — pick another outPrefix")
    // Carry ONE struct of all valCols, not each column independently:
    // the struct is non-null whenever a right row matched, even if some
    // (or all) of its FIELDS are null, so a matched row's null value is
    // returned as-is — per-column last(ignoreNulls) would instead skip
    // it and stitch in an OLDER row's value (and with several valCols
    // could mix values from different right rows), diverging from the
    // "latest right row at or before t" contract and from DuckDB's
    // native ASOF JOIN. (r7 ADVICE item, spec-pinned in AsOfSpec.)
    val valsType = org.apache.spark.sql.types.StructType(
      valCols.map(v => right.schema(v).copy(name = v)))
    val lTagged = left.select(
      lCols.map(col) :+ col(leftTime).as("__t") :+ lit(0).as("__is_r") :+
        lit(null).cast(valsType).as("__vals"): _*)
    val rTagged = right.select(
      (lCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTime).as("__t") :+ lit(1).as("__is_r")) :+
        struct(valCols.map(col): _*).as("__vals"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
    carried.filter(col("__is_r") === 0)
      .select(lCols.map(col) ++
        valCols.map(v => col("__vals").getField(v).as(outPrefix + v)): _*)
  }

  /** KEYLESS backward as-of join — one global right-hand series (a
    * checkpoint stream, a reference curve), every left row attaching
    * the latest right row at or before its time. [[asofBackward]]'s
    * keyed shuffle degenerates here (a single window partition would
    * serialize the whole dataset through one task). Two plans behind
    * one API, chosen by an ENFORCED right-side count:
    *
    *  - right ≤ `maxBroadcastRows` (the common checkpoint-series
    *    shape): [[asofGlobalBroadcast]] — binary-search both sides'
    *    times against the collected right axis and broadcast-join on
    *    the index; the left side is never shuffled at all;
    *  - otherwise, range-partition the TIME AXIS (the r7 verdict's
    *    recipe):
    *
    *  1. one column-pruned pass sketches the union's time axis into
    *     `buckets` approximate-quantile cut points (balanced buckets
    *     whatever the time distribution — skew lands in the sketch,
    *     not the shuffle);
    *  2. the right side aggregates to one latest-value row PER BUCKET
    *     (tiny), which a B-row running window turns into each bucket's
    *     carry-in — the latest right value of ALL earlier buckets;
    *  3. the union shuffles ONCE on the bucket id; an in-bucket
    *     running `last(ignoreNulls)` over (time, right-first) carries
    *     values forward, and bucket-leading left rows fall back to the
    *     broadcast carry-in.
    *
    * No global sort, no range explosion; parallelism = `buckets`
    * (size it ~2-4x the cluster's cores at scale). Same null-value
    * contract as the keyed form: the whole right-row struct is
    * carried, so a matched row's NULL field comes through as NULL.
    * `right` must be unique per `rightTime`; times must be non-null.
    * Bucket boundaries cannot split equal times (bucketing is by
    * value), so the >= tie semantics survive partitioning; the cut
    * points only steer balance — ANY bucketing yields the same rows,
    * which is why the approximate sketch is safe. */
  def asofBackwardGlobal(left: DataFrame, right: DataFrame,
                         leftTime: String, rightTime: String,
                         valCols: Seq[String], outPrefix: String = "asof_",
                         buckets: Int = 64,
                         maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(valCols.nonEmpty, "valCols must be non-empty")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(maxBroadcastRows >= 0, s"maxBroadcastRows: $maxBroadcastRows")
    val lCols = left.columns.toSeq
    val outCols = valCols.map(outPrefix + _)
    require(!lCols.exists(outCols.contains),
      s"left already has ${outCols.filter(lCols.contains)} — pick another outPrefix")
    // Fast path for the COMMON keyless shape — a right series small
    // enough to broadcast (checkpoint streams, reference curves): both
    // sides map their time onto an index in the collected, sorted right
    // time axis (one codegen'd binary search per row), and the as-of
    // becomes a broadcast hash equi-join on that index. The big left
    // side is NEVER shuffled — zero exchanges touch it at any scale.
    // The guard is the same enforced-bound move as lineDedup's
    // broadcast guard, folded into the collect itself: fetch at most
    // bound+1 time keys in ONE job — overflow proves the right side is
    // too big and the range-partitioned path below takes over. Decimal
    // axes past 18 digits have no exact long/double search key, so they
    // skip straight to the partitioned path, which orders on the RAW
    // column (exact at any precision; doubles appear only in the
    // approximate bucket cuts, where lossiness is harmless).
    val broadcastKeyable = left.schema(leftTime).dataType match {
      case d: org.apache.spark.sql.types.DecimalType => d.precision <= 18
      case _ => true
    }
    if (maxBroadcastRows > 0 && broadcastKeyable) {
      val cap = math.min(maxBroadcastRows, (Int.MaxValue - 2).toLong).toInt
      val lt = left.schema(leftTime).dataType
      val rt = right.schema(rightTime).dataType
      require(lt == rt,
        s"leftTime ($lt) and rightTime ($rt) must share a type for the time-key mapping")
      // ONE pass collects time keys AND payloads together — the right
      // plan never executes again, so a nondeterministic right side
      // (float-sum aggregates) cannot diverge between the axis and the
      // joined values
      val probeDf = right.select(timeKey(col(rightTime), rt).as("__tk"),
        struct(valCols.map(col): _*).as("__vals"))
      val probed = probeDf.limit(cap + 1).collect()
      if (probed.length <= cap) {
        probed.foreach(r =>
          require(!r.isNullAt(0), "right times must be non-null"))
        val integral = integralTime(rt)
        val sorted =
          if (integral) probed.sortBy(_.getLong(0))
          else probed.sortBy(_.getDouble(0))
        val dup = "right must be unique per rightTime (two rows share an instant)"
        val idxExpr: Column => Column =
          if (integral) {
            val times = sorted.map(_.getLong(0))
            times.sliding(2).foreach(p => require(p.length < 2 || p(0) < p(1), dup))
            c => org.apache.spark.sql.graftbridge.ColumnBridge.column(
              graft.functions.BinarySearchLELong(
                org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), times))
          } else {
            val times = sorted.map(_.getDouble(0))
            times.sliding(2).foreach(p => require(p.length < 2 || p(0) < p(1), dup))
            c => org.apache.spark.sql.graftbridge.ColumnBridge.column(
              graft.functions.BinarySearchLE(
                org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), times))
          }
        return asofGlobalBroadcast(left, leftTime, lt, valCols, outPrefix,
          lCols, idxExpr,
          sorted.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row(i, r.get(1))
          },
          probeDf.schema("__vals").dataType)
      }
    }
    val spark = left.sparkSession
    val valsType = org.apache.spark.sql.types.StructType(
      valCols.map(v => right.schema(v).copy(name = v)))
    val lTagged = left.select(
      lCols.map(col) :+ col(leftTime).as("__t") :+ lit(0).as("__is_r") :+
        lit(null).cast(valsType).as("__vals"): _*)
    val rTagged = right.select(
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTime).as("__t") :+ lit(1).as("__is_r") :+
        struct(valCols.map(col): _*).as("__vals"): _*)
    val union = lTagged.unionByName(rTagged)
    val cuts: Array[Double] =
      if (buckets == 1) Array.empty
      else union.select(col("__t").cast("double").as("__td"))
        .stat.approxQuantile("__td",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
    val bucketOf: Column = {
      val td = col("__t").cast("double")
      cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
        case ((c, i), rest) => when(td < c, i).otherwise(rest)
      }
    }
    val b = union.withColumn("__bucket", bucketOf)
    // per-bucket latest right value -> exclusive running carry over the
    // COMPLETE bucket spine (so right-empty buckets inherit too); the
    // single-partition window is over at most `buckets` rows
    val bounds = b.filter(col("__is_r") === 1)
      .groupBy("__bucket").agg(max_by(col("__vals"), col("__t")).as("__bval"))
    val spine = spark.range(cuts.length + 1)
      .select(col("id").cast("int").as("__bucket"))
    val wSpine = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(bounds, Seq("__bucket"), "left")
      .withColumn("__carry_in", last(col("__bval"), ignoreNulls = true).over(wSpine))
      .select("__bucket", "__carry_in")
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("__t").asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = b.join(broadcast(carry), Seq("__bucket"))
      .withColumn("__vals",
        coalesce(last(col("__vals"), ignoreNulls = true).over(w), col("__carry_in")))
    // a NULL left time must come out null (the keyed recipe's contract:
    // nulls sort first and see no right row) — unmasked, the null lands
    // in the last bucket and would pick up that bucket's carry-in. A NaN
    // time needs no mask: it sorts last and takes the latest right row,
    // which is what the keyed recipe, DuckDB ASOF, and the broadcast
    // path's NaN kernel rule all produce.
    carried.filter(col("__is_r") === 0)
      .select(lCols.map(col) ++
        valCols.map(v =>
          when(col("__t").isNotNull, col("__vals").getField(v))
            .as(outPrefix + v)): _*)
  }

  /** Timestamp/date/integral axes search as EXACT longs (a double
    * collapses distinct values beyond 2^53); only float/double time
    * columns take the double kernel. */
  private def integralTime(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType | TimestampNTZType | DateType => true
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.precision <= 18 // exact unscaled-long key
      case _ => false
    }
  }

  /** Order-preserving search key for a time column: micros for
    * timestamps, days for dates, long for integral numerics (all
    * exact), double for floating columns. Both sides run the SAME
    * mapping, so equal times produce identical keys and the >= tie
    * semantics survive the translation. */
  private def timeKey(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType | TimestampNTZType => unix_micros(c)
      case DateType => unix_date(c).cast("long")
      case d: DecimalType if d.precision <= 18 =>
        // exact, order-preserving: the UNSCALED value at the column's own
        // fixed scale. A cast("long") would drop the fraction and a
        // cast("double") collapses distinct values past 2^53 (r8 ADVICE) —
        // either way the broadcast path's uniqueness require could fire on
        // a valid series or match the wrong row. |unscaled| < 10^18 fits
        // a long; the multiply is integral so the final cast is exact.
        (c * lit(java.math.BigDecimal.TEN.pow(d.scale))).cast("long")
      case d: DecimalType =>
        throw new IllegalArgumentException(
          s"time axis $d exceeds 18 digits of precision — the exact long " +
            "key would overflow; cast the time column to decimal(<=18,s), " +
            "a timestamp, or an integral type first")
      case _ if integralTime(dt) => c.cast("long")
      case _ => c.cast("double")
    }
  }

  /** The broadcast fast path of [[asofBackwardGlobal]]: `idxOf` binary-
    * searches a time key against the collected, sorted, uniqueness-
    * checked right axis (long or double kernel per the time type) and
    * `indexedRows` carry the matching (index, payload struct) rows as a
    * local relation — the right plan is never executed again. A null
    * left time searches to null → matches nothing → null output; a NaN
    * time (floating axes) matches the LAST right row — both identical
    * to the partitioned path, the keyed recipe, and DuckDB ASOF
    * (AsOfSpec pins all three behaviors on both paths). */
  private def asofGlobalBroadcast(left: DataFrame, leftTime: String,
                                  lt: org.apache.spark.sql.types.DataType,
                                  valCols: Seq[String], outPrefix: String,
                                  lCols: Seq[String],
                                  idxOf: Column => Column,
                                  indexedRows: Seq[org.apache.spark.sql.Row],
                                  valsType: org.apache.spark.sql.types.DataType)
      : DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val rIndexed = left.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(indexedRows).asJava,
      StructType(Seq(StructField("__idx", IntegerType, nullable = false),
        StructField("__vals", valsType, nullable = true))))
    left
      .withColumn("__idx", idxOf(timeKey(col(leftTime), lt)))
      .join(broadcast(rIndexed), Seq("__idx"), "left")
      .select(lCols.map(col) ++
        valCols.map(v => col("__vals").getField(v).as(outPrefix + v)): _*)
  }
}
