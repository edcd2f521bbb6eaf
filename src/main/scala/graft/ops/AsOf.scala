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
  * as-of (one global series) must instead range-partition the time
  * axis and carry boundary values across partitions — out of scope
  * here, keep a key.
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
}
