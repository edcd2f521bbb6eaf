package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.KmvSketchAgg

/** Column API over the KMV distinct-count sketch
  * ([[graft.functions.KmvSketchAgg]]) plus the shared 60-bit portable
  * hash both engines agree on. See the aggregate's scaladoc for the
  * algorithm, provenance and 100 TB posture; this object is the thin
  * declarative surface the queries (sk1/sk2) and oracle SQL mirror.
  */
object Sketches {

  /** Portable 60-bit hash: the first 15 hex chars of md5, nonnegative
    * and exact in a signed 64-bit lane on BOTH engines — Spark
    * `conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
    * `CAST('0x' || substring(md5(x),1,15) AS UBIGINT)` (the tx16
    * hashed-gram key, one character wider than the 32-bit halves the
    * word hash assembles). Uniform on [0, 2^60) for the estimator. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL mirror of [[hash60]] for generated oracles. */
  def hash60Sql(expr: String): String =
    s"CAST(CAST(concat('0x', substring(md5($expr), 1, 15)) AS UBIGINT) AS BIGINT)"

  /** The sketch aggregate: ≤k smallest distinct hashes, ascending. */
  def kmvSketch(hashed: Column, k: Int): Column =
    KmvSketchAgg.column(hashed, k)

  /** Distinct-count estimate from a sketch column: exact size below
    * saturation, (k−1)·2^60 / H_k at it. Pure double arithmetic —
    * IEEE-identical cross-engine, truncated by callers for display. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60)) /
        element_at(sketch, k).cast("double"))

  /** SQL mirror of [[kmvEstimate]] over a list-typed sketch. 2^60 is
    * exactly representable, so the literal round-trips bit-for-bit. */
  def kmvEstimateSql(sketch: String, k: Int): String =
    s"CASE WHEN len($sketch) < $k THEN CAST(len($sketch) AS DOUBLE) " +
      s"ELSE ${(k - 1).toDouble * math.pow(2.0, 60)} / CAST($sketch[$k] AS DOUBLE) END"

  /** Checksum of the sketch CONTENT — lets the driver hash-compare the
    * full k-min set as one string column (arrays themselves are
    * compared element-wise too, but the checksum makes content drift
    * legible in a single cell). */
  def sketchChecksum(sketch: Column): Column =
    md5(array_join(transform(sketch, h => h.cast("string")), ","))

  /** SQL mirror of [[sketchChecksum]]. */
  def sketchChecksumSql(sketch: String): String =
    s"md5(array_to_string(list_transform($sketch, h -> CAST(h AS VARCHAR)), ','))"
}
