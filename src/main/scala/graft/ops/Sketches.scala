package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{HllSketchAgg, KmvPairSketchAgg, KmvSketchAgg}

/** Column API over the distinct-count sketches
  * ([[graft.functions.KmvSketchAgg]], [[graft.functions.HllSketchAgg]])
  * plus the shared 60-bit portable hash both engines agree on. See the
  * aggregates' scaladoc for algorithm, provenance and 100 TB posture;
  * this object is the thin declarative surface the queries (sk1-sk3)
  * and oracle SQL mirror.
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

  // ---- KMV multiset operations (sk4) ------------------------------------

  /** Union sketch of two KMV sketches over the same hash space: the k
    * smallest of the merged distinct minima — Beyer et al. 2007's
    * closure property (each global minimum survives its own side's k
    * minima, so the union's sketch is exactly recoverable from the
    * two sketches). */
  def kmvUnionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** How many of the union sketch's values belong to BOTH input
    * sketches — the match count whose fraction of |mk| estimates the
    * Jaccard similarity (and, times [[kmvEstimate]] of the union
    * sketch, the intersection cardinality). */
  def kmvMatchCount(mk: Column, a: Column, b: Column): Column =
    size(filter(mk, h => array_contains(a, h) && array_contains(b, h)))

  // ---- Bottom-k sample quantile sketch (sk7) ------------------------------

  /** Bottom-k-by-hash sample sketch carrying long values — see
    * [[graft.functions.KmvPairSketchAgg]]. `hashed` must be
    * [[hash60]] of a UNIQUE row key. */
  def sampleSketch(hashed: Column, value: Column, k: Int): Column =
    KmvPairSketchAgg.column(hashed, value, k)

  /** Quantile estimate from a sample-sketch value list: sort, then the
    * standard (m−1)·q linear interpolation — the same definition both
    * engines' exact quantile functions use, spelled out so the
    * arithmetic is IEEE-identical cross-engine (floor/least/element_at
    * on exact integer-valued doubles). */
  def sampleQuantile(vals: Column, q: Double): Column = {
    val sorted = array_sort(vals)
    val m = size(vals)
    val idx = (m - 1).cast("double") * lit(q)
    val lo = floor(idx).cast("int")
    val frac = idx - lo.cast("double")
    val vlo = element_at(sorted, lo + 1).cast("double")
    val vhi = element_at(sorted, least(lo + lit(2), m)).cast("double")
    vlo + frac * (vhi - vlo)
  }

  /** SQL mirror of [[sampleQuantile]] over a list-typed sample. Same
    * sort, same index arithmetic, same operation order. */
  def sampleQuantileSql(vals: String, q: Double): String = {
    val sv = s"list_sort($vals)"
    val m = s"len($vals)"
    val idx = s"(CAST(($m - 1) AS DOUBLE) * $q)"
    val lo = s"CAST(floor($idx) AS INT)"
    val frac = s"($idx - CAST($lo AS DOUBLE))"
    val vlo = s"CAST($sv[$lo + 1] AS DOUBLE)"
    val vhi = s"CAST($sv[least($lo + 2, $m)] AS DOUBLE)"
    s"($vlo + $frac * ($vhi - $vlo))"
  }

  // ---- Count-min sketch (sk5) -------------------------------------------

  /** Count-min bucket for one sketch row (Cormode & Muthukrishnan,
    * J. Algorithms 55(1), 2005): the row index salts the shared md5
    * hash (`"r:item"`), giving d independent-enough bucket functions
    * from the one portable hash both engines replay. The CMS itself
    * is a (row, bucket) → count TABLE here, not a driver array — at
    * corpus scale the build is one bounded map-side-combining shuffle
    * to d·w rows, and point queries broadcast-join that fixed-size
    * table. */
  def cmsBucket(row: Column, item: Column, width: Int): Column =
    pmod(hash60(concat_ws(":", row, item)), lit(width))

  /** SQL mirror of [[cmsBucket]]. */
  def cmsBucketSql(rowExpr: String, itemExpr: String, width: Int): String =
    s"${hash60Sql(s"concat_ws(':', $rowExpr, $itemExpr)")} % $width"

  // ---- HyperLogLog (sk3) ------------------------------------------------

  /** The HLL register-array aggregate: m = 2^p byte registers holding
    * per-bucket max rank, emitted as an int array in bucket order. */
  def hllSketch(hashed: Column, p: Int): Column =
    HllSketchAgg.column(hashed, p)

  /** Second-level HLL rollup: element-wise register-max merge over a
    * column of [[hllSketch]] register arrays (sk8's in-plan identity —
    * merged ≡ direct, so sketches persisted per shard/day re-aggregate
    * to any coarser grain without re-reading raw data). */
  def hllMerge(regs: Column, p: Int): Column =
    graft.functions.HllMergeAgg.column(regs, p)

  /** Flajolet et al. 2007 §4's bias-correction constant α_m. */
  def hllAlpha(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate from an HLL register array: the raw
    * harmonic-mean form E = α_m·m² / Σ 2^(−M_j), with the paper's
    * small-range correction (linear counting m·ln(m/V) when E ≤ 2.5m
    * and V = #zero registers > 0). Pure double arithmetic in a fixed
    * left-to-right fold over the registers, so the oracle's
    * `list_reduce` replays the identical rounding sequence (0.0+x₁ ≡ x₁
    * bit-exact, so Spark's zero-seeded fold matches DuckDB's
    * first-element-seeded one); the sub-ulp ln() divergence between
    * libms is absorbed by the callers' trunc-6 display fudge. */
  def hllEstimate(regs: Column, p: Int): Column = {
    val m = 1 << p
    val amm = hllAlpha(p) * m * m
    val harmonic = aggregate(regs, lit(0.0),
      (acc, r) => acc + pow(lit(2.0), -r.cast("double")))
    val raw = lit(amm) / harmonic
    val zeros = size(filter(regs, r => r === 0))
    when(raw <= lit(2.5 * m) && zeros > lit(0),
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** SQL mirror of [[hllEstimate]] over a list-typed register array.
    * Same fold order, same decimal literals (Scala Double.toString
    * round-trips to the identical IEEE value in DuckDB's parser). */
  def hllEstimateSql(regs: String, p: Int): String = {
    val m = 1 << p
    val amm = hllAlpha(p) * m * m
    val harmonic = s"list_reduce(list_transform($regs, " +
      s"r -> power(2.0, -CAST(r AS DOUBLE))), (a, b) -> a + b)"
    val zeros = s"len(list_filter($regs, r -> r = 0))"
    s"CASE WHEN ($amm / $harmonic) <= ${2.5 * m} AND $zeros > 0 " +
      s"THEN ${m.toDouble} * ln(${m.toDouble} / CAST($zeros AS DOUBLE)) " +
      s"ELSE $amm / $harmonic END"
  }

  /** SQL for the (bucket, rho) pair [[graft.functions.HllSketchAgg]]
    * computes per hash: bucket = top p bits via integer division, ρ =
    * leading zeros of the w-bit remainder + 1 via the minimal-binary-
    * string length (len(bin(rem)) = ⌊log₂ rem⌋ + 1, exact integer
    * arithmetic — no floating log₂ edge cases at powers of two). */
  def hllRhoSql(hashExpr: String, p: Int): (String, String) = {
    val w = 60 - p
    val div = 1L << w
    val bucket = s"CAST(($hashExpr) // $div AS INT)"
    val rho = s"CASE WHEN ($hashExpr) % $div = 0 THEN ${w + 1} " +
      s"ELSE ${w + 1} - length(ltrim(bin(($hashExpr) % $div), '0')) END"
    (bucket, rho)
  }
}
