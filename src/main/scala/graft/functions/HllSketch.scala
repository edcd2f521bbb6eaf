package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog distinct-count sketch as a native Spark aggregate
  * (Flajolet, Fusy, Gandouet, Meunier, AofA 2007 "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm").
  * The aggregation state is m = 2^p one-byte registers, each holding
  * the maximum "rank" ρ (position of the leftmost 1-bit in the hash
  * remainder) seen in its bucket — a FIXED m-byte payload per group,
  * fully mergeable (union = element-wise register max), duplicates
  * free by construction (max is idempotent). Like [[KmvSketchAgg]],
  * the shape a 100 TB distinct-count wants: map-side partials combine
  * before the shuffle, the exchange carries m bytes per (partition,
  * group), and a second-level max-merge over first-level sketches is
  * ALGEBRAICALLY IDENTICAL to sketching the raw stream. Where KMV's
  * k-min state answers "which hashes are smallest" (and so supports
  * intersection-style synopses), HLL packs the same ~1/√m error into
  * ~16x less state — the trade the two sk queries make measurable
  * side by side.
  *
  * Spark's own `approx_count_distinct` is HLL++ with a private binary
  * state; this aggregate exists because its registers are PORTABLE:
  * bucket = the top p bits of the 60-bit md5 hash, ρ over the
  * remaining w = 60−p bits, both exactly reproducible in ANSI SQL
  * (integer division / modulo + the minimal-binary-string length
  * trick, see [[graft.ops.Sketches.hllRhoSql]]), so the driver's
  * DuckDB oracle hash-checks the full register array and the
  * estimate, not just a row count. Register maxima are
  * LAYOUT-INVARIANT — max is commutative, associative and idempotent,
  * so any partitioning of the input yields byte-identical state
  * (HllSketchSpec pins this through Spark's partial/final split).
  *
  * Inputs arrive pre-hashed by [[graft.ops.Sketches.hash60]] (uniform
  * on [0, 2^60)) so both engines agree bit-for-bit on the hash space.
  * ρ ranges in [1, w+1]; w ≤ 56 < Byte.MaxValue, so a byte register
  * never saturates. Estimation (raw harmonic-mean form + the
  * small-range linear-counting correction) lives in
  * [[graft.ops.Sketches.hllEstimate]] as pure column arithmetic,
  * replayed by the oracle.
  *
  * Not codegen'd (TypedImperativeAggregate evaluates through
  * ObjectHashAggregate) — per-row work is two bit ops and an array
  * max, and the aggregate sits behind a hash shuffle, not in a scan
  * hot path. Reference provenance: the same exact distinct passes
  * KmvSketchAgg cites (notebooks/01_youbike_analysis.ipynb cell 2
  * line 21 `unique()`, etl_job.py:101 `drop_duplicates`) — this is
  * the fixed-state form those tallies need at corpus scale. */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_sketch needs 4 <= p <= 16, got $p")

  private val m: Int = 1 << p
  private val w: Int = 60 - p          // remainder width in bits
  private val remMask: Long = (1L << w) - 1L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch expects a pre-hashed LONG input (got ${child.dataType.sql}); " +
        "hash with Sketches.hash60 so the DuckDB oracle shares the hash space")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def insert(buf: Array[Byte], h: Long): Unit = {
    val bucket = (h >>> w).toInt
    val rem = h & remMask
    // ρ = leading zeros within the w-bit remainder + 1; all-zero
    // remainder → w+1 (the "ran off the end" rank of the paper)
    val rho =
      if (rem == 0L) w + 1
      else java.lang.Long.numberOfLeadingZeros(rem) - (64 - w) + 1
    if (rho > buf(bucket)) buf(bucket) = rho.toByte
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  /** Register array in bucket order — the exact value the oracle's
    * spine-joined `list(max_rho ORDER BY bucket)` yields. */
  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

object HllSketchAgg {
  /** Column form: the register-array aggregate over a pre-hashed long
    * column. */
  def column(hashed: Column, p: Int): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(hashed), p).toAggregateExpression())
}

/** Second-level HLL merge as a native aggregate: folds ALREADY-BUILT
  * register arrays (the [[HllSketchAgg]] output type) into one array by
  * element-wise max — union(A, B) for HLL is exactly register-max
  * (Flajolet et al. 2007 §4: each register already holds the max rank
  * over its bucket's elements, and max is associative/commutative/
  * idempotent). This is the 100 TB ROLLUP shape: per-shard/per-day
  * sketches persist as compact register tables, and any coarser
  * cardinality (per language, per source, global) re-aggregates the
  * m-int arrays WITHOUT touching raw data — the state per group stays
  * m bytes here exactly as in the first-level build, and the merged
  * sketch is byte-identical to sketching the raw stream (the sk8
  * in-plan identity; HllSketchSpec pins it through Spark's
  * partial/final aggregation split as well).
  *
  * Input arrays must come from a same-p build (length m = 2^p);
  * a mismatched length fails fast rather than silently mis-merging. */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_merge needs 4 <= p <= 16, got $p")

  private val m: Int = 1 << p

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_merge expects an ARRAY<INT> register array (got ${other.sql}); " +
        "feed it hll_sketch outputs")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"hll_merge(p=$p) got a ${arr.numElements()}-register array, expected $m")
      var i = 0
      while (i < m) {
        // a NULL element is NOT a register array either — without this
        // check an unsafe row reads the slot as an undefined value
        // (typically 0) and the merge silently proceeds (r12 review)
        require(!arr.isNullAt(i),
          s"hll_merge(p=$p) got a NULL register at bucket $i — " +
            "not an hll_sketch register array (registers are never null)")
        val r = arr.getInt(i)
        // ranks live in [0, w+1] ⊂ [0, 127]; a value outside the byte
        // range is NOT a register array (e.g. a count array passed by
        // mistake) and must fail, not wrap through toByte (r11 review)
        require(r >= 0 && r <= Byte.MaxValue,
          s"hll_merge(p=$p) got register value $r at bucket $i — " +
            "not an hll_sketch register array (ranks are 0..61)")
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

object HllMergeAgg {
  /** Column form: register-max merge over a column of register arrays. */
  def column(regs: Column, p: Int): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(regs), p).toAggregateExpression())
}
