package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Spark
  * aggregate (Bar-Yossef et al., RANDOM 2002 "Counting distinct
  * elements in a data stream"; the estimator form of Beyer et al.,
  * SIGMOD 2007 "On synopses for distinct-value estimation under
  * multiset operations"). The aggregation state is the k smallest
  * DISTINCT hash values seen — a FIXED k·8-byte payload per group
  * regardless of input cardinality, fully mergeable (union = insert
  * both sides' values, keep the k smallest), which is exactly the
  * shape a 100 TB distinct-count needs: map-side partial sketches
  * combine before the shuffle, the exchange carries k longs per
  * (partition, group), and a second-level aggregation over first-level
  * sketches is ALGEBRAICALLY IDENTICAL to sketching the raw stream —
  * the property the sk2 query pins in-plan and KmvSketchSpec pins
  * exactly. Contrast `countDistinct`, whose exact per-group state
  * grows with the value universe and re-shuffles raw values.
  *
  * Spark's own `approx_count_distinct` (HLL++) covers the same need
  * with a private binary state; this sketch exists because its state
  * is PORTABLE — the k-min set of 60-bit md5 prefixes is exactly
  * reproducible in ANSI SQL (`list_sort(list(DISTINCT h))[1:k]`), so
  * the driver's DuckDB oracle hash-checks the sketch CONTENT and the
  * estimate, not just a row count (SURVEY §5.2's strongest gate).
  * Inputs arrive pre-hashed (see [[graft.ops.Sketches.hash60]]) so
  * both engines agree bit-for-bit on the hash space.
  *
  * Estimator: with h uniform on [0, 2^60) and H_k the k-th smallest
  * distinct value, D̂ = (k−1)·2^60 / H_k (the unbiased KMV form);
  * when fewer than k distinct values exist the sketch IS the distinct
  * set and the exact size is returned ([[graft.ops.Sketches
  * .kmvEstimate]]). Relative error ~ 1/√(k−2).
  *
  * Not codegen'd (TypedImperativeAggregate evaluates through
  * ObjectHashAggregate) — the per-row work is one TreeSet probe on a
  * 64-entry set, and the aggregate sits behind a hash shuffle, not in
  * a scan hot path. Reference provenance: the pipeline's distinct-value
  * passes — `df_reset['district'].unique()` (notebooks/
  * 01_youbike_analysis.ipynb cell 2 line 21) and the station-key
  * `drop_duplicates` (etl_job.py:101) — are exact in-memory scans;
  * this is the bounded-state form the same tallies need once the
  * value universe no longer fits one machine. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2 (k-1 drives the estimator), got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a pre-hashed LONG input (got ${child.dataType.sql}); " +
        "hash with Sketches.hash60 so the DuckDB oracle shares the hash space")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // strictly smaller than the current k-th min: displaces it —
      // unless h is already present (add returns false: no displacement,
      // the set must keep exactly the k smallest DISTINCT values)
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next().longValue())
    buf
  }

  /** Ascending (TreeSet iteration order) array of the ≤k minima — the
    * exact value `list_sort(list(DISTINCT h))[1:k]` yields in the
    * oracle. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** Column form: the sketch aggregate over a pre-hashed long column. */
  def column(hashed: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hashed), k).toAggregateExpression())
}

/** Bottom-k-by-hash SAMPLE sketch: the [[KmvSketchAgg]] state extended
  * to carry a long VALUE alongside each of the k smallest distinct
  * identity hashes. The k retained values are a uniform random sample
  * of the group WITHOUT replacement (each row's inclusion depends only
  * on its identity hash's rank), fully mergeable (union = insert both
  * sides, keep the k hash-smallest) and layout-invariant — no rand(),
  * no partition-order dependence. That makes it the bounded-state,
  * map-side-combining QUANTILE sketch (sk7): exact quantiles of the
  * sample estimate the group's quantiles with ~O(1/√k) error
  * (sampling-based quantile estimation, the Manku/Rajagopalan/Lindsay
  * SIGMOD 1999 family), while `percentile()`'s exact state grows with
  * the value universe.
  *
  * Portability contract (same as KMV): hashes are 60-bit md5 prefixes
  * ([[graft.ops.Sketches.hash60]] of the row's identity), so the
  * oracle rebuilds the identical sample in ANSI SQL — rank rows by the
  * same hash, keep the k smallest, read their values in hash order.
  * Output is the VALUES ordered by ascending hash (the hashes
  * themselves are scaffolding; the value list in hash order is the
  * full sample content the checksum pins).
  *
  * Duplicate identity hashes keep the FIRST-inserted value — callers
  * hash a UNIQUE row key (doc_id), so ties are md5(60-bit) collisions,
  * ~n²/2⁶¹ at any realistic group size; the oracle's deterministic
  * `ORDER BY h` rank breaks a tie the same way only when values also
  * agree, which is why the contract demands a unique key. */
case class KmvPairSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 2, s"kmv_pair_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kmv_pair_sketch expects (hash LONG, value LONG) — hash with " +
        s"Sketches.hash60; got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_pair_sketch"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def insert(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     h: Long, v: Long): Unit = {
    if (buf.size < k) { if (!buf.containsKey(h)) buf.put(h, v); () }
    else if (h < buf.lastKey() && !buf.containsKey(h)) {
      buf.put(h, v)
      buf.pollLastEntry()
      ()
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      insert(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, e.getKey.longValue(), e.getValue.longValue())
    }
    buf
  }

  /** The sampled VALUES in ascending-hash order — exactly the list the
    * oracle rebuilds by ranking on the same hash. */
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvPairSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvPairSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvPairSketchAgg =
    copy(left = newLeft, right = newRight)
}

object KmvPairSketchAgg {
  /** Column form: bottom-k sample of `value` keyed by pre-hashed `hashed`. */
  def column(hashed: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      KmvPairSketchAgg(ColumnBridge.expression(hashed),
        ColumnBridge.expression(value), k).toAggregateExpression())
}
