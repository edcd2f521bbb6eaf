package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd array kernels for the embedding / fingerprint hot
  * paths (SURVEY §7.2 — custom `Expression` over UDF over nothing).
  *
  * Motivation (BENCH r2/r3): Spark's higher-order functions
  * (`aggregate`, `zip_with`, `transform`) do NOT participate in
  * whole-stage codegen — every lambda application is an interpreted
  * expression eval. An all-pairs cosine over 2k vectors × 64 dims ran
  * ~400M interpreted lambda steps (52-119 s on a contended host);
  * these kernels run the same arithmetic as a tight generated-Java
  * loop — same sequential fold order, bit-identical results, so every
  * DuckDB oracle built for the HOF forms stays exactly green.
  *
  * Null semantics mirror the HOF compositions they replace:
  *  - [[DotProductD]]/[[SquaredDistanceD]]: `zip_with` pads
  *    length-mismatched arrays with null and `aggregate`'s `+` absorbs
  *    it → null result on length mismatch or any null element;
  *  - [[SimHashPack]]: a null element hash voted −1 on every bit in
  *    the fold form (null condition → `otherwise(-1)`) → counts in n
  *    but not in the per-bit tally.
  */
abstract class ArrayPairFoldD extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // result may be null on length mismatch even for non-null inputs
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double> args, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  /** Per-pair term in Java source; `xa`/`xb` are double variable names. */
  protected def termJava(xa: String, xb: String): String
  /** Same term, interpreted. */
  protected def termScala(xa: Double, xb: Double): Double

  private def getD(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = arrA.numElements()
    if (arrB.numElements() != n) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      acc += termScala(getD(arrA, i, ta), getD(arrB, i, tb))
      i += 1
    }
    acc
  }

  private def getJava(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc, xa, xb) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("acc"), ctx.freshName("xa"), ctx.freshName("xb"))
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xa = ${getJava(a, i, elemType(left))};
         |    final double $xb = ${getJava(b, i, elemType(right))};
         |    $acc += ${termJava(xa, xb)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ in double precision, sequential fold order — drop-in for
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)`. */
case class DotProductD(left: Expression, right: Expression) extends ArrayPairFoldD {
  override def prettyName: String = "dot_double"
  override protected def termJava(xa: String, xb: String): String = s"$xa * $xb"
  override protected def termScala(xa: Double, xb: Double): Double = xa * xb
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² in double precision, sequential fold order. */
case class SquaredDistanceD(left: Expression, right: Expression) extends ArrayPairFoldD {
  override def prettyName: String = "sqdist_double"
  override protected def termJava(xa: String, xb: String): String =
    s"($xa - $xb) * ($xa - $xb)"
  override protected def termScala(xa: Double, xb: Double): Double = {
    val d = xa - xb; d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SimHash-64 bit-vote packing over an array of 64-bit word hashes:
  * for each bit b, the sign of Σ votes (+1 if bit set, −1 otherwise;
  * null hash votes −1) packed as bit b of one long. Replaces 64
  * interpreted `aggregate` folds per row with one generated loop. */
case class SimHashPack(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash_pack"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (2L * cnt(b) - n > 0) r |= 1L << b; b += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val (n, i, b, h, cnt, r) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("b"), ctx.freshName("h"), ctx.freshName("cnt"),
        ctx.freshName("res"))
      s"""
         |final int $n = $arr.numElements();
         |final int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) $cnt[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) if (2L * $cnt[$b] - $n > 0) $r |= 1L << $b;
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points for the kernels. */
object ArrayKernels {
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(ex(a), ex(b)))

  def sqDistD(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistanceD(ex(a), ex(b)))

  def simhashPack(hashes: Column): Column =
    ColumnBridge.column(SimHashPack(ex(hashes)))
}
