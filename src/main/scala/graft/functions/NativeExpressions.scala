package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.stats.Distributions

/** Native Catalyst expressions for the distribution p-values — the one
  * place the engine's surface genuinely exceeds Spark's built-ins
  * (SURVEY §7.2: "custom Expression (codegen'd CDFs)").
  *
  * Unlike the UDF route, these participate in WholeStageCodegen: the
  * generated Java calls [[Distributions]]' static forwarders directly —
  * no boxing, no ClosureCleaner, usable in per-row hot paths (e.g.
  * million-group t-tests) and from SQL text once registered
  * ([[GraftFunctions.register]] or the [[GraftExtensions]]
  * spark.sql.extensions entry point).
  */
abstract class DistributionExpr extends BinaryExpression with ImplicitCastInputTypes {
  // (return type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  /** Fully-qualified static Java call template; `$t`/`$df` slots. */
  protected def javaCall(t: String, df: String): String
  protected def scalaCall(t: Double, df: Double): Double
  override def nullSafeEval(t: Any, df: Any): Any =
    scalaCall(t.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, df) => javaCall(t, df))
}

/** Two-sided Student-t p-value: t_pvalue(t_stat, df). */
case class TTestPValue(left: Expression, right: Expression) extends DistributionExpr {
  override def prettyName: String = "t_pvalue"
  override protected def javaCall(t: String, df: String): String =
    s"graft.stats.Distributions.tTwoSidedP(java.lang.Math.abs($t), $df)"
  override protected def scalaCall(t: Double, df: Double): Double =
    Distributions.tTwoSidedP(math.abs(t), df)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Chi-square upper-tail p-value: chi2_pvalue(stat, df). */
case class Chi2PValue(left: Expression, right: Expression) extends DistributionExpr {
  override def prettyName: String = "chi2_pvalue"
  override protected def javaCall(x: String, df: String): String =
    s"graft.stats.Distributions.chi2P($x, $df)"
  override protected def scalaCall(x: Double, df: Double): Double =
    Distributions.chi2P(x, df)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** F-distribution upper-tail p-value: f_pvalue(f, df1*1, df2) — binary
  * form with packed dfs is awkward, so df1 rides in the constructor. */
case class FPValue(left: Expression, right: Expression, df1: Double) extends DistributionExpr {
  override def prettyName: String = "f_pvalue"
  override protected def javaCall(f: String, df2: String): String =
    s"graft.stats.Distributions.fP($f, $df1, $df2)"
  override protected def scalaCall(f: Double, df2: Double): Double =
    Distributions.fP(f, df1, df2)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Session-level registration (works on any existing SparkSession). */
object GraftFunctions {
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "t_pvalue" -> { args => TTestPValue(args(0), args(1)) },
    "chi2_pvalue" -> { args => Chi2PValue(args(0), args(1)) },
    "dot_double" -> { args => DotProductD(args(0), args(1)) },
    "sqdist_double" -> { args => SquaredDistanceD(args(0), args(1)) },
    "simhash_pack" -> { args => SimHashPack(args(0)) })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** `spark.sql.extensions` entry point: every session built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * gets the functions without any imperative registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("t_pvalue"),
      new ExpressionInfo(classOf[TTestPValue].getName, "t_pvalue"),
      (args: Seq[Expression]) => TTestPValue(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("chi2_pvalue"),
      new ExpressionInfo(classOf[Chi2PValue].getName, "chi2_pvalue"),
      (args: Seq[Expression]) => Chi2PValue(args(0), args(1))))
  }
}
