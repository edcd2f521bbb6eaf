package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, when}

/** A fitted linear model unrolled to its scoring arithmetic:
  * `intercept + Σ coef·feature`, with one-hot categorical terms written
  * out as explicit `column = 'value'` indicators.
  *
  * This is the X14 weights-as-literals trick (see
  * `MlQueries.lstmOracleSql`) applied to the OLS family
  * (api/app/main.py:185-199 scoring semantics): [[column]] and [[sql]]
  * render the SAME term list with the SAME operation order, so a Spark
  * query scoring via [[column]] and a DuckDB oracle scoring via [[sql]]
  * produce bit-identical doubles — `Double.toString` literals round-trip
  * exactly through DuckDB's parser, and +,× over identical inputs are
  * IEEE-deterministic. That turns "score a *fitted* model" into a
  * hash-checkable operator even though the fit itself is not
  * SQL-expressible.
  *
  * Scale posture: the rendered expression is pure codegen'd column
  * arithmetic over the feature columns — a map-side kernel, no shuffle,
  * no UDF, exactly the shape a 100 TB batch-scoring pass wants.
  */
final case class LinearScore(intercept: Double, terms: Seq[LinearScore.Term]) {
  // a non-finite coefficient (rank-deficient fit) would render as SQL
  // DuckDB rejects ("Infinity"/"NaN" bare tokens) — fail at
  // construction with the offending term, not at oracle-parse time
  require(java.lang.Double.isFinite(intercept),
    s"non-finite intercept: $intercept")
  terms.find(t => !java.lang.Double.isFinite(t.coef)).foreach(t =>
    throw new IllegalArgumentException(
      s"non-finite coefficient in scoring term $t — the fit is " +
        "degenerate (rank-deficient design matrix?)"))

  /** Spark-side scorer: products in feature-vector index order,
    * left-assoc sum, intercept added last (mirrors the BLAS
    * dot-then-intercept order of LinearRegressionModel.predict). */
  def column: Column = {
    val prods = terms.map {
      // explicit cast: a no-op on double features (Catalyst elides it),
      // and it makes boolean flag terms — admissible in GramOls — score
      // as 0/1 instead of failing analysis on double×boolean. Mirrored
      // in [[sql]] so the engines keep computing the identical tree.
      case LinearScore.Num(c, w) => lit(w) * col(c).cast("double")
      case LinearScore.Cat(c, v, w) =>
        lit(w) * when(col(c) === lit(v), 1.0).otherwise(0.0)
    }
    prods.reduceLeft(_ + _) + lit(intercept)
  }

  /** DuckDB-side mirror of [[column]], term for term. Identifiers are
    * double-quoted (ANSI) so feature columns with dots/spaces/keywords
    * render as valid SQL, like the col()-based Spark side already does. */
  def sql: String = {
    def esc(v: String): String = v.replace("'", "''")
    def qid(c: String): String = "\"" + c.replace("\"", "\"\"") + "\""
    val prods = terms.map {
      case LinearScore.Num(c, w) => s"$w*CAST(${qid(c)} AS DOUBLE)"
      case LinearScore.Cat(c, v, w) =>
        s"$w*(CASE WHEN ${qid(c)} = '${esc(v)}' THEN 1.0 ELSE 0.0 END)"
    }
    prods.mkString(" + ") + s" + $intercept"
  }
}

object LinearScore {
  sealed trait Term { def coef: Double }
  /** Plain numeric feature column. */
  final case class Num(column: String, coef: Double) extends Term
  /** One dummy of a one-hot-encoded categorical column. */
  final case class Cat(column: String, value: String, coef: Double) extends Term

  /** Unroll a fitted [[Models.olsFit]] pipeline over `df` into literal
    * terms. `catCols` names the categorical input columns, used to
    * parse RFormula's `col_value` one-hot attribute names (longest
    * matching prefix wins, so overlapping names resolve correctly). */
  def fromFit(m: PipelineModel, df: DataFrame, catCols: Set[String]): LinearScore = {
    val lr = Models.lrStage(m)
    val field = m.transform(df).schema("features")
    val attrs = AttributeGroup.fromStructField(field).attributes.getOrElse(
      throw new IllegalStateException("fitted features column carries no ML attributes"))
    val byLen = catCols.toSeq.sortBy(-_.length)
    val terms = attrs.toSeq
      .map { a =>
        val i = a.index.getOrElse(
          throw new IllegalStateException(s"feature attribute without index: $a"))
        val name = a.name.getOrElse(
          throw new IllegalStateException(s"feature attribute without name at $i"))
        (i, name)
      }
      .sortBy(_._1) // feature-vector index order = the dot product's sum order
      .map { case (i, name) =>
        val w = lr.coefficients(i)
        byLen.find(c => name.startsWith(c + "_")) match {
          case Some(c) => Cat(c, name.drop(c.length + 1), w)
          case None => Num(name, w)
        }
      }
    LinearScore(lr.intercept, terms)
  }
}
