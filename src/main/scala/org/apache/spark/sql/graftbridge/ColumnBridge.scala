package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved the Column ↔ Catalyst
  * conversion behind `private[sql]` (`classic.ExpressionUtils`); this
  * subpackage shim re-exposes exactly the two conversions a library
  * needs to ship custom codegen'd expressions with a Column API
  * (graft.functions.ArrayKernels). No Spark internals are touched
  * beyond the two public-in-bytecode forwarders. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
