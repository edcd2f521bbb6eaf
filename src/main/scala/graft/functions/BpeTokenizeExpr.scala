package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.{Bpe, BpeKernel, BpeVocab}

/** Whole-vocabulary BPE tokenization as ONE codegen'd expression node:
  * `symbolize(text)` + every learned merge applied, byte-identical to
  * the [[graft.llm.Bpe.applyMerges]] replace chain (the executable
  * spec this expression is pinned against — BpeSpec + the tx11
  * oracle) but with plan size and per-row cost independent of the
  * merge count. The compiled vocabulary rides into generated code as
  * a reference object; the kernel itself is plain JVM
  * ([[graft.llm.BpeKernel]]), so the expression stays inside
  * whole-stage codegen like any other scalar. */
case class BpeTokenize(child: Expression, vocab: BpeVocab) extends UnaryExpression {
  override def prettyName: String = "bpe_tokenize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string text column, got ${t.catalogString}")
  }

  override def nullSafeEval(text: Any): Any =
    BpeKernel.tokenize(text.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.llm.BpeKernel.tokenize($t, $vocabRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeTokenize {
  /** Column entry point: tokenized symbol string of `text` (which must
    * already be [[Bpe.stripSep]]-sanitized, like the chain's input). */
  def tokenize(text: Column, merges: Seq[Bpe.Merge]): Column =
    ColumnBridge.column(BpeTokenize(ColumnBridge.expression(text), new BpeVocab(merges)))
}
