package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thin Catalyst wrappers over [[TextKernels]]: each `doGenCode` emits a
  * single static call, so the kernels run inside whole-stage codegen with
  * no regex, no boxing and no UDF serialization — level (b) of SURVEY §7's
  * extension-preference order, same as [[VectorDot]]/[[Hash60]].
  */
private[functions] trait TextKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.simpleString}")
  }
}

/** [[TextKernels.normalize]] as an expression. */
case class AsciiNormalize(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_normalize"
  override def nullSafeEval(s: Any): Any =
    TextKernels.normalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normalize($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextKernels.tokenCount]] as an expression. */
case class TokenCount(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_count"
  override def nullSafeEval(s: Any): Any =
    TextKernels.tokenCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextKernels.punctCount]] as an expression. */
case class PunctCount(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "punct_count"
  override def nullSafeEval(s: Any): Any =
    TextKernels.punctCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.punctCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `\b(w1|w2|…)\b` occurrence count for all-word-char alternatives; the
  * word list is fixed at plan time and rides codegen as a reference
  * object (no per-row parsing). */
case class WordSetCount(child: Expression, words: Seq[String])
    extends TextKernelExpr {
  require(words.nonEmpty && words.forall(_.matches("[a-zA-Z0-9_]+")),
    s"word list must be non-empty all-word-char literals, got $words")

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "word_set_count"
  override def nullSafeEval(s: Any): Any =
    TextKernels.wordSetCount(s.asInstanceOf[UTF8String], wordBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.wordSetCount($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextKernels.subwordCount]] as an expression. */
case class SubwordCount(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"
  override def nullSafeEval(s: Any): Any =
    TextKernels.subwordCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.subwordCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextKernels.tokens]] as an expression. */
case class Tokens(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"
  override def nullSafeEval(s: Any): Any =
    TextKernels.tokens(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokens($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextExpressions {
  def ascii_normalize(c: Column): Column = Bridge.column(AsciiNormalize(Bridge.expr(c)))
  def token_count(c: Column): Column = Bridge.column(TokenCount(Bridge.expr(c)))
  def punct_count(c: Column): Column = Bridge.column(PunctCount(Bridge.expr(c)))
  def word_set_count(c: Column, words: Seq[String]): Column =
    Bridge.column(WordSetCount(Bridge.expr(c), words))
  def tokens_fast(c: Column): Column = Bridge.column(Tokens(Bridge.expr(c)))
  def subword_count(c: Column): Column = Bridge.column(SubwordCount(Bridge.expr(c)))
}
