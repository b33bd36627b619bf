package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenizer: split on runs of ASCII whitespace
  * (space, \t, \n, u000B, \f, \r — the Java regex `\s` class), leading/
  * trailing runs dropped; an empty or all-whitespace input yields one
  * empty token — byte-for-byte the semantics of the
  * `split(trim(regexp_replace(text, "\s+", " ")), " ")` chain it
  * replaces, without the two regex passes. Tokenization is the inner
  * loop of the whole text stack (dedup, quality, language ID), so this
  * is a single codegen'd scan.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    TokensExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

object TokensExpr {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val out = new ArrayBuffer[Any]
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        out += UTF8String.fromString(str.substring(start, i))
      }
    }
    if (out.isEmpty) out += UTF8String.EMPTY_UTF8
    new GenericArrayData(out.toArray)
  }
}

/** Sliding word n-gram shingles over a token array, space-joined; fewer
  * than n tokens fall back to the single full-token shingle. With
  * `distinct = true` the output is the first-occurrence-ordered shingle
  * SET (what shingle-based dedup consumes) — deduped in the same pass,
  * replacing an interpreted transform/slice/array_join/array_distinct
  * chain that dominated shingle materialization.
  */
case class ShinglesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShinglesExpr.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  private val Sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int, distinct: Boolean): GenericArrayData = {
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    if (m < n) return new GenericArrayData(Array[Any](UTF8String.concatWs(Sep, toks: _*)))
    val out = new ArrayBuffer[Any](m - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var j = 0
    while (j <= m - n) {
      val sh = UTF8String.concatWs(Sep, java.util.Arrays.copyOfRange(toks, j, j + n): _*)
      if (seen == null || seen.add(sh)) out += sh
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
