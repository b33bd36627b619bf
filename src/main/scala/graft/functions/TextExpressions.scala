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

/** Checksum-validated PII redaction — the classes a regex ALONE cannot
  * decide: IBANs carry an ISO 7064 mod-97 check, payment cards a Luhn
  * check digit, and IPv6 needs structural group counting ('::' once,
  * 8 groups uncompressed) that a practical regex over-matches (times,
  * MAC addresses). One codegen'd scan replaces VALID matches with
  * `<IBAN>` / `<CARD>` / `<IP6>` and returns the scrubbed text plus
  * per-class counts as a struct. Checksum-INVALID candidates are left
  * VERBATIM by design: scrubbing a failed-checksum digit run destroys
  * non-PII data (order ids, hashes) for zero privacy gain, and the
  * q151 gate pins both directions — every valid item scrubbed, every
  * one-digit-off twin untouched.
  */
case class RedactExtExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_iban", IntegerType, nullable = false),
    StructField("n_card", IntegerType, nullable = false),
    StructField("n_ip6", IntegerType, nullable = false)))

  override def prettyName: String = "redact_pii_ext"

  override def nullSafeEval(input: Any): Any =
    RedactExtExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RedactExtExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RedactExtExpr =
    copy(child = newChild)
}

object RedactExtExpr {
  // structural candidates; the checksum/structure validators below make
  // the final call. Card allows single space/dash separators between
  // digits (13-19 digits total); the digit lookarounds anchor whole runs
  // so a valid 16 inside a 19-digit run can never be carved out.
  private val IbanRe =
    java.util.regex.Pattern.compile("\\b[A-Z]{2}[0-9]{2}[A-Za-z0-9]{10,30}\\b")
  private val CardRe = java.util.regex.Pattern.compile(
    "(?<![0-9])[0-9](?:[ -]?[0-9]){12,18}(?![0-9])")
  private val Ip6Re = java.util.regex.Pattern.compile(
    "(?<![0-9A-Za-z:.])[0-9A-Fa-f]{0,4}:(?:[0-9A-Fa-f]{0,4}:){1,6}[0-9A-Fa-f]{0,4}(?![0-9A-Za-z:])")

  /** ISO 7064 mod-97-10 over the rearranged IBAN (body ++ head), letters
    * as 10..35, streamed so a 34-char IBAN never needs big integers.
    */
  private[functions] def ibanValid(s: String): Boolean = {
    if (s.length < 14) return false
    var m = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt((i + 4) % n) // rearranged: s[4:] ++ s[:4]
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'Z') c - 'A' + 10
        else if (c >= 'a' && c <= 'z') c - 'a' + 10
        else return false
      m = if (v >= 10) (m * 100 + v) % 97 else (m * 10 + v) % 97
      i += 1
    }
    m == 1L
  }

  private[functions] def luhnValid(digits: String): Boolean = {
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  /** Structural IPv6: at most one '::', every group 1-4 hex chars, and
    * either compressed (total groups <= 7) or exactly 8 groups — which
    * rejects the classic over-matches (clock times have 3 groups and no
    * '::', MAC addresses 6). Compressed forms additionally need >= 2
    * groups and >= 5 total hex chars: a redactor that scrubs bare '::'
    * punctuation (Haskell/C++ scope syntax in prose) or short all-hex
    * scope tokens (`a::b`, `ab::cd`) destroys non-PII text — the same
    * conservative floor the checksum classes apply, at the cost of
    * skipping degenerate short addresses like `::1` or `ab::cd`
    * (loopback is not PII worth destroying text over; `fe80::1` at 5
    * hex chars still redacts).
    */
  private[functions] def ip6Valid(s: String): Boolean = {
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return false
    // (group count, total hex chars); (-1, _) ⇒ structurally invalid
    def groups(part: String): (Int, Int) = {
      if (part.isEmpty) return (0, 0)
      var count = 0
      var hex = 0
      var i = 0
      while (i < part.length) {
        var len = 0
        while (i < part.length && part.charAt(i) != ':') { len += 1; i += 1 }
        if (len < 1 || len > 4) return (-1, 0)
        count += 1
        hex += len
        if (i < part.length) { // consume the ':' — empty group ⇒ invalid
          i += 1
          if (i == part.length) return (-1, 0) // trailing lone ':'
        }
      }
      (count, hex)
    }
    if (dc >= 0) {
      val (l, lh) = groups(s.substring(0, dc))
      val (r, rh) = groups(s.substring(dc + 2))
      l >= 0 && r >= 0 && l + r <= 7 && l + r >= 2 && lh + rh >= 5
    } else {
      groups(s)._1 == 8
    }
  }

  private case class Pass(re: java.util.regex.Pattern, tag: String,
                          valid: String => Boolean)
  private val passes = Seq(
    Pass(IbanRe, "<IBAN>", ibanValid),
    Pass(CardRe, "<CARD>", m => {
      val digits = m.filter(c => c >= '0' && c <= '9')
      digits.length >= 13 && digits.length <= 19 && luhnValid(digits)
    }),
    Pass(Ip6Re, "<IP6>", ip6Valid))

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    var text = s.toString
    val counts = new Array[Int](passes.size)
    var p = 0
    while (p < passes.size) {
      val pass = passes(p)
      val m = pass.re.matcher(text)
      if (m.find()) { // common case: no candidates — zero allocation
        val sb = new java.lang.StringBuilder(text.length)
        var last = 0
        do {
          if (pass.valid(m.group())) {
            sb.append(text, last, m.start()).append(pass.tag)
            last = m.end()
            counts(p) += 1
          }
        } while (m.find())
        sb.append(text, last, text.length)
        text = sb.toString
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(text), counts(0), counts(1), counts(2)))
  }
}
