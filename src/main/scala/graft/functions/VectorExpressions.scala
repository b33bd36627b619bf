package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double
  * elements), accumulated in double precision, sequential order —
  * bit-identical to the `aggregate(zip_with(...))` higher-order
  * formulation it replaces, but codegen'd: the generated loop reads
  * primitive values straight out of `ArrayData` with no per-element
  * boxing, lambda dispatch, or intermediate array allocation. This is
  * the hot kernel of every similarity operator (cosine top-k, IVF,
  * near-dup verify), where the interpreted HOF was the measured
  * bottleneck at bench scale.
  *
  * Null elements inside the arrays are treated as 0 contribution is NOT
  * supported — embeddings are dense; inputs with null elements are
  * undefined behavior, matching the HOF version (which would return
  * null-propagated garbage as well).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val lGet = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $lGet * $rGet; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Recursive EWMA fold over a numeric array: seed = a[0], then
  * `acc = acc·(1−α) + α·a[i]` for i = 1…n−1, exactly the sequential
  * IEEE order of the `aggregate(slice(l, 2, n−1), get(l, 0), …)`
  * higher-order formulation it replaces — bit-identical results — but
  * codegen'd: one primitive loop over `ArrayData`, no per-element
  * lambda dispatch (the interpreted-HOF trap that made the lambda the
  * slow path at wide windows). NULL for an empty array (no frame ⇒ no
  * average), matching the `when(size > 0, …)` guard it subsumes.
  *
  * `alpha` must be a foldable double in (0, 1]; arrays are dense
  * (`collect_list` drops nulls upstream) — null elements are undefined
  * behavior, as in [[ArrayDot]].
  */
case class EwmaFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!arrOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${left.dataType.sql}")
    else if (right.dataType != DoubleType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable double alpha, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "ewma_fold"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // empty frame → null, so the binary null-safe fast path can't apply
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, al: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) null
    else {
      val alpha = al.asInstanceOf[Double]
      val om = 1.0 - alpha
      def get(i: Int): Double = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      var acc = get(0)
      var i = 1
      while (i < n) { acc = acc * om + alpha * get(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, al) => {
      val n = ctx.freshName("n")
      val om = ctx.freshName("om")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val get = (idx: String) =>
        if (isFloat) s"(double) $a.getFloat($idx)" else s"$a.getDouble($idx)"
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  final double $om = 1.0 - $al;
         |  double $acc = ${get("0")};
         |  for (int $i = 1; $i < $n; $i++) { $acc = $acc * $om + $al * ${get(s"$i")}; }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EwmaFold =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array of string tokens: bit i of the output is
  * set iff more than half the tokens have bit i set in their 64-bit token
  * hash (the first 8 bytes of `md5(token)`, big-endian — i.e. the value
  * spelled by the first 16 hex chars of the standard md5 digest). MD5 is
  * chosen over xxhash64 deliberately: the hash family is irrelevant to
  * simhash semantics (any well-mixed 64 bits works), but md5 is the one
  * 64-bit-derivable hash both Spark and DuckDB compute identically, which
  * makes the WHOLE simhash pipeline independently recomputable by the
  * SQL oracle (q33's gate) instead of trust-the-spec. One native pass
  * over primitive hashes (thread-local digest, no per-token allocation
  * beyond the digest's own); null tokens are skipped.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(bytes), big-endian — equals the 64-bit value
    * written by the first 16 hex characters of the md5 hex digest, so a
    * SQL engine with only a string `md5()` can reproduce it via
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT` (or two 32-bit halves).
    */
  def tokenHash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
    h
  }

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var m = 0 // non-null token count
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        m += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) > m) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Morton (Z-curve) interleave of two 32-bit keys into one 64-bit sort
  * key: bit i of `left` lands at position 2i, bit i of `right` at 2i+1.
  * Sorting by this key clusters data so Parquet row-group min/max stats
  * prune on BOTH dimensions — the exact mechanism behind multi-column
  * Z-ORDER clustering (the sort-based approximation only skips on the
  * leading column). Codegen'd with the standard bit-spreading magic
  * constants — O(1) per row, no loop.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, int) inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.InterleaveBits.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)

  /** Spread the low 21 bits of `v` to every third bit position. */
  def spread3(v: Int): Long = {
    var x = v.toLong & 0x1FFFFFL
    x = (x | (x << 32)) & 0x1F00000000FFFFL
    x = (x | (x << 16)) & 0x1F0000FF0000FFL
    x = (x | (x << 8)) & 0x100F00F00F00F00FL
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  def interleave3(a: Int, b: Int, c: Int): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)
}

/** Three-column Morton interleave over the low 21 bits of each input —
  * the exact Z-curve key for the reference's three-column Z-ORDER set
  * (`symbol, current_price, market_cap`). Same skipping argument as
  * [[InterleaveBits]], one dimension wider.
  */
case class InterleaveBits3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, int, int) inputs, " +
        s"got ${children.map(_.dataType.sql).mkString(" / ")}")

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder_key3"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    InterleaveBits.interleave3(a.asInstanceOf[Int], b.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.InterleaveBits.interleave3($a, $b, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): InterleaveBits3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Hilbert-curve index of a 2-D cell on the 2¹⁶×2¹⁶ grid — the
  * locality-tighter alternative to [[InterleaveBits]]'s Z-curve for
  * multi-column clustering: CONSECUTIVE Hilbert keys are always
  * grid-adjacent (|Δx|+|Δy| = 1; the Z-curve jumps across quadrant
  * seams), so range-partitioned files get tighter per-file bounding
  * boxes and parquet min/max stats prune harder on both dimensions
  * (the curve Delta Lake OSS adopted alongside Z-order for the same
  * reason). Standard quadrant-rotation walk (Hilbert 1891 via the
  * common iterative xy→d form), 16 iterations — O(1) per row,
  * codegen'd like its Morton sibling.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, int) inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(16, a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex.xy2d(16, $a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Hilbert distance of cell (x, y) on the 2^order grid; inputs are
    * masked to the grid, so any int is safe.
    */
  def xy2d(order: Int, x0: Int, y0: Int): Long = {
    val mask = (1 << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1 << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the walk stays continuous
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → cell) — used by the bijection/adjacency laws. */
  def d2xy(order: Int, d0: Long): (Int, Int) = {
    var rx = 0; var ry = 0
    var x = 0; var y = 0
    var t = d0
    var s = 1
    while (s < (1 << order)) {
      rx = (1 & (t / 2)).toInt
      ry = (1 & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
