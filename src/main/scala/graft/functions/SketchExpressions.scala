package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point estimate from a Count-Min sketch, as a codegen'd scalar
  * expression: `CmsEstimate(token, sketchBytes)` returns the sketch's
  * (over-)estimate of `token`'s frequency, for the candidate filter of
  * the two-pass heavy-hitters operator
  * ([[graft.text.TextStats.heavyHitters]]).
  *
  * The sketch travels to executors as the serialized byte payload of
  * the expression itself (`ctx.addReferenceObj` — the same mechanism
  * Spark's `BloomFilterMightContain` uses for its bloom scalar), is
  * deserialized once per executor (`@transient lazy val`), and each
  * probe is a handful of hash lookups — so the estimate runs INSIDE the
  * scan's whole-stage-codegen span, map-side, before any shuffle.
  *
  * Hash contract: probes use `UTF8String.getBytes`, matching what
  * Spark's `count_min_sketch` aggregate feeds `addBinary` for string
  * input — the same item hashes to the same cells in both passes.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  require(sketchBytes != null && sketchBytes.nonEmpty,
    "CmsEstimate requires a non-empty serialized CountMinSketch")

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "cms_estimate"

  def estimate(s: UTF8String): Long = sketch.estimateCount(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    estimate(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
