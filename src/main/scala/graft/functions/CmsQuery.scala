package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_query(sketch binary, key string)` — point-estimate a key
  * against a serialized count-min sketch (the binary Spark's builtin
  * `count_min_sketch` aggregate emits). This is the HALF Spark lacks:
  * it can build and merge CMS sketches with a codegen'd
  * TypedImperativeAggregate, but offers no expression to read one back
  * inside a query — forcing the estimate to the driver. With this, the
  * classic two-pass heavy-hitter plan (sketch pass → exact rescoring
  * of sketch-flagged candidates) stays entirely distributed: the
  * one-row sketch frame broadcast-joins the candidate set and each
  * estimate is a row-local lookup (t14).
  *
  * The key is hashed exactly as the builder hashed it (UTF-8 bytes —
  * CountMinSketchAgg adds strings via `addBinary(getBytes)`), so
  * estimates carry the CMS contract vs the true counts: never under,
  * over by ≤ ε·N with the sketch's confidence (HeavyHittersSpec /
  * CmsServeSpec). Deserialization goes through a per-thread bounded
  * LRU cleared at task completion ([[SketchMemo]]): the serving shape
  * repeats ONE sketch across every candidate row, so the 100 KB
  * decode happens once per task, not once per row. */
final case class CmsQuery(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_query expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_query"

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsQuery.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, k) =>
      s"${ev.value} = graft.functions.CmsQuery.estimate($sk, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

object CmsQuery {
  // bounded per-thread LRU, cleared at task completion ([[SketchMemo]])
  private val memo = new SketchMemo[CountMinSketch](
    b => CountMinSketch.readFrom(new ByteArrayInputStream(b)))

  def estimate(bytes: Array[Byte], key: UTF8String): Long =
    memo.get(bytes).estimateCount(key.getBytes)
}
