package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native fused argmax/top-n over a broadcast centroid set:
  * `graft_nearest_cents(v, cents, n)` returns the indices (into `cents`,
  * 0-based, array<int> of length ≤ n) of the `n` centroids with the
  * highest cosine similarity to `v`, ordered by similarity descending
  * with ties broken by the LOWER index.
  *
  * This is the IVF coarse-quantizer step as a single scalar expression:
  * the centroid matrix rides along as a foldable array<array<double>>
  * literal (collected once at plan time — centroids ARE the model, tiny
  * by construction), so nearest-cell assignment of a 100 TB corpus is a
  * pure narrow map inside whole-stage codegen. The alternative plans both
  * shuffle: cross-join × window-argmax moves n·C rows (reference round-1
  * weakness), and groupBy+max_by still exchanges n rows. This moves zero.
  *
  * Cosine math is term-for-term the [[CosineSim]] kernel so cell
  * assignment agrees bit-for-bit with `graft_cosine`-ranked scoring.
  */
final case class NearestCentroids(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n > 0, s"graft_nearest_cents needs n > 0, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_cents expects (array<double>, array<array<double>>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cents"

  override def nullSafeEval(v: Any, cents: Any): Any =
    NearestCentroids.compute(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) =>
      s"${ev.value} = graft.functions.NearestCentroids.compute($v, $cents, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)
}

object NearestCentroids {

  /** Same double-op order as CosineSim's kernel — assignments must agree
    * bit-for-bit with graft_cosine scoring. */
  @inline private def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  /** Shared kernel for eval and codegen: top-n insertion over the C
    * centroids (n is small — 1 for assignment, nprobe for probing). */
  def compute(v: ArrayData, cents: ArrayData, n: Int): ArrayData = {
    val c = cents.numElements()
    val keep = math.min(n, c)
    val topSim = new Array[Double](keep)
    val topIdx = new Array[Int](keep)
    var filled = 0
    var ci = 0
    while (ci < c) {
      val sim = cosine(v, cents.getArray(ci))
      // strict > keeps the earlier (lower) index on ties
      if (filled < keep || sim > topSim(filled - 1)) {
        var pos = math.min(filled, keep - 1)
        while (pos > 0 && sim > topSim(pos - 1)) {
          topSim(pos) = topSim(pos - 1); topIdx(pos) = topIdx(pos - 1)
          pos -= 1
        }
        topSim(pos) = sim; topIdx(pos) = ci
        if (filled < keep) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIdx, filled))
  }
}

/** [[NearestCentroids]] with the centroid model shipped as a BROADCAST
  * VARIABLE instead of a plan literal. Same kernel, same results.
  *
  * At a real IVF's scale (C ≈ 2^16 centroids × 64 dims ≈ 33 MB) a
  * `typedlit` model would be embedded in the logical plan and the
  * generated code as a constant — serialized with every task and blowing
  * up codegen. A broadcast ships once per executor and the expression
  * carries only the handle; the tiny-C literal path
  * ([[NearestCentroids]]) stays for models small enough not to care
  * (SimilarityOps picks per model size).
  */
final case class NearestCentroidsBroadcast(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    n: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n > 0, s"graft_nearest_cents needs n > 0, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cents expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cents_bc"

  // materialized once per executor JVM on first row (broadcast fetch +
  // ArrayData wrap), then shared by every task in the executor
  @transient private lazy val centsData: ArrayData =
    new GenericArrayData(
      bc.value.map(a => new GenericArrayData(a): Any))

  /** Called from generated code. */
  def centroids: ArrayData = centsData

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.compute(v.asInstanceOf[ArrayData], centsData, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentsBc", this,
      classOf[NearestCentroidsBroadcast].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCentroids.compute($v, $ref.centroids(), $n);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidsBroadcast = copy(child = newChild)
}
