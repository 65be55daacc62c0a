package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder: `graft_pq_codes(v, cents, m)` splits
  * `v` into `m` equal-length subvectors and, for each subspace, returns
  * the index (into `cents`, 0-based) of the codebook entry whose SAME
  * subspace slice is nearest in L2 distance — array<int> of length m,
  * ties broken by the lower index.
  *
  * This is the PQ encode step (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) as one fused scalar expression:
  * the codebook rides along as a plan literal / broadcast exactly like
  * the IVF coarse quantizer ([[NearestCentroids]]), so encoding a
  * 100 TB corpus is a narrow codegen'd map with zero shuffle — and the
  * encoded table is m small ints per vector instead of the full float
  * vector, the 16-32× compression that makes billion-vector ANN fit in
  * memory. Reference uses one shared sampled codebook whose slices act
  * as the per-subspace codebooks (a fitted per-subspace k-means would
  * slot in identically — same expression, different literal).
  */
final case class PqCodes(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  require(m > 0, s"graft_pq_codes needs m > 0, got $m")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_codes expects (array<double>, array<array<double>>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(v: Any, cents: Any): Any =
    PqCodes.compute(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) =>
      s"${ev.value} = graft.functions.PqCodes.compute($v, $cents, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}

object PqCodes {

  /** Shared eval/codegen kernel. Subspace length is
    * v.numElements() / m (the last subspace absorbs any remainder);
    * distances accumulate left-to-right within the slice — the same
    * op order as the DuckDB oracle's list_sum over the slice, so
    * assignments agree bit-for-bit.
    *
    * Malformed inputs FAIL LOUDLY: m > dim would make the high
    * subspaces empty (every centroid at d2 = 0, code 0 emitted for
    * subspaces that don't exist) and a codebook entry shorter than the
    * vector would win every subspace it truncates out of — both are
    * caller bugs that silent codes would bury. */
  def compute(v: ArrayData, cents: ArrayData, m: Int): ArrayData = {
    val dim = v.numElements()
    val c = cents.numElements()
    if (dim < m) throw new IllegalArgumentException(
      s"graft_pq_codes: vector dim $dim < m = $m subspaces")
    val sub = dim / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val from = s * sub
      val until = if (s == m - 1) dim else from + sub
      var best = 0.0
      var bestIdx = -1
      var ci = 0
      while (ci < c) {
        val cent = cents.getArray(ci)
        if (cent.numElements() < until) throw new IllegalArgumentException(
          s"graft_pq_codes: codebook entry $ci has ${cent.numElements()} " +
            s"dims, need >= $until for subspace $s")
        var d2 = 0.0
        var j = from
        while (j < until) {
          val diff = v.getDouble(j) - cent.getDouble(j)
          d2 += diff * diff
          j += 1
        }
        // strict < keeps the earlier (lower) index on ties
        if (bestIdx < 0 || d2 < best) { best = d2; bestIdx = ci }
        ci += 1
      }
      codes(s) = bestIdx
      s += 1
    }
    new GenericArrayData(codes)
  }
}
