package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native random-hyperplane LSH signatures:
  * `graft_lsh_sigs(v, tables, planes)` returns one `planes`-bit signature
  * per hash table (array<int>, length `tables`), where bit p of table t
  * is the sign of <v, h_tp> and h_tp[d] is a PSEUDO-GAUSSIAN component
  * derived from an avalanche mix of (t, p, d): (popcount(mix) − 32)/4 ~
  * Binomial(64, ½) centered ≈ N(0, 16)/4.
  *
  * Gaussian-shaped components matter: sign-LSH's collision-probability
  * guarantee P[bit match] = 1 − θ/π holds for any rotation-invariant
  * hyperplane distribution. ±1 Rademacher components (the obvious cheap
  * choice) are NOT rotation-invariant — measured on the testdata they
  * made per-pair collisions bimodal (60% of true cosine≥0.3 pairs never
  * collided in ANY table while the rest collided in most), so recall
  * stopped improving with more tables. The popcount form restores the
  * theory at one extra multiply per component.
  *
  * The hyperplane "matrix" never materializes — each component is
  * recomputed in a few ALU ops — and all tables are produced in ONE
  * compiled pass over the vector. Replaces `tables` separate interpreted
  * foldLeft chains of zip_with/aggregate. Deterministic, stateless: the
  * whole index is a pure function of the data, which at 100 TB means no
  * fitted model to store, ship, or version. */
final case class HyperplaneSigs(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {

  require(tables > 0 && tables <= 64 && planes > 0 && planes <= 30,
    s"need 1..64 tables and 1..30 planes, got $tables/$planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sigs expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_sigs"

  override def nullSafeEval(input: Any): Any =
    HyperplaneSigs.compute(input.asInstanceOf[ArrayData], tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HyperplaneSigs.compute($arr, $tables, $planes);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** Pseudo-gaussian hyperplane component for (table, plane, dim):
    * murmur3-style double mix, then (popcount − 32)/4 ≈ N(0, 1). */
  @inline def component(t: Int, p: Int, d: Int): Double = {
    var h = (t.toLong << 40) ^ (p.toLong << 20) ^ d.toLong
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
    (java.lang.Long.bitCount(h) - 32) * 0.25
  }

  /** Shared kernel for eval and codegen. */
  def compute(v: ArrayData, tables: Int, planes: Int): ArrayData = {
    val dims = v.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var d = 0
        while (d < dims) {
          dot += v.getDouble(d) * component(t, p, d)
          d += 1
        }
        sig = sig * 2 + (if (dot > 0.0) 1 else 0)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
