package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native random-hyperplane LSH signatures:
  * `graft_lsh_sigs(v, tables, planes)` returns one `planes`-bit signature
  * per hash table (array<int>, length `tables`), where bit p of table t
  * is the sign of <v, h_tp> and h_tp[d] = ±1 derived from an avalanche
  * mix of (t, p, d).
  *
  * The hyperplane "matrix" never materializes — each ±1 is recomputed in
  * two multiplies — and all tables are produced in ONE compiled pass over
  * the vector. Replaces `tables` separate interpreted foldLeft chains of
  * zip_with/aggregate. Deterministic, stateless: the whole index is a
  * pure function of the data, which at 100 TB means no fitted model to
  * store, ship, or version. */
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
  /** ±1 hyperplane component for (table, plane, dim), derived by an
    * avalanche mix so signatures are a pure function of the data. */
  @inline def sign(t: Int, p: Int, d: Int): Double = {
    var h = (t.toLong << 40) ^ (p.toLong << 20) ^ d.toLong
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    if ((h & 1L) == 1L) 1.0 else -1.0
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
          dot += v.getDouble(d) * sign(t, p, d)
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
