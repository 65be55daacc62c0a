package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PORTABLE-family LSH signatures —
  * `graft_portable_sigs(v, tables, planes)`: the s05 hyperplane
  * family (integer coefficient grid
  * `((t·131 + p·37 + d·17) % 19) − 9`, chosen because DuckDB can
  * compute it exactly) evaluated as ONE compiled pass instead of
  * `tables × planes` interpreted `aggregate()` higher-order folds.
  * Bit-for-bit identical to the SQL form s05's oracle mirrors: the
  * dot product accumulates left-to-right in dimension order (float
  * sums are order-sensitive — the s03 bit-parity discipline), the
  * sign test is `>= 0`, and bit p contributes `1 << p`.
  *
  * Round-12 motivation: the interpreted fold made the s05/s25 bench
  * entries ~9 s at sf0.1 where the data volume justifies ~0.5 s —
  * 32 lambda folds × 64 dims per row, each element through a boxed
  * interpreter step. PortableSigsSpec pins native ≡ SQL on the real
  * table, so the oracle contract is unchanged. */
final case class PortableSigs(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {

  require(tables > 0 && tables <= 64 && planes > 0 && planes <= 30,
    s"need 1..64 tables and 1..30 planes, got $tables/$planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_portable_sigs expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_portable_sigs"

  override def nullSafeEval(input: Any): Any =
    PortableSigs.compute(input.asInstanceOf[ArrayData], tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PortableSigs.compute($arr, $tables, $planes);")

  override protected def withNewChildInternal(newChild: Expression): PortableSigs =
    copy(child = newChild)
}

object PortableSigs {
  /** The s05 coefficient grid — kept textually in sync with
    * SimilarityOps.coefSql (PortableSigsSpec proves value equality on
    * the real table, which covers the formula). All terms positive,
    * so Scala's `%` equals SQL's. */
  @inline def coef(t: Int, p: Int, d: Int): Double =
    ((t * 131 + p * 37 + d * 17) % 19 - 9).toDouble

  /** Shared kernel for eval and codegen — left-to-right accumulation
    * in dimension order, `>= 0` sign, `1 << p` packing: the exact
    * arithmetic of the SQL fold it replaces. */
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
          dot += v.getDouble(d) * coef(t, p, d)
          d += 1
        }
        if (dot >= 0.0) sig |= 1 << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
