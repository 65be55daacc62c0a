package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: `graft_minhash(shingles, k)` computes the
  * k-function MinHash of an array<string> in ONE codegen'd pass —
  * hash each shingle once (xxhash64), then derive the k family values as
  * chained long/int hashes, tracking the running minima in a local
  * long[k].
  *
  * This replaces the higher-order-function formulation
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, ...)))`,
  * which Catalyst evaluates interpreted (lambda per element per i) —
  * measured >10x slower at sf0.1. Semantics are identical: the produced
  * values equal `xxhash64(xxhash64(s), i)` for every shingle s, min'd
  * per i (see MinHashSigSpec).
  *
  * At 100 TB this runs inside whole-stage codegen as part of the
  * signature map stage — no shuffle, no boxing, no lambda dispatch.
  */
final case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 1024, s"k must be in 1..1024, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(s), 42L)
        val hs = XXH64.hashLong(h, 42L)
        var i = 0
        while (i < k) {
          val hi = XXH64.hashInt(i, hs)
          if (hi < mins(i)) mins(i) = hi
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ary => {
      val xxh = classOf[XXH64].getName
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val hs = ctx.freshName("hs")
      val hi = ctx.freshName("hi")
      val n = ctx.freshName("n")
      s"""
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $ary.numElements();
        for (int $s = 0; $s < $n; $s++) {
          if (!$ary.isNullAt($s)) {
            long $h = $xxh.hashUTF8String($ary.getUTF8String($s), 42L);
            long $hs = $xxh.hashLong($h, 42L);
            for (int $i = 0; $i < $k; $i++) {
              long $hi = $xxh.hashInt($i, $hs);
              if ($hi < $mins[$i]) $mins[$i] = $hi;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
