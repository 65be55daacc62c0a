package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass character walks over UTF8String bytes.
  *
  * The operators' original SQL shape —
  * `transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1)))` and
  * `transform(sequence(1, length(s) - n + 1), i -> substring(s, i, n))` —
  * is O(len²) per row: every `substr(s, i, …)` call re-walks the string
  * from byte 0 to find the i-th character boundary, and every element of
  * the lambda is evaluated interpreted. These helpers walk the byte
  * array ONCE per row (char boundaries via the UTF-8 first-byte length
  * table) and emit the same values, so the operators' results — and
  * their DuckDB oracle hashes — are unchanged while the per-row cost
  * drops from quadratic-interpreted to linear-native.
  */
object CharWalk {
  /** Byte start offsets of each character, plus the terminal offset. */
  private def charStarts(bytes: Array[Byte]): Array[Int] = {
    val starts = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      starts(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(n) = bytes.length
    java.util.Arrays.copyOf(starts, n + 1)
  }

  /** Code point of every character — element i equals
    * `ascii(substr(s, i+1, 1))` (Spark's ascii = codePointAt(0) of the
    * first char). ASCII bytes short-circuit; multi-byte chars decode
    * through the same UTF8String slice ascii() reads. */
  def codes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val starts = charStarts(bytes)
    val n = starts.length - 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val b = bytes(starts(i))
      out(i) =
        if (b >= 0) b.toLong
        else UTF8String.fromBytes(bytes, starts(i), starts(i + 1) - starts(i))
          .toString.codePointAt(0).toLong
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** All `n`-char grams — element i equals `substring(s, i+1, n)`;
    * empty when the string has fewer than n chars. Grams are UTF8String
    * slices over one shared byte copy (no per-gram walk). */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = charStarts(bytes)
    val chars = starts.length - 1
    if (chars < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_char_codes(s string)` → array&lt;bigint&gt; of per-character
  * code points; the one-pass equivalent of
  * `transform(sequence(1, length(s)), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))`. */
final case class CharCodes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_codes expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_codes"

  override def nullSafeEval(input: Any): Any =
    CharWalk.codes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharWalk.codes($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCodes =
    copy(child = newChild)
}

/** `graft_char_grams(s string, n literal int)` → array&lt;string&gt; of
  * every n-character substring, 1 per start position; the one-pass
  * equivalent of `transform(sequence(1, length(s) - n + 1),
  * i -> substring(s, i, n))` (empty below n chars). */
final case class CharGrams(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_char_grams expects (string, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_grams"

  override def nullSafeEval(s: Any, n: Any): Any =
    CharWalk.grams(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.functions.CharWalk.grams($s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGrams =
    copy(left = newLeft, right = newRight)
}

/** `graft_dist2(a array<double>, b array<double>)` → squared euclidean
  * distance in one fused codegen loop — the [[CosineSim]] discipline
  * applied to `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)`,
  * which evaluates three interpreted higher-order passes per row.
  * Mismatched lengths truncate to the shorter vector (the CosineSim
  * convention; all graft embeddings are fixed-dimension). */
final case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dist2 expects (array<double>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $x.getDouble($i) - $y.getDouble($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}
