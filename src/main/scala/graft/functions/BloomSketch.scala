package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_agg(key string)` — build a Bloom filter over the
  * aggregated keys, emitted as the sketch's serialized bytes. Spark
  * ships [[BloomFilter]] as a public sketch (and uses it internally
  * for runtime row-level join filters), but registers no SQL surface
  * for it — `bloom_filter_agg` / `might_contain` exist only on the
  * internal registry path. This is the public pair: build here, probe
  * with [[BloomContains]].
  *
  * The serving shape it exists for (c12): an exact join whose SMALL
  * side has outgrown the broadcast-hash-join budget still fits as a
  * bloom — ~1.2 MB per million keys at 1% FP — so the BIG side is
  * prefiltered row-locally to (true matches + fpp of the rest) before
  * any shuffle, and the exact join only ever sees candidates. False
  * positives are harmless (the exact join drops them); false
  * negatives are impossible (Bloom's contract), so the composed
  * result is hash-identical to the unfiltered join.
  *
  * TypedImperativeAggregate over the in-heap [[BloomFilter]]: partial
  * aggregation applies — each task folds its rows into a local
  * filter and ONE sketch per partition crosses the shuffle,
  * merged bitwise-OR on the reduce side (`mergeInPlace`; same
  * expectedItems/fpp ⇒ same bit width and hash count, so the merge
  * is exact). Keys are added as UTF-8 bytes; [[BloomContains]] probes
  * the same way. Sizing literals are part of the aggregate, so the
  * empty buffer CAN be allocated eagerly (unlike [[CmsMerge]], whose
  * dimensions arrive with the data); empty input yields an
  * all-zeros filter that contains nothing. */
final case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  require(expectedItems > 0, s"graft_bloom_agg expectedItems=$expectedItems must be > 0")
  require(fpp > 0.0 && fpp < 1.0, s"graft_bloom_agg fpp=$fpp must be in (0, 1)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg expects a string key column, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    buffer.writeTo(os)
    os.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `graft_bloom_contains(sketch binary, key string)` — probe a
  * serialized [[BloomFilter]]. `false` is definitive (the key was
  * never added); `true` is "candidate" (wrong with probability ≤ the
  * builder's fpp). Row-local and codegen'd, so the prefilter runs
  * inside the scan's WholeStageCodegen span — the 100 TB side never
  * leaves its input partition to be filtered. Deserialization goes
  * through a per-thread bounded LRU cleared at task completion
  * ([[SketchMemo]], shared with [[CmsQuery]]): one broadcast sketch
  * repeats across every row of a task, so the MB-scale decode happens
  * once per task, not once per row — and alternating-sketch shapes
  * (the per-file manifest walk in BloomSkip) don't thrash it. */
final case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(sketch: Any, key: Any): Any =
    BloomContains.contains(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, k) =>
      s"${ev.value} = graft.functions.BloomContains.contains($sk, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  // bounded per-thread LRU, cleared at task completion ([[SketchMemo]])
  private val memo = new SketchMemo[BloomFilter](
    b => BloomFilter.readFrom(new ByteArrayInputStream(b)))

  def contains(bytes: Array[Byte], key: UTF8String): Boolean =
    memo.get(bytes).mightContainBinary(key.getBytes)
}
