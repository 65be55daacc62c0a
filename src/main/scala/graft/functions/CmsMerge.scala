package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_merge(sketch binary)` — aggregate PRE-BUILT count-min
  * sketches into one, element-wise (CMS merge is EXACT: same
  * depth/width/seed ⇒ the merged sketch is bit-identical to the
  * sketch of the concatenated inputs). This is the incremental-
  * maintenance half Spark lacks: `count_min_sketch` builds from raw
  * values only, so refreshing a corpus sketch would re-scan the
  * corpus; with this, per-batch sketches are ingest artifacts and the
  * nightly refresh merges O(batches · 100 KB) of sketch bytes instead
  * — the d12i/q77 discipline applied to the sketch surface (t15).
  *
  * A TypedImperativeAggregate over the deserialized
  * [[CountMinSketch]]: partial aggregation applies (executor-local
  * merges, one sketch per partition crosses the shuffle). The empty
  * buffer is `null` — sketch dimensions live in the inputs, so
  * nothing can be allocated before the first one arrives; empty input
  * yields SQL NULL. Mixed-dimension inputs fail loudly (the sketches
  * were built with different ε/δ/seed and CANNOT be merged — silently
  * returning one of them would estimate from a fraction of the
  * corpus). */
final case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_merge expects a binary sketch column, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_merge"

  override def createAggregationBuffer(): CountMinSketch = null

  private def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private def mergeSketch(
      buf: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (buf == null) other
    else {
      try buf.mergeInPlace(other)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          "graft_cms_merge: incompatible sketches (different eps/" +
            "confidence/seed) cannot be merged", e)
      }
      buf
    }

  override def update(
      buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeSketch(buffer, read(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(
      buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (other == null) buffer else mergeSketch(buffer, other)

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val os = new ByteArrayOutputStream()
      buffer.writeTo(os)
      os.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
}
