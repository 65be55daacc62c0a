package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap ordered weakest-first by
  * (score asc, payload desc), so the head is always the entry the next
  * stronger candidate evicts. Total order: (score desc, payload asc) —
  * equal scores break toward the SMALLER payload id, which makes the
  * kept set (and therefore the gate hash) deterministic whenever the
  * payload is unique, regardless of row arrival order. */
private[functions] final class TopKState(
    val k: Int, val distinctPayload: Boolean = false) {
  import java.util.PriorityQueue
  private val weakestFirst = new java.util.Comparator[Array[Long]] {
    // entries stored as (scoreBits, payload); compare on the double value
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val sa = java.lang.Double.longBitsToDouble(a(0))
      val sb = java.lang.Double.longBitsToDouble(b(0))
      val c = java.lang.Double.compare(sa, sb)
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }
  }
  val heap = new PriorityQueue[Array[Long]](math.max(k, 1), weakestFirst)

  def offer(score: Double, payload: Long): Unit = {
    if (distinctPayload) {
      // keep at most one entry per payload (the best-scored one): the
      // k-truncated top-k over the max-per-payload semilattice stays
      // associative/commutative, so partial merges can't change it
      val it = heap.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e(1) == payload) {
          if (java.lang.Double.longBitsToDouble(e(0)) >= score) return
          it.remove()
        }
      }
    }
    if (heap.size < k) {
      heap.add(Array(java.lang.Double.doubleToLongBits(score), payload))
    } else {
      val w = heap.peek()
      val ws = java.lang.Double.longBitsToDouble(w(0))
      if (score > ws || (score == ws && payload < w(1))) {
        heap.poll()
        heap.add(Array(java.lang.Double.doubleToLongBits(score), payload))
      }
    }
  }

  def mergeFrom(other: TopKState): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(java.lang.Double.longBitsToDouble(e(0)), e(1))
    }
  }
}

/** `graft_topk(score double, payload bigint, k literal int)` — per-group
  * top-k as a NATIVE bounded aggregate: array&lt;struct&lt;score,
  * payload&gt;&gt; of the k strongest rows by (score desc, payload asc).
  *
  * The scale point vs the window form (`row_number() OVER (PARTITION BY g
  * ORDER BY score DESC) <= k`, q13/q95): the window must shuffle and SORT
  * every row of every group; this aggregate carries O(k) state per group,
  * partial-aggregates map-side (each map task contributes at most k rows
  * per group to the shuffle), and never sorts more than k entries per
  * buffer. At 100 TB with millions of rows per group that is the
  * difference between shuffling the table and shuffling k·|groups| rows.
  * Top-k-of-union is associative and commutative (it's the k-truncated
  * max-semilattice under the total order), so partial merges and
  * micro-batch arrival order can't change the result — the streaming
  * twin (q110) must reproduce the batch answer exactly.
  *
  * Merge discipline follows [[CmsMerge]]; null scores/payloads are
  * skipped (SQL aggregate convention). */
final case class TopKAgg(
    scoreExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    distinctPayload: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState]
  with BinaryLike[Expression] {

  override def left: Expression = scoreExpr
  override def right: Expression = payloadExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, payloadExpr.dataType) match {
      case _ if k <= 0 => TypeCheckResult.TypeCheckFailure(
        s"graft_topk k must be positive, got $k")
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, p) => TypeCheckResult.TypeCheckFailure(
        "graft_topk expects (score double, payload bigint), got " +
          s"(${s.simpleString}, ${p.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (distinctPayload) "graft_topk_distinct" else "graft_topk"

  override def createAggregationBuffer(): TopKState =
    new TopKState(k, distinctPayload)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null)
      buffer.offer(s.asInstanceOf[Double], p.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    val entries = new Array[Array[Long]](buffer.heap.size)
    val it = buffer.heap.iterator()
    var i = 0
    while (it.hasNext) { entries(i) = it.next(); i += 1 }
    // strongest first: score desc, payload asc
    val sorted = entries.sortWith { (a, b) =>
      val sa = java.lang.Double.longBitsToDouble(a(0))
      val sb = java.lang.Double.longBitsToDouble(b(0))
      if (sa != sb) sa > sb else a(1) < b(1)
    }
    new GenericArrayData(sorted.map { e =>
      InternalRow(java.lang.Double.longBitsToDouble(e(0)), e(1))
    })
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.heap.size)
    bb.putInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e(0)); bb.putLong(e(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new TopKState(k, distinctPayload)
    var i = 0
    while (i < n) {
      st.offer(java.lang.Double.longBitsToDouble(bb.getLong), bb.getLong)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(scoreExpr = newLeft, payloadExpr = newRight)
}
