package graft.functions

import org.apache.spark.TaskContext

/** Per-thread bounded memo for deserialized sketch objects
  * ([[BloomContains]], [[CmsQuery]]).
  *
  * The serving shape these expressions exist for repeats ONE broadcast
  * sketch across every row of a task, so the MB-scale decode must
  * happen once per task, not once per row. A one-entry ThreadLocal
  * achieves that but has two liabilities the bounded form fixes:
  *
  *  - RETENTION: executor threads are pooled, so a last-sketch entry
  *    outlives its query and pins MB-scale byte arrays indefinitely.
  *    Here the first insert inside a task registers a
  *    TaskCompletionListener (it runs on the task's own thread) that
  *    clears this thread's slots, so nothing survives the task.
  *  - ALTERNATION: shapes that consult several sketches per row batch
  *    (e.g. the per-file manifest walk in BloomSkip) thrash a
  *    one-entry memo — every miss pays an O(bytes) content compare
  *    AND a re-deserialization. A small LRU of `capacity` slots keeps
  *    each live sketch decoded once; lookups scan by reference first
  *    (free), then by content (promotes the hit's key to the new
  *    reference so subsequent rows take the reference path).
  *
  * Driver-side consults (zone-map / bloom manifests, no TaskContext)
  * keep a bounded `capacity` slots on the driver thread — small by
  * construction.
  */
final class SketchMemo[T <: AnyRef](
    decode: Array[Byte] => T, capacity: Int = 4) extends Serializable {

  private final class State {
    var registeredTask: Long = Long.MinValue
    val keys = new Array[Array[Byte]](capacity)
    val vals = new Array[AnyRef](capacity)
    var n = 0
    def clear(): Unit = {
      var i = 0
      while (i < capacity) { keys(i) = null; vals(i) = null; i += 1 }
      n = 0
      registeredTask = Long.MinValue
    }
  }

  @transient private lazy val tl = new ThreadLocal[State] {
    override def initialValue(): State = new State
  }

  def get(bytes: Array[Byte]): T = {
    val st = tl.get()
    var i = 0
    while (i < st.n) { // reference scan — the broadcast fast path
      if (st.keys(i) eq bytes) return promote(st, i, bytes)
      i += 1
    }
    i = 0
    while (i < st.n) { // content scan — unsafe-row buffer copies
      if (java.util.Arrays.equals(st.keys(i), bytes))
        return promote(st, i, bytes)
      i += 1
    }
    val v = decode(bytes)
    if (st.n < capacity) st.n += 1
    shiftDown(st, st.n - 1)
    st.keys(0) = bytes
    st.vals(0) = v
    val tc = TaskContext.get()
    if (tc != null && st.registeredTask != tc.taskAttemptId()) {
      st.registeredTask = tc.taskAttemptId()
      tc.addTaskCompletionListener[Unit](_ => st.clear())
    }
    v
  }

  /** Move slot `i` to the front, rebinding its key to the reference
    * just seen so the next row's lookup hits the `eq` scan. */
  private def promote(st: State, i: Int, bytes: Array[Byte]): T = {
    val v = st.vals(i)
    shiftDown(st, i)
    st.keys(0) = bytes
    st.vals(0) = v
    v.asInstanceOf[T]
  }

  private def shiftDown(st: State, from: Int): Unit = {
    var j = from
    while (j > 0) {
      st.keys(j) = st.keys(j - 1)
      st.vals(j) = st.vals(j - 1)
      j -= 1
    }
  }
}
