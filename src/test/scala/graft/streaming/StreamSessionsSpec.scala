package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import StreamSessions.{SEvent, SState}

/** Kernel semantics: a late event can bridge two intervals (counts
  * add, type sets union), and shuffled batched replay converges to the
  * same interval set — the arrival-order invariance the q65 gate
  * relies on. Pure kernel tests, no Spark session. */
class StreamSessionsSpec extends AnyFunSuite {

  private val Min = 60L * 1000000L
  private val gapUs = 30L * Min

  test("a bridging event merges two intervals, unioning types") {
    val evs = Seq(
      SEvent(1L, "view", 0L), SEvent(1L, "click", 55L * Min),
      SEvent(1L, "purchase", 28L * Min)) // within gap of BOTH: bridges
    val (state, snap) = StreamSessions.step(1L, evs.iterator, None, gapUs)
    assert(state.intervals.size == 1)
    val iv = state.intervals.head
    assert((iv.start, iv.last, iv.events) == (0L, 55L * Min, 3L))
    assert(iv.types == Seq("click", "purchase", "view"))
    assert(snap.exists(_.seq == 1L))
  }

  test("shuffled batched replay converges to the ordered fold") {
    val evs = (0 until 40).map { i =>
      SEvent(1L, if (i % 2 == 0) "view" else "click",
        i.toLong * 20L * Min) // 20-min spacing: one merged run
    } ++ (0 until 5).map(i =>
      SEvent(1L, "error", 100L * 60L * Min + i * 5L * Min))
    val ordered = StreamSessions.step(1L, evs.iterator, None, gapUs)._1
    Seq(2L, 5L, 9L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      var state: Option[SState] = None
      rnd.shuffle(evs).grouped(7).foreach { g =>
        state = Some(StreamSessions.step(1L, g.iterator, state, gapUs)._1)
      }
      assert(state.get.intervals == ordered.intervals, s"seed $seed")
    }
  }
}
