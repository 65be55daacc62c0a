package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The interval-merge session state must (a) equal sort-based gap
  * sessionization regardless of arrival order, and (b) stay bounded by
  * the number of gap-separated sessions — NOT the event count — so a
  * whale user emitting 10⁵ events in one micro-batch holds O(sessions)
  * state instead of materializing the batch. */
class SessionizeSpec extends AnyFunSuite {

  private val gap = 100L

  private def foldArrivalOrder(ts: Seq[Long]): List[EventStream.Interval] =
    ts.foldLeft(List.empty[EventStream.Interval])(
      (iv, t) => EventStream.addEvent(iv, t, gap))

  /** reference: sort, then linear gap-split */
  private def sortBased(ts: Seq[Long]): List[(Long, Long, Int)] = {
    val s = ts.sorted
    val out = List.newBuilder[(Long, Long, Int)]
    var cur: Option[(Long, Long, Int)] = None
    s.foreach { t =>
      cur = cur match {
        case None => Some((t, t, 1))
        case Some((a, b, n)) if t - b > gap =>
          out += ((a, b, n)); Some((t, t, 1))
        case Some((a, b, n)) => Some((a, math.max(b, t), n + 1))
      }
    }
    cur.foreach(out += _)
    out.result()
  }

  test("interval merge equals sort-based sessionization in any arrival order") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 50) {
      // clustered timestamps: sessions of 1-20 events separated by > gap
      var t = 0L
      val ts = (0 until rnd.nextInt(8) + 1).flatMap { _ =>
        t += gap + 1 + rnd.nextInt(1000)
        (0 until rnd.nextInt(20) + 1).map { _ =>
          t += rnd.nextInt(gap.toInt); t
        }
      }
      val shuffled = rnd.shuffle(ts)
      val merged = foldArrivalOrder(shuffled)
        .map(i => (i.start, i.last, i.events)).sortBy(_._1)
      assert(merged == sortBased(ts), s"trial $trial order-dependence")
    }
  }

  test("whale user: 100k events in one batch hold O(sessions) state") {
    val rnd = new scala.util.Random(23)
    // two dense bursts separated by > gap — 100k events, 2 sessions
    val burst1 = Seq.fill(50000)(rnd.nextLong(5000L))
    val burst2 = Seq.fill(50000)(100000L + rnd.nextLong(5000L))
    val ivs = foldArrivalOrder(rnd.shuffle(burst1 ++ burst2))
    assert(ivs.size == 2, s"expected 2 intervals, got ${ivs.size}")
    assert(ivs.map(_.events).sum == 100000)
  }
}
