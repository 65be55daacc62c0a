package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** SketchMemo contract (driver-thread path — the executor path adds
  * only the task-completion clear): decode-once per live sketch,
  * reference and content hits both avoid re-decoding, the LRU keeps
  * alternating sketches decoded, and eviction is capacity-bounded. */
class SketchMemoSpec extends AnyFunSuite {

  private def mkMemo(counter: java.util.concurrent.atomic.AtomicInteger) =
    new SketchMemo[java.lang.Integer](bytes => {
      counter.incrementAndGet()
      Integer.valueOf(bytes(0).toInt)
    }, capacity = 2)

  test("reference hit, content hit, and alternation decode once each") {
    val decodes = new java.util.concurrent.atomic.AtomicInteger(0)
    val memo = mkMemo(decodes)
    val a = Array[Byte](1, 2, 3)
    val b = Array[Byte](9, 8, 7)

    assert(memo.get(a) == 1 && decodes.get() == 1)
    assert(memo.get(a) == 1 && decodes.get() == 1)       // eq path
    assert(memo.get(a.clone()) == 1 && decodes.get() == 1) // content path
    // two sketches alternating per row: both stay decoded (cap = 2)
    assert(memo.get(b) == 9 && decodes.get() == 2)
    for (_ <- 1 to 5) {
      assert(memo.get(a) == 1)
      assert(memo.get(b) == 9)
    }
    assert(decodes.get() == 2)
  }

  test("a third sketch evicts the least-recently-used one only") {
    val decodes = new java.util.concurrent.atomic.AtomicInteger(0)
    val memo = mkMemo(decodes)
    val a = Array[Byte](1); val b = Array[Byte](2); val c = Array[Byte](3)
    memo.get(a); memo.get(b)         // cache = [b, a]
    memo.get(a)                      // cache = [a, b]
    assert(decodes.get() == 2)
    memo.get(c)                      // evicts b -> [c, a]
    assert(decodes.get() == 3)
    memo.get(a)                      // still cached
    assert(decodes.get() == 3)
    memo.get(b)                      // was evicted -> re-decode
    assert(decodes.get() == 4)
  }
}
