package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The plan cache's reuse contract (reference analog:
  * allOptParCosts.ser reload, QueryOptExperiment.java:447-448,503):
  * a warm store returns the stored plan without running the search, a
  * fingerprint mismatch drops the file wholesale, and the join-tree
  * codec is a lossless round trip. */
class PlanCacheSpec extends AnyFunSuite {

  private def tmpFile(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-plan-cache")
    d.resolve("cache.tsv")
  }

  private val tree: JoinTree =
    Node(Node(Leaf(0), Leaf(2)), Node(Leaf(1), Node(Leaf(3), Leaf(4))))

  test("join-tree codec round-trips bushy trees") {
    for (t <- Seq[JoinTree](Leaf(7), Node(Leaf(0), Leaf(1)), tree)) {
      val s = PlanCache.treeToString(t)
      assert(PlanCache.parseTree(s) == t, s"codec broke on $s")
    }
    assertThrows[IllegalArgumentException](PlanCache.parseTree("(0 1) junk"))
  }

  test("a warm store skips the search; a stale fingerprint does not") {
    val path = tmpFile()
    val planned = PlannedOrder("dpccp", tree, 123.5, Vector(1.0, 2.5), 999L)
    val cold = new PlanCache.Store(path, "fp-A")
    var searches = 0
    def search(): PlannedOrder = { searches += 1; planned }
    assert(cold.plan("q", "dpccp", "cout", "true")(search()) == planned)
    assert(searches == 1 && cold.misses == 1)
    // same store, same key: within-run memo
    cold.plan("q", "dpccp", "cout", "true")(search())
    assert(searches == 1 && cold.hits == 1)
    cold.save()

    val warm = new PlanCache.Store(path, "fp-A")
    assert(warm.loadedEntries == 1)
    val got = warm.plan("q", "dpccp", "cout", "true")(search())
    assert(searches == 1, "warm store must not invoke the search")
    // reloaded plan: same tree/cost/per-join costs, planningNanos = 0
    // (the no-search-ran marker)
    assert(got.tree == planned.tree && got.cost == planned.cost &&
      got.perJoinCosts == planned.perJoinCosts && got.planningNanos == 0L)

    val stale = new PlanCache.Store(path, "fp-B")
    assert(stale.loadedEntries == 0, "fingerprint mismatch must drop the file")
    stale.plan("q", "dpccp", "cout", "true")(search())
    assert(searches == 2, "stale store must replan")
  }

  test("the card tag separates estimate plans from truth plans") {
    val path = tmpFile()
    val store = new PlanCache.Store(path, "fp")
    val a = PlannedOrder("greedy", Leaf(0), 1.0, Vector.empty, 1L)
    val b = PlannedOrder("greedy", Leaf(1), 2.0, Vector.empty, 1L)
    store.plan("q", "greedy", "mm", "true")(a)
    val got = store.plan("q", "greedy", "mm", "est")(b)
    assert(got == b && store.misses == 2,
      "est must not hit the true-cardinality entry")
  }
}
