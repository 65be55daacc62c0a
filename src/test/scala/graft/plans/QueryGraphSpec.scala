package graft.plans

import org.scalatest.funsuite.AnyFunSuite

class QueryGraphSpec extends AnyFunSuite {

  private val chain = QueryGraph(Vector("a", "b", "c", "d"),
    Vector(JoinEdge(0, 1), JoinEdge(1, 2), JoinEdge(2, 3)))

  test("neighbors of a vertex set") {
    assert(chain.neighbors(1L) == 2L)          // {a} → {b}
    assert(chain.neighbors(3L) == 4L)          // {a,b} → {c}
    assert(chain.neighbors(6L) == 9L)          // {b,c} → {a,d}
  }

  test("connectivity") {
    assert(chain.connected(chain.full))
    assert(chain.connected(3L))                // {a,b}
    assert(!chain.connected(5L))               // {a,c} not adjacent
    assert(!chain.connected(0L))               // empty set
    assert(chain.connected(1L))                // singleton
  }

  test("crossEdges finds the connecting predicates") {
    assert(chain.crossEdges(3L, 4L).map(_.mask) == Seq(6L)) // b–c edge
    assert(chain.crossEdges(1L, 4L).isEmpty)                // a vs c: none
  }

  test("cardKey is the reference's sorted space-joined format") {
    // reference: MyMetadataQuery.java:107-114
    val g = QueryGraph(Vector("title", "cast_info", "aka_name"),
      Vector(JoinEdge(0, 1), JoinEdge(1, 2)))
    assert(g.cardKey(7L) == "aka_name cast_info title")
    assert(g.cardKey(3L) == "cast_info title")
  }

  test("duplicate-direction edges rejected by construction") {
    assertThrows[IllegalArgumentException](JoinEdge(2, 2))
  }

  test("63-relation cap") {
    val names = Vector.tabulate(64)(i => s"t$i")
    val edges = (1 until 64).map(i => JoinEdge(i - 1, i)).toVector
    assertThrows[IllegalArgumentException](QueryGraph(names, edges))
  }

  test("CardinalityStore falls back and records misses") {
    val g = chain
    val store = new CardinalityStore(g,
      Map("a b" -> 42.0),
      HeuristicCardinality.uniform(g, Array(1, 2, 3, 4).map(_.toDouble)))
    assert(store(3L) == 42.0)
    assert(store(7L) > 0.0)   // miss → heuristic
    assert(store.misses == List("a b c"))
  }

  test("CardinalityStore parses the reference pg.json format") {
    val parsed = CardinalityStore.parseJson(
      """{"10a.sql": {"cast_info title": 123456, "title": 2528312}}""")
    assert(parsed("10a.sql")("cast_info title") == 123456.0)
  }
}
