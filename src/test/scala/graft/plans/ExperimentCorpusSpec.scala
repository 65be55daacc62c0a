package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Corpus hygiene: round 3 shipped a "star6" whose edge-set was
  * byte-identical to bushy6 (only filters differed), so the claimed
  * topology stress didn't exist. Guard every entry's shape. */
class ExperimentCorpusSpec extends AnyFunSuite {

  /** canonical topology: the set of undirected table-name edges —
    * vertex numbering must not matter. */
  private def topology(cq: ExperimentCorpus.CorpusQuery): Set[Set[String]] =
    cq.graph.edges.map(e =>
      Set(cq.graph.relations(e.a), cq.graph.relations(e.b))).toSet

  test("every corpus entry has a unique topology") {
    val tops = ExperimentCorpus.all.map(cq => cq.name -> topology(cq))
    for {
      (n1, t1) <- tops; (n2, t2) <- tops if n1 < n2
    } assert(t1 != t2, s"$n1 and $n2 share the same edge-set")
  }

  test("every corpus graph is connected with well-formed filters") {
    ExperimentCorpus.all.foreach { cq =>
      assert(cq.graph.connected(cq.graph.full), s"${cq.name} disconnected")
      assert(cq.filters.size == cq.graph.n,
        s"${cq.name}: ${cq.filters.size} filters for ${cq.graph.n} relations")
      assert(cq.graph.edges.forall(_.conds.nonEmpty),
        s"${cq.name}: edge without join conditions")
    }
  }

  test("corpus names are unique") {
    val names = ExperimentCorpus.all.map(_.name)
    assert(names.distinct == names)
  }
}
