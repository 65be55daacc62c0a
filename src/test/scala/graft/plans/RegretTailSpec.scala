package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** The predicate-language regret rows, pinned on the COMMITTED tail
  * artifact (fixtures/experiment_tail_r15.json — deterministic data,
  * no rerun):
  *  - tree9_like (p25's measurement): the string-path tiers are
  *    LIKE-blind (1/3 default → regret ~1.2 under DPccp/C_out), the
  *    sample tier prices it (~1.03), naive uniform pays 4.1×, and the
  *    histlike leg (hist + synopsis-priced predicates — the conjSel
  *    twin) recovers the optimum.
  *  - tree9_in (p27's measurement): the same ladder for IN-lists —
  *    naive 6.0×, IN-blind hist 1.56×, synopsis-priced 1.08×, sample
  *    1.0 — the plan-quality cost the in-optimizer IN pricing avoids
  *    at zero per-query sample scans. */
class RegretTailSpec extends AnyFunSuite {

  private def regretOf(tier: String, query: String): Double = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get("fixtures/experiment_tail_r15.json")))
    root.get(tier).elements().asScala
      .filter(r => r.get("query").asText() == query &&
        r.get("planner").asText() == "dpccp" &&
        r.get("costModel").asText() == "cout" &&
        !r.get("regret").isNull)
      .map(_.get("regret").asDouble()).next()
  }

  test("tree9_like: naive >> LIKE-blind hist > LIKE-aware sample") {
    val r = Map(
      "naive" -> regretOf("regrets", "tree9_like"),
      "histest" -> regretOf("regrets_histest", "tree9_like"),
      "samplest" -> regretOf("regrets_samplest", "tree9_like"),
      "autoest" -> regretOf("regrets_auto", "tree9_like"),
      "histlike" -> regretOf("regrets_histlike", "tree9_like"))
    val naive = r("naive")
    assert(naive > 3.0, s"naive regret should pay the 2.7x miss: $naive")
    assert(r("histest") < naive && r("histest") > 1.1,
      s"hist is LIKE-blind but better than uniform: ${r("histest")}")
    assert(r("samplest") < r("histest") && r("samplest") < 1.1,
      s"the sample tier prices LIKE: ${r("samplest")}")
    // the auto trigger does NOT escalate a 2.7x leaf miss (it targets
    // >=10x correlation) — the cheap fix is in-optimizer (p25)
    assert(math.abs(r("autoest") - r("histest")) < 1e-9)
    // ...and that cheap fix, measured: hist + synopsis-priced LIKE
    // (the conjSel twin) plans the TRUE optimum here — regret 1.0,
    // zero per-query sample scans
    assert(r("histlike") <= r("samplest") && r("histlike") < 1.001,
      s"histlike must recover the optimum: ${r("histlike")}")
  }

  test("tree9_in: naive >> IN-blind hist > synopsis-priced IN") {
    val r = Map(
      "naive" -> regretOf("regrets", "tree9_in"),
      "histest" -> regretOf("regrets_histest", "tree9_in"),
      "samplest" -> regretOf("regrets_samplest", "tree9_in"),
      "autoest" -> regretOf("regrets_auto", "tree9_in"),
      "histlike" -> regretOf("regrets_histlike", "tree9_in"))
    val naive = r("naive")
    assert(naive > 3.0, s"naive regret should pay the IN miss: $naive")
    assert(r("histest") < naive && r("histest") > 1.2,
      s"hist is IN-blind (1/3 default) but better than uniform: " +
        s"${r("histest")}")
    // a 3.9x leaf miss is below the auto trigger's 10x correlation
    // bar — routing correctly stays on histograms (the cheap fix is
    // in-optimizer pricing, not per-query sample scans)
    assert(math.abs(r("autoest") - r("histest")) < 1e-9)
    // the synopsis-priced leg (conjSel's harness twin) recovers most
    // of the gap at histogram-tier cost...
    assert(r("histlike") < r("histest") && r("histlike") < 1.1,
      s"synopsis-priced IN must close the gap: ${r("histlike")}")
    // ...and the full sample tier closes it entirely
    assert(r("samplest") <= r("histlike"),
      s"sample tier: ${r("samplest")}")
  }
}
