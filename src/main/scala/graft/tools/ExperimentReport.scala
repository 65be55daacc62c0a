// Summary analysis over ExperimentMain's JSON output — the engine
// analog of the reference's analyze_runtimes.py (reads
// allQueryRuntimes.json, aggregates per planner). Prints per
// (planner, costModel): mean/max est-vs-true regret and mean
// planning/run times, plus the per-query winner table.
//
// Usage: runMain graft.tools.ExperimentReport [experimentJson]
package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

object ExperimentReport {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/experiment.json")
    val root = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

    // refusal rows (BnB past its edge bound) carry null costs — they
    // are recorded for visibility, excluded from aggregation
    val records = root.get("records").elements().asScala.toVector
      .filterNot(_.get("cost").isNull)
    val regrets = root.get("regrets").elements().asScala.toVector
      .filterNot(r => r.get("regret").isNull || r.get("estPlanCost").isNull)

    println("== per (planner, costModel): regret + times ==")
    regrets.groupBy(r =>
        (r.get("planner").asText(), r.get("costModel").asText()))
      .toSeq.sortBy(_._1)
      .foreach { case ((p, cm), rs) =>
        val vals = rs.map(_.get("regret").asDouble())
        val recs = records.filter(r => r.get("planner").asText() == p &&
          r.get("costModel").asText() == cm)
        val planMs = recs.map(_.get("planningMs").asDouble())
        val runMs = recs.flatMap(
          _.get("runtimesMs").elements().asScala.map(_.asDouble()))
        val meanRun =
          if (runMs.isEmpty) "     -" else f"${runMs.sum / runMs.size}%6.1f"
        println(f"$p%-18s $cm%-5s meanRegret=${vals.sum / vals.size}%7.3f " +
          f"maxRegret=${vals.max}%7.3f meanPlanMs=${planMs.sum / planMs.size}%8.2f " +
          f"meanRunMs=$meanRun")
      }

    println("\n== per (query, costModel): cheapest-plan winners (true cards) ==")
    records.groupBy(r =>
        (r.get("query").asText(), r.get("costModel").asText()))
      .toSeq.sortBy(_._1)
      .foreach { case ((q, cm), rs) =>
        val best = rs.minBy(_.get("cost").asDouble())
        val winners = rs.filter(
          _.get("cost").asDouble() == best.get("cost").asDouble())
          .map(_.get("planner").asText()).sorted
        println(f"$q%-10s $cm%-5s cost=${best.get("cost").asDouble()}%14.1f  " +
          s"winners=${winners.mkString(",")}")
      }
  }
}
