// Re-optimization convergence — the LEO loop ITERATED: plan under
// histograms, execute, harvest, re-plan under feedback, execute the
// new tree, harvest ITS subsets, repeat until the chosen join
// structure stops changing. Each executed tree contributes its own
// n-1 intermediate subsets as exact observations, so the dictionary's
// coverage of the plan space grows per round exactly where the
// planner is exploring. Reported per query: the structure signature
// per round, rounds-to-fixpoint, and each round's TRUE C_out over its
// join intermediates (ExecutionFeedback.observedJoinTotal — the
// metrics ARE the true cardinalities, so the trajectory is an exact
// true-cost series, no counting pass).
//
// Usage: runMain graft.tools.FeedbackLoop [sfDir [maxRounds]]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.plans.{ExecutionFeedback, PlannerQueries}

object FeedbackLoop {

  /** Join structure as per-join sorted leaf-name lists (the
    * GraftJoinReorderSpec multiset signature — repeated tables stay
    * visible). */
  private def signature(plan: LogicalPlan): Vector[List[String]] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def leafName(p: LogicalPlan): Option[String] = p match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map { r =>
            val s = r.toString
            s.substring(s.lastIndexOf('/') + 1).stripSuffix(".parquet")
          }
        case _ => None
      }
      case _ => None
    }
    plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.collectLeaves().flatMap(leafName).sorted.toList
    }.toVector.sortBy(_.mkString(","))
  }

  /** The 11-way JOB-scale snowflake as SQL (p17's query text, aliases
    * spelled as SQL aliases over the base views). */
  private val tree11Sql =
    """SELECT min(o_totalprice) AS min_total,
              min(l_extendedprice) AS min_ext, count(*) AS cnt
       FROM lineitem li
       JOIN orders o    ON li.l_orderkey = o.o_orderkey
       JOIN customer c  ON o.o_custkey = c.c_custkey
       JOIN nation n    ON c.c_nationkey = n.n_nationkey
       JOIN region r    ON n.n_regionkey = r.r_regionkey
       JOIN part p      ON li.l_partkey = p.p_partkey
       JOIN documents d ON p.p_partkey = d.doc_id
       JOIN supplier s  ON li.l_suppkey = s.s_suppkey
       JOIN events e    ON c.c_custkey = e.user_id
       JOIN embeddings em ON d.doc_id = em.vec_id
       JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
       WHERE li.l_quantity > 30 AND o.o_orderstatus = 'F'
         AND e.event_type = 'purchase'"""

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val maxRounds = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)

    def loop(name: String, sql: String): Unit = {
      ExecutionFeedback.clear()
      // round 0: histogram-planned
      spark.conf.set("spark.graft.joinReorder.stats", "hist")
      var df = spark.sql(sql)
      var sig = signature(df.queryExecution.optimizedPlan)
      df.collect()
      ExecutionFeedback.harvest(df)
      var cout = ExecutionFeedback.observedJoinTotal(df)
      println(s"[feedback-loop] $name round=0 stats=hist " +
        f"trueCout=$cout%.0f store=${ExecutionFeedback.size} sig=$sig")
      spark.conf.set("spark.graft.joinReorder.stats", "feedback")
      var round = 1
      var converged = false
      while (round <= maxRounds && !converged) {
        df = spark.sql(sql)
        val s2 = signature(df.queryExecution.optimizedPlan)
        if (s2 == sig) {
          converged = true
          println(s"[feedback-loop] $name round=$round FIXPOINT " +
            s"(structure unchanged)")
        } else {
          sig = s2
          df.collect()
          ExecutionFeedback.harvest(df)
          val c2 = ExecutionFeedback.observedJoinTotal(df)
          println(s"[feedback-loop] $name round=$round stats=feedback " +
            f"trueCout=$c2%.0f (prev $cout%.0f) " +
            f"store=${ExecutionFeedback.size} sig=$sig")
          cout = c2
        }
        round += 1
      }
      spark.conf.unset("spark.graft.joinReorder.stats")
      if (!converged)
        println(s"[feedback-loop] $name NO fixpoint within $maxRounds rounds")
    }

    loop("flagship", PlannerQueries.flagshipSqlText)
    loop("tree11", tree11Sql)
    // tree9_sel's SQL twin — the measured correlation trap (histogram
    // tier max regret 23×): customers in NATION_3 × error events is a
    // near-empty intersection independence cannot see. If hist's tree
    // differs from the feedback-stable one anywhere, it is here.
    loop("tree9_sel",
      """SELECT min(o_totalprice) AS min_total,
                min(l_extendedprice) AS min_ext, count(*) AS cnt
         FROM lineitem li
         JOIN orders o    ON li.l_orderkey = o.o_orderkey
         JOIN customer c  ON o.o_custkey = c.c_custkey
         JOIN nation n    ON c.c_nationkey = n.n_nationkey
         JOIN region r    ON n.n_regionkey = r.r_regionkey
         JOIN part p      ON li.l_partkey = p.p_partkey
         JOIN documents d ON p.p_partkey = d.doc_id
         JOIN supplier s  ON li.l_suppkey = s.s_suppkey
         JOIN events e    ON c.c_custkey = e.user_id
         WHERE o.o_orderstatus = 'F' AND e.event_type = 'error'
           AND n.n_name = 'NATION_3'""")
    spark.stop()
  }
}
