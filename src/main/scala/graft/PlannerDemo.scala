package graft

import org.apache.spark.sql.SparkSession
import graft.plans._

/** End-to-end driver for the join-order planner stack: build a 5-table
  * JOB-shaped query graph over the testdata, run every enumerator, print
  * each planner's join order + cost, execute each planned tree on Spark,
  * and check all result counts agree (the reference's cross-planner
  * verification, Query.verifyResults — reference: Query.java:71-80).
  *
  * Usage: runMain graft.PlannerDemo [sfDir]
  */
object PlannerDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem (star chain)
    val rels = Vector("region", "nation", "customer", "orders", "lineitem")
    val g = QueryGraph(
      rels,
      Vector(
        JoinEdge(0, 1, Seq("r_regionkey" -> "n_regionkey")),
        JoinEdge(1, 2, Seq("n_nationkey" -> "c_nationkey")),
        JoinEdge(2, 3, Seq("c_custkey" -> "o_custkey")),
        JoinEdge(3, 4, Seq("o_orderkey" -> "l_orderkey"))))

    val dfs = rels.map(n => graft.sources.Tables.load(spark, sfDir, n))
    val base = dfs.map(_.count().toDouble).toArray
    println(s"base cardinalities: ${rels.zip(base).mkString(", ")}")
    val card = HeuristicCardinality.uniform(g, base)
    val inputs = rels.zip(dfs).map { case (n, df) => RelInput(n, df) }

    val counts = Enumerators.all.map { p =>
      val planned = p.plan(g, card, CostModel.Cout)
      val df = JoinTreeExecutor.build(planned.tree, g, inputs, card)
      val t0 = System.nanoTime()
      val cnt = df.count()
      val execMs = (System.nanoTime() - t0) / 1e6
      println(f"${p.name}%-10s cost=${planned.cost}%12.1f rows=$cnt%8d " +
        f"plan=${planned.planningNanos / 1e6}%7.1fms exec=$execMs%7.1fms  " +
        planned.joinStr(g))
      p.name -> cnt
    }
    val distinct = counts.map(_._2).distinct
    require(distinct.size == 1,
      s"cross-planner row-count mismatch: $counts")
    println(s"CROSS-PLANNER OK: all ${counts.size} planners returned ${distinct.head} rows")
    spark.stop()
  }
}
