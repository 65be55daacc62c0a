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

    // reference Query.verifyResults hashes each planner's result rather
    // than just counting (Query.java:71-80): order-insensitive content
    // hash = bit_xor of per-row xxhash64 over every key column (xor, not
    // sum: ANSI mode makes a long sum of hashes overflow-fatal)
    val planners = Enumerators.all ++ Seq(QPolicy.RolloutPlanner, QPolicy.Planner)
    val results = planners.map { p =>
      val planned = p.plan(g, card, CostModel.Cout)
      val df = JoinTreeExecutor.build(planned.tree, g, inputs, card)
      val t0 = System.nanoTime()
      val row = df.selectExpr(
        "count(*) AS cnt",
        "bit_xor(xxhash64(r_regionkey, n_nationkey, c_custkey, o_orderkey, l_linenumber)) AS h")
        .collect().head
      val (cnt, hash) = (row.getLong(0), row.getLong(1))
      val execMs = (System.nanoTime() - t0) / 1e6
      println(f"${p.name}%-10s cost=${planned.cost}%12.1f rows=$cnt%8d " +
        f"plan=${planned.planningNanos / 1e6}%7.1fms exec=$execMs%7.1fms  " +
        planned.joinStr(g))
      (p.name, cnt, hash)
    }
    require(results.map(_._2).distinct.size == 1 &&
        results.map(_._3).distinct.size == 1,
      s"cross-planner result mismatch: $results")
    println(s"CROSS-PLANNER OK: all ${results.size} planners returned " +
      s"${results.head._2} rows, content hash ${results.head._3}")
    spark.stop()
  }
}
