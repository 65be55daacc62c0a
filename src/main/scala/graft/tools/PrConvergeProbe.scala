// Scratch probe: convergence behavior of warm- vs cold-started
// PageRank on the sf0.001 co-purchase graph, across tolerances and
// delta sizes — picks the (tol, delta) the g08 contract pins.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
import graft.sources.Tables

object PrConvergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    def edgesFrom(mod: Int): org.apache.spark.sql.DataFrame = {
      val orders0 = Tables.load(spark, sf, "orders")
      val orders = if (mod > 0) orders0.filter(col("o_orderkey") % mod =!= 0)
        else orders0
      val lineitem = Tables.load(spark, sf, "lineitem")
      val pairs = orders.join(lineitem,
          orders("o_orderkey") === lineitem("l_orderkey"))
        .selectExpr("o_custkey * 2 AS cn", "l_suppkey * 2 + 1 AS sn")
        .distinct()
      pairs.selectExpr("cn AS src", "sn AS dst")
        .unionAll(pairs.selectExpr("sn AS src", "cn AS dst"))
    }
    for (tol <- Seq(1e-6, 5e-7, 1e-7)) {
      val (cold, coldIters) =
        GraphOps.pagerankConverged(edgesFrom(0), tol = tol, maxIters = 400)
      println(s"tol=$tol cold iters=$coldIters")
      for (mod <- Seq(20, 50, 100)) {
        val (base, baseIters) =
          GraphOps.pagerankConverged(edgesFrom(mod), tol = tol, maxIters = 400)
        val (warm, warmIters) = GraphOps.pagerankConverged(
          edgesFrom(0), Some(base), tol = tol, maxIters = 400)
        val c = cold.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val w = warm.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val maxDiff = c.keys.map(k =>
          math.abs(c(k) - w.getOrElse(k, 0.0))).max
        println(f"tol=$tol mod=$mod base=$baseIters warm=$warmIters " +
          f"cold=$coldIters maxDiff=$maxDiff%.3g")
      }
    }
    spark.stop()
  }
}
