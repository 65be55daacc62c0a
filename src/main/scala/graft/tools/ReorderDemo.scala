// Demo + manual check for the injected GraftJoinReorder optimizer rule:
// run a query written in a deliberately bad FROM order (first two tables
// unconnected) with Spark's own ReorderJoin excluded, and show the join
// shape and row counts with the graft rule on vs off.
package graft.tools

import org.apache.spark.sql.SparkSession

object ReorderDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, sfDir)

    val badOrder =
      """SELECT count(*) AS cnt
         FROM lineitem, region, nation, customer, orders
         WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
           AND c_custkey = o_custkey AND o_orderkey = l_orderkey"""

    def describe(tag: String): Long = {
      val df = spark.sql(badOrder)
      val crosses = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.isEmpty => j
      }.size
      val cnt = df.collect().head.getLong(0)
      println(s"$tag: crossJoins=$crosses rows=$cnt")
      df.queryExecution.optimizedPlan.toString.linesIterator
        .filter(_.contains("Join Inner")).foreach(l => println("   " + l.trim))
      cnt
    }

    val on = describe("graft reorder ON ")
    spark.conf.set("spark.graft.joinReorder.enabled", "false")
    val off = describe("graft reorder OFF")
    require(on == off, s"result mismatch: $on vs $off")
    println(s"RESULTS MATCH: $on rows either way")
    spark.stop()
  }
}
