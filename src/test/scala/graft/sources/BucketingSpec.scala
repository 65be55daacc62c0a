package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed pair must deliver its plan promise: with broadcast off
  * (so nothing hides the exchange), the orders ⋈ lineitem sort-merge
  * join over the bucketed tables has ZERO shuffle exchanges — and its
  * result equals the plain-parquet join. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("co-located join plans with zero shuffle exchanges") {
    val joined = Bucketing.colocatedJoin(spark, sfDir)
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 0, s"expected exchange-free bucketed join:\n$plan")
    assert(plan.contains("SortMergeJoin"), "expected an SMJ over buckets")
  }

  test("bucketed q57 equals the plain-parquet aggregate") {
    val bucketed = Bucketing.bucketedJoin(spark, sfDir)
      .orderBy("o_orderpriority").collect().toSeq
    val plain = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(
        count(lit(1)).as("items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(bucketed == plain)
  }
}
