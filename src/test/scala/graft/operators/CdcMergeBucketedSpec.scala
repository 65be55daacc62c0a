package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q88's plan promise: with broadcast disabled (nothing to hide the
  * exchange), the CDC merge against the key-bucketed snapshot plans
  * its anti join as a sort-merge LEFT ANTI whose BASE side reads the
  * bucket hash assignment directly — zero shuffle exchanges anywhere
  * under the base subtree. Only the delta side may pay an exchange
  * into the bucket partitioning. The oracle gate separately holds the
  * result to q74's answer. */
class CdcMergeBucketedSpec extends AnyFunSuite with BeforeAndAfterAll {

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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    Persists.releaseAll()
    if (spark != null) spark.stop()
  }

  private def initial(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.initialPlan
    case other => other
  }

  test("anti join is SMJ with an exchange-free bucketed base side") {
    val df = CdcOps.mergeOrdersBucketed(spark, sfDir)
    val plan = initial(df.queryExecution.executedPlan)
    val antis = plan.collect {
      case j: SortMergeJoinExec if j.joinType == LeftAnti => j
    }
    assert(antis.size == 1,
      s"expected exactly one SMJ LEFT ANTI, got ${antis.size}:\n$plan")
    val base = antis.head.left
    val shuffles = base.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"base side of the anti join must be exchange-free:\n$base")
    assert(base.toString.contains("FileScan"),
      s"base side should read the bucketed files directly:\n$base")
  }

  test("bucketed merge equals the broadcast-path merge") {
    val bucketed = CdcOps.mergeOrdersBucketed(spark, sfDir)
      .orderBy("o_orderkey").collect().toSeq
    val plain = CdcOps.mergeOrders(spark, sfDir)
      .orderBy("o_orderkey").collect().toSeq
    assert(bucketed == plain)
  }
}
