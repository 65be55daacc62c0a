package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The audit must DETECT: every planted violation class shows its
  * exact known count (clean data would report zeros and prove
  * nothing), at any scale factor. */
class AuditOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("each planted violation is counted exactly once") {
    val got = AuditOps.dqAudit(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "pk_duplicate_groups" -> 1L,
      "fk_orphan_rows" -> 2L,
      "null_custkey_rows" -> 1L,
      "price_range_rows" -> 1L))
  }
}
