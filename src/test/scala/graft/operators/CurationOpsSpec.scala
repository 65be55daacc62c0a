package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase per-source quota must (a) equal the one-window form —
  * global top-k by a per-row score is the top-k of the union of
  * per-partition top-ks — and (b) bound the rows any single source
  * contributes to the global ranking at k·P, so a mega-source never
  * funnels through one reducer. */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** 20k docs in one mega-source + 50 in a small one, spread over 8
    * input partitions. */
  private def skewedDocs = spark.range(0, 20050, 1, 8).selectExpr(
    "id AS doc_id",
    "concat('text-', md5(cast(id AS STRING))) AS text",
    "CASE WHEN id < 20000 THEN 'mega' ELSE 'small' END AS source")

  test("two-phase quota equals the one-window form on skewed data") {
    val d = skewedDocs
    val k = 7
    val twoPhase = CurationOps.sourceQuotaOn(d, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
    val oneWindow = d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select(col("doc_id"), col("source"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(twoPhase == oneWindow)
    assert(twoPhase.count(_._2 == "mega") == k)
    assert(twoPhase.count(_._2 == "small") == k)
  }

  test("phase 1 bounds any source's contribution at k per input partition") {
    val k = 7
    val perSource = CurationOps.quotaCandidates(skewedDocs, k)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 8 input partitions → the 20k-doc mega-source reaches the global
    // ranking with at most 56 rows instead of 20000
    assert(perSource("mega") <= 8L * k,
      s"mega source sent ${perSource("mega")} rows to the global rank")
    assert(perSource("small") <= 8L * k)
  }
}
