package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q70's correctness contract. approx_percentile guarantees the
  * returned value's RANK is within n/accuracy of the target rank, so
  * the empirical CDF around the returned value must bracket the target
  * percentile: strictly-below mass ≤ p + ε and at-or-below mass ≥
  * p − ε (the two-sided form is exact even for heavily-discrete
  * columns like l_quantity, where "≤ v" can overshoot p by one value's
  * whole mass). q49 gates the exact twin against DuckDB; this spec
  * ties the sketch to the same data. */
class ApproxPercentileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

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

  private val eps = 1e-4 // 1/accuracy at the q70 setting

  private def cdfBrackets(
      colName: String, v: Double, p: Double, flag: String): Unit = {
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === flag)
    val n = li.count().toDouble
    val below = li.filter(col(colName) < v).count() / n
    val atOrBelow = li.filter(col(colName) <= v).count() / n
    assert(below <= p + eps + 1e-9,
      f"$flag $colName p=$p v=$v: strictly-below mass $below%.5f > ${p + eps}")
    assert(atOrBelow >= p - eps - 1e-9,
      f"$flag $colName p=$p v=$v: at-or-below mass $atOrBelow%.5f < ${p - eps}")
  }

  test("q70 sketch values bracket their target percentiles per group") {
    val rows = RelationalQueries.noOracleQueries("q70_approx_percentile")(
      spark, sfDir).collect()
    assert(rows.length == 3, "lineitem has 3 return flags")
    rows.foreach { r =>
      val flag = r.getString(0)
      cdfBrackets("l_quantity", r.getDouble(1), 0.5, flag)
      cdfBrackets("l_quantity", r.getDouble(2), 0.9, flag)
      cdfBrackets("l_extendedprice", r.getDouble(3), 0.25, flag)
    }
  }
}
