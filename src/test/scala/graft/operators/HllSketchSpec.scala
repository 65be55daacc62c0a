package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q105 contract: per-group HLL estimates land within the sketch's
  * error bound of the exact distinct counts, and the UNION of
  * per-group sketches estimates the cross-group distinct — strictly
  * below the per-group sum when groups share members (the property
  * that makes sketch columns rollup-able without re-scans). */
class HllSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("per-group and merged estimates track exact distincts within 5%") {
    val events = graft.sources.Tables.load(spark, sfDir, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = events.select("user_id").distinct().count()

    val est = RelationalQueries.noOracleQueries("q105_hll_sketch_column")(
        spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    exact.foreach { case (t, n) =>
      val e = est(t)
      assert(math.abs(e - n) <= math.max(2L, (n * 0.05).toLong),
        s"$t: estimate $e vs exact $n")
    }
    val eAll = est("__all__")
    assert(math.abs(eAll - exactAll) <=
      math.max(2L, (exactAll * 0.05).toLong),
      s"__all__: estimate $eAll vs exact $exactAll")
    // groups share users: merged distinct must sit well below the sum
    assert(eAll < exact.values.sum)
  }
}
