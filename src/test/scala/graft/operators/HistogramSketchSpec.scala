package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q108 contract: the build→merge→serve path over sharded histogram
  * sketch columns reproduces the direct GROUP BY exactly (the merge is
  * exact, unlike q105's HLL), and the answer is invariant to HOW the
  * rows were sharded — any partition of the rows into shards merges to
  * the same histogram. */
class HistogramSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val NBins = 20

  test("sharded build + merge equals direct counts, for any sharding") {
    val s = spark
    import s.implicits._
    val rows = (1L to 300L).map { i =>
      (s"t${i % 3}", i % 11, (i * 7 % 120).toDouble - 10.0) // under/overflow tails
    }
    val e = rows.toDF("event_type", "day", "value")

    def serve(sharded: org.apache.spark.sql.DataFrame) =
      RelationalQueries.histogramMergeServe(
        RelationalQueries.histogramSketch(sharded, NBins, 5.0), NBins)
        .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
        .toMap

    val byDay = serve(e)
    // reshard: same rows, different shard key — merge must not care
    val byHash = serve(e.withColumn("day", pmod(xxhash64(col("value")), lit(7))))

    val direct = rows.groupBy { case (t, _, v) =>
      (t, math.min(math.max(math.floor(v / 5.0), 0), NBins - 1).toInt)
    }.map { case (k, g) => k -> g.size.toLong }
    val nonZero = byDay.filter(_._2 > 0)
    assert(nonZero == direct)
    assert(byDay == byHash)
    // dense serving: every (type, bin) cell present, 3 types x 20 bins
    assert(byDay.size == 3 * NBins)
    // clamp tails actually exercised: mass in bin 0 and bin 19
    assert(byDay(("t0", 0)) > 0 && byDay(("t0", NBins - 1)) > 0)
  }
}
