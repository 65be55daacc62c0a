package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the native bounded top-k aggregate (q109/q110):
  * agreement with the window form row for row (including score ties,
  * broken by payload asc), invariance to physical partitioning (the
  * partial-merge path), bounded-k semantics, and null skipping. */
class TopKAggSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // deterministic frame with duplicate scores inside and across groups
  private def frame() = {
    val s = spark
    import s.implicits._
    (1L to 400L).map { i =>
      (s"g${i % 5}", (i * 37 % 11).toDouble, i)
    }.toDF("g", "score", "id")
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(expr(s"graft_topk(score, id, $k)").as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e.score").as("score"),
        col("e.payload").as("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= k).select("g", "score", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet

  test("topk agg equals the window form, ties broken by payload asc") {
    val df = frame()
    assert(viaAgg(df, 7) == viaWindow(df, 7))
  }

  test("result is invariant to physical partitioning (merge path)") {
    val df = frame()
    val base = viaAgg(df, 5)
    assert(viaAgg(df.repartition(1), 5) == base)
    assert(viaAgg(df.repartition(13, col("id")), 5) == base)
    assert(viaAgg(df.repartition(13, col("score")), 5) == base)
  }

  test("k >= group size returns the whole group; nulls are skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L), ("a", Some(3.0), 3L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g").agg(expr("graft_topk(score, id, 10)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.payload"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // null score skipped, k truncates nothing
  }
}
