package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Removable-outer-join elimination (reference:
  * MyLoptOptimizeJoinRule.findRemovableOuterJoins:157-279). */
class OuterJoinRemovalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def joins(sql: String): Int =
    spark.sql(sql).queryExecution.optimizedPlan.collect {
      case j: LJoin => j }.size

  private def runBoth(sql: String): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val on = spark.sql(sql).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    spark.conf.set("spark.graft.outerJoinElim.enabled", "false")
    try {
      val off = spark.sql(sql).collect().map(_.toSeq).toSeq.sortBy(_.toString)
      (on, off)
    } finally spark.conf.set("spark.graft.outerJoinElim.enabled", "true")
  }

  test("left outer join on a unique key with no right columns is removed") {
    val sql = """SELECT o_orderkey, o_totalprice
                 FROM orders LEFT JOIN customer ON o_custkey = c_custkey"""
    assert(joins(sql) == 0, "outer join should be gone")
    val (on, off) = runBoth(sql)
    assert(on == off && on.size == 1500)
  }

  test("right outer join mirror case is removed") {
    val sql = """SELECT c_custkey, c_name
                 FROM orders RIGHT JOIN customer ON o_orderkey = c_custkey"""
    assert(joins(sql) == 0)
    val (on, off) = runBoth(sql)
    assert(on == off)
  }

  test("NOT removed when right columns are projected") {
    val sql = """SELECT o_orderkey, c_name
                 FROM orders LEFT JOIN customer ON o_custkey = c_custkey"""
    assert(joins(sql) >= 1, "projected right column must keep the join")
  }

  test("NOT removed when the join key is not unique") {
    // o_custkey is a foreign key — duplicates would multiply customer rows
    val sql = """SELECT c_custkey, c_acctbal
                 FROM customer LEFT JOIN orders ON c_custkey = o_custkey"""
    assert(joins(sql) >= 1, "non-unique key must keep the join")
    val (on, off) = runBoth(sql)
    assert(on == off)
  }

  test("filters on the removed side do not block removal") {
    // right-side filters only null out matches; preserved side unchanged
    val sql = """SELECT o_orderkey
                 FROM orders LEFT JOIN
                   (SELECT * FROM customer WHERE c_acctbal > 0) c
                   ON o_custkey = c_custkey"""
    assert(joins(sql) == 0, "filtered unique dim should still be removable")
    val (on, off) = runBoth(sql)
    assert(on == off)
  }
}
