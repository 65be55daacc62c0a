package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SelfJoinEliminationSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    spark.conf.set("spark.graft.selfJoinElim.enabled", "false")
    try {
      val off = spark.sql(sql).collect().map(_.toSeq).toSeq.sortBy(_.toString)
      (on, off)
    } finally spark.conf.set("spark.graft.selfJoinElim.enabled", "true")
  }

  test("pk self-join is eliminated and results preserved") {
    val sql = """SELECT a.c_custkey, a.c_name, b.c_acctbal
                 FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey"""
    assert(joins(sql) == 0, "self-join should be gone")
    val (on, off) = runBoth(sql)
    assert(on == off && on.size == 150)
  }

  test("filters on both sides are AND-merged") {
    val sql = """SELECT a.c_custkey, b.c_name
                 FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey
                 WHERE a.c_acctbal > 1000 AND b.c_mktsegment = 'BUILDING'"""
    assert(joins(sql) == 0)
    val (on, off) = runBoth(sql)
    assert(on == off)
  }

  test("non-unique-key self-join is NOT eliminated") {
    val sql = """SELECT count(*) AS c
                 FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey"""
    assert(joins(sql) >= 1, "l_orderkey is not unique in lineitem")
    val (on, off) = runBoth(sql)
    assert(on == off)
  }

  test("join of two DIFFERENT tables is untouched") {
    val sql = """SELECT count(*) AS c
                 FROM customer JOIN orders ON c_custkey = o_custkey"""
    assert(joins(sql) >= 1)
  }
}
