package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native portable-LSH signature must be BIT-IDENTICAL to the SQL
  * fold the s05 DuckDB oracle mirrors — same left-to-right double
  * accumulation, same `>= 0` sign, same `1 << p` packing — on the
  * real embedding table (covering the coefficient grid end-to-end)
  * and on sign-edge fixtures. */
class PortableSigsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("native sigs equal the interpreted SQL fold on the real table") {
    val v = graft.operators.SimilarityOps.vecs(spark, "/root/testdata/sf0.001")
    val both = v.select(col("vec_id"),
      call_function("graft_portable_sigs", col("v"), lit(4), lit(8))
        .as("native"),
      expr(graft.operators.SimilarityOps.portableSigsSqlExpr).as("sql"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: native ${r.getSeq[Int](1)} != sql ${r.getSeq[Int](2)}")
    }
    // non-degenerate: signatures spread across buckets
    assert(rows.map(_.getSeq[Int](1)).distinct.size > 10)
  }

  test("zero vector signs >= 0 on every plane (the SQL tie rule)") {
    val s = spark
    import s.implicits._
    val sig = Seq(Tuple1(Seq.fill(64)(0.0))).toDF("v")
      .select(call_function("graft_portable_sigs", col("v"), lit(2), lit(8)))
      .collect().head.getSeq[Int](0)
    assert(sig == Seq(255, 255), "dot == 0 must set the bit, as '>= 0' does")
  }
}
