package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZValue

/** The Z-order kernel must match a bit-by-bit reference interleave, and
  * the q58 extents must exhibit the curve's defining guarantee: a
  * naturally-aligned 2^16-position block is a 256×256 tile, so every
  * bucket's bounding box spans ≤ 255 in BOTH dimensions — the provable
  * data-skipping bound a z-ordered writer ships. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Reference interleave: one bit at a time. */
  private def slowZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("kernel matches the bit-loop reference on deterministic points") {
    val pts = for {
      x <- Seq(0L, 1L, 2L, 255L, 256L, 12345L, 65535L)
      y <- Seq(0L, 1L, 3L, 128L, 999L, 54321L, 65535L)
    } yield (x, y)
    pts.foreach { case (x, y) =>
      assert(ZValue.compute(x, y) == slowZ(x, y), s"($x, $y)")
    }
    // inputs above 16 bits are masked, not wrapped arbitrarily
    assert(ZValue.compute(65536L + 7L, 0L) == ZValue.compute(7L, 0L))
  }

  test("z-value is monotone within each dimension's bit positions") {
    // fixing y, increasing x increases z (x occupies the even bits)
    val ys = Seq(0L, 17L, 999L)
    ys.foreach { y =>
      val zs = (0L to 100L).map(ZValue.compute(_, y))
      assert(zs == zs.sorted, s"y=$y")
    }
  }

  test("q58 buckets are 256x256 tiles: both extents span <= 255") {
    val rows = ZOrderOps.zorderExtents(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pkMin, pkMax) = (r.getAs[Long]("pk_min"), r.getAs[Long]("pk_max"))
      val (skMin, skMax) = (r.getAs[Long]("sk_min"), r.getAs[Long]("sk_max"))
      assert(pkMax - pkMin <= 255,
        s"bucket ${r.getAs[Long]("zbucket")} partkey span ${pkMax - pkMin}")
      assert(skMax - skMin <= 255,
        s"bucket ${r.getAs[Long]("zbucket")} suppkey span ${skMax - skMin}")
    }
    // and the buckets partition all rows
    val total = rows.map(_.getAs[Long]("n")).sum
    val expected = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "lineitem").count()
    assert(total == expected)
  }

  test("cellWidth scales the tile bound past 16-bit key domains") {
    graft.functions.GraftFunctions.register(spark)
    // 20-bit keys: cellWidth 16 -> 65536 cells per dimension, buckets
    // are 256x256-CELL tiles, extents bounded by 255 * 16 + 15
    val cellW = 16L
    val d = spark.range(0, 50000, 1, 4).selectExpr(
      "CAST(id * 21 % 1048576 AS BIGINT) AS l_partkey",
      "CAST(id * 13 % 1048576 AS BIGINT) AS l_suppkey")
    val rows = ZOrderOps.zorderExtentsOn(d, cellW).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min") <=
        255L * cellW + (cellW - 1))
      assert(r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min") <=
        255L * cellW + (cellW - 1))
    }
  }
}
