package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** m11 dHash: gradient-sign extremes, the brightness-invariance
  * property aHash shares but a ramp breaks differently, and the
  * short-item exclusion. */
class DhashSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(items: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    MultimodalOps.dhashOn(items.toDF("media_id", "txt"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  // 130 chars = 65 blocks of exactly 2; block means strictly
  // monotone by construction
  private def pairs(codes: Seq[Int]): String =
    codes.flatMap(c => Seq(c.toChar, c.toChar)).mkString

  test("strictly increasing signal hashes to all-zero gradient bits") {
    val m = run(Seq((1L, pairs(62 to 126))))
    assert(m(1L) === ((0L, 0L, 0L, 0L)))
  }

  test("strictly decreasing signal hashes to all-one gradient bits") {
    val m = run(Seq((1L, pairs((62 to 126).reverse))))
    assert(m(1L) === ((65535L, 65535L, 65535L, 65535L)))
  }

  test("uniform brightness shift leaves the hash unchanged") {
    val base = (0 until 130)
      .map(i => ('a' + (i * 7 + i * i % 11) % 26).toChar).mkString
    val shifted = base.map(c => (c + 1).toChar)
    val m = run(Seq((1L, base), (2L, shifted)))
    assert(m(1L) === m(2L))
  }

  test("items shorter than 65 units are excluded") {
    val m = run(Seq((1L, "x" * 64), (2L, "y" * 65)))
    assert(!m.contains(1L) && m.contains(2L))
    // constant signal: no block exceeds its neighbor -> all zeros
    assert(m(2L) === ((0L, 0L, 0L, 0L)))
  }

  test("chunks fit the 16-bit band layout the pairing kernel expects") {
    val out = MultimodalOps.dhash(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      (1 to 4).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0L && c <= 65535L)
      }
    }
  }
}
