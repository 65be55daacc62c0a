package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** m12 shot boundaries: crafted two-shot media, within-shot silence,
  * tail-frame exclusion, and threshold binding on the gate corpus. */
class ShotBoundarySpec extends AnyFunSuite with BeforeAndAfterAll {

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
    MultimodalOps.shotBoundariesOn(items.toDF("media_id", "txt"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
  }

  // two frame archetypes with complementary 16-bit hashes: high-low
  // halves -> bits 0-7 set (0x00FF), low-high -> bits 8-15 (0xFF00)
  private val frameA = "z" * 32 + "a" * 32
  private val frameB = "a" * 32 + "z" * 32

  test("the cut lands exactly at the shot transition") {
    val m = run(Seq((1L, frameA * 4 + frameB * 4)))
    assert(m.size === 7) // 8 frames -> 7 comparisons
    assert(m((1L, 4)) === ((0xFF00L, 16, 1))) // the transition
    (1 to 3).foreach(f => assert(m((1L, f))._3 === 0))
    (5 to 7).foreach(f => assert(m((1L, f))._3 === 0))
    assert(m((1L, 1))._1 === 0x00FFL)
  }

  test("a static shot never fires: constant frames hash to zero") {
    val m = run(Seq((1L, "m" * 256)))
    assert(m.size === 3)
    m.values.foreach { case (h, ham, fl) =>
      assert(h === 0L && ham === 0 && fl === 0)
    }
  }

  test("incomplete tail frames are dropped, short items excluded") {
    val m = run(Seq((1L, frameA + frameB + "leftover"),
      (2L, "too short")))
    assert(m.keySet === Set((1L, 1))) // 2 complete frames, 1 row
    assert(m((1L, 1))._2 === 16)
  }

  test("gate corpus: tau = 12 binds — boundaries exist and are rare") {
    val out = MultimodalOps.shotBoundaries(spark, "/root/testdata/sf0.001")
      .collect()
    val flagged = out.count(_.getInt(4) === 1)
    assert(flagged > 0 && flagged < out.length / 10,
      s"$flagged of ${out.length}")
  }
}
