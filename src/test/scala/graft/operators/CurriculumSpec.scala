package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c26 curriculum ordering: exact left-edge terciles, the growing
  * epoch prefixes, per-shard position contiguity, and the per-epoch
  * reshuffle. */
class CurriculumSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = {
    Persists.releaseAll()
    if (spark != null) spark.stop()
  }

  /** doc i has i+1 tokens — difficulties 1..9, one doc each. */
  private def ladder = {
    val s = spark
    import s.implicits._
    (0 until 9).map(i => (i.toLong, Seq.fill(i + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("uniform difficulties band into exact terciles (left edge)") {
    val bands = CurationOps.curriculumOn(ladder)
      .filter("epoch = 3").collect()
      .map(r => (r.getLong(3), r.getInt(4))).toMap
    // ((cum - cnt) * 3) div 9 + 1: docs 0-2 (difficulty 1-3) -> band 1,
    // 3-5 -> band 2, 6-8 -> band 3
    assert(bands === Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 2, 6L -> 3, 7L -> 3, 8L -> 3))
  }

  test("epochs are growing prefixes of the difficulty bands") {
    val rows = CurationOps.curriculumOn(ladder).collect()
      .map(r => (r.getInt(0), r.getLong(3))).toSeq
    def docsOf(e: Int) = rows.filter(_._1 == e).map(_._2).toSet
    assert(docsOf(1) === Set(0L, 1L, 2L))
    assert(docsOf(2) === Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(docsOf(3) === (0L until 9L).toSet)
  }

  test("positions are contiguous 1..n within every (epoch, shard)") {
    val rows = CurationOps.curriculum(spark, "/root/testdata/sf0.001")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (key, ps) =>
      val pos = ps.map(_._2).sorted
      assert(pos === (1 to pos.size).toList, s"gap in $key")
    }
  }

  test("each epoch reshuffles: common docs order differently across epochs") {
    // epoch-seeded hash: the band-1 docs appear in all 3 epochs; their
    // relative (shard, pos) layout must differ between at least two
    // epochs on the real corpus (a fixed layout would defeat the
    // per-pass reshuffle a trainer expects)
    val rows = CurationOps.curriculum(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val common = rows.filter(_._1 == 1).map(_._4).toSet
    def layout(e: Int) = rows.filter(r => r._1 == e && common(r._4))
      .sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(layout(1) !== layout(2))
  }
}
