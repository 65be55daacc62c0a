package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE pair counting against an independent in-memory count over the
  * real corpus — the sliding-pair generation (1-char words skipped,
  * overlapping pairs counted per occurrence) must match exactly. */
class TokenizerOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  test("top-k pairs match an independent in-memory scan") {
    val k = 20
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ", -1).foreach { w =>
      if (w.length >= 2)
        w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
    })
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(k)
      .zipWithIndex.map { case ((p, c), i) => (i + 1, p, c) }
    val got = TokenizerOps.bpePairCounts(spark, sfDir, k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
