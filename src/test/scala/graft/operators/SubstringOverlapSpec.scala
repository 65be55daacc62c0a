package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d16/c23 exact-substring overlap: the "≥N-token exact run" modality
  * must catch overlaps that BOTH c04's fixed-width shingle set and
  * d14's whole-doc jaccard miss, report the maximal run length
  * exactly, and keep the hot-window cap lossless on cold corpora. */
class SubstringOverlapSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Two 40-token docs sharing EXACTLY one 6-token run ("the quick
    * brown fox jumps high"), otherwise disjoint vocabularies — the
    * copied-sentence-in-unrelated-doc shape. Jaccard over 4-word
    * shingles ≈ 3/72, far under every d-family threshold; the run is
    * shorter than c04's 8-token shingle so the shingle join is empty. */
  private def copiedSentenceDocs = {
    val run = "the quick brown fox jumps high"
    val a = (0 until 17).map(i => s"a$i").mkString(" ") + " " + run + " " +
      (17 until 34).map(i => s"a$i").mkString(" ")
    val b = (0 until 17).map(i => s"b$i").mkString(" ") + " " + run + " " +
      (17 until 34).map(i => s"b$i").mkString(" ")
    val s = spark
    import s.implicits._
    Seq((1L, "src1", a), (2L, "src0", b)).toDF("doc_id", "source", "text")
  }

  test("catches a 6-token overlap that 8-shingle decontam and jaccard both miss") {
    val d = copiedSentenceDocs
    // d16 finds the pair and reports the exact maximal run length
    val got = DedupOps.substringOverlapOn(d).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 1L && got.head.getLong(1) === 2L)
    assert(got.head.getLong(2) === 6L)
    // c04's machinery (8-token shingles, the gate default) finds nothing:
    // no full 8-shingle fits inside a 6-token run
    assert(CurationOps.decontaminateOn(d, "src0", shingleK = 8).count() === 0)
    // d14-class whole-doc jaccard over 4-word shingles is ~3/72 — far
    // below the 0.4-class thresholds every jaccard dedup uses
    graft.functions.GraftFunctions.register(spark)
    val jac = d.select(Shingles.wordShingles("text", 4).as("sh"))
      .collect().map(_.getSeq[String](0).toSet)
    val j = jac(0).intersect(jac(1)).size.toDouble /
      jac(0).union(jac(1)).size
    assert(j < 0.1, s"fixture broken: jaccard $j not small")
    // the cross-set form sees the same pair with train/eval roles
    val cross = DedupOps.substringCrossOverlapOn(d, "src0").collect()
    assert(cross.length === 1)
    assert(cross.head.getLong(0) === 1L && cross.head.getLong(1) === 2L &&
      cross.head.getLong(2) === 6L)
  }

  test("maximal run length is exact across islands and offsets") {
    val s = spark
    import s.implicits._
    // doc 1 and 2 share a 9-token run AND a separate 6-token run at a
    // different alignment; the answer is the max (9), not a sum
    val nine = (0 until 9).map(i => s"r$i").mkString(" ")
    val six = (0 until 6).map(i => s"q$i").mkString(" ")
    val d = Seq(
      (1L, s"x0 x1 $nine x2 x3 $six"),
      (2L, s"$six y0 y1 y2 y3 y4 $nine")).toDF("doc_id", "text")
    val got = DedupOps.substringOverlapOn(d).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 9L)
  }

  test("adjacent-duplicate tokens do not inflate the run") {
    val s = spark
    import s.implicits._
    // "a a a a a a a a" vs the same: run = full 8 tokens; vs a doc with
    // 6 a's: run = 6 (window matches at multiple offsets must not
    // stitch into a longer island)
    val d = Seq(
      (1L, Seq.fill(8)("a").mkString(" ")),
      (2L, Seq.fill(6)("a").mkString(" "))).toDF("doc_id", "text")
    val got = DedupOps.substringOverlapOn(d).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 6L)
  }

  test("hot-window cap drops boilerplate pairs but keeps cold overlaps") {
    val s = spark
    import s.implicits._
    // 30 docs all opening with the same 6-token blurb; two of them
    // additionally share a rare 7-token run. Cap=20 kills the blurb
    // windows (30 > 20) — the only surviving pair is the rare run.
    val blurb = "licensed under the apache license version"
    val rare = (0 until 7).map(i => s"z$i").mkString(" ")
    val docs = (0 until 30).map { i =>
      val body = (0 until 8).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, if (i < 2) s"$blurb $rare $body" else s"$blurb $body")
    }
    val d = docs.toDF("doc_id", "text")
    val capped = DedupOps.substringOverlapOn(d, maxWindowFreq = 20L)
      .collect()
    assert(capped.length === 1)
    assert(capped.head.getLong(0) === 0L && capped.head.getLong(1) === 1L)
    // the rare run itself survives at its exact length: blurb windows
    // are hot, but the windows spanning blurb→rare tail are per-doc
    // unique... except the first-two docs share blurb+rare contiguously,
    // so their maximal run includes the blurb prefix (13 tokens) — the
    // cap drops WINDOWS, and every window fully inside blurb+rare that
    // only docs 0/1 share is cold. Windows fully inside the blurb are
    // hot (30 docs) and dropped; the island therefore starts at the
    // first window touching the rare tail: positions 2..7 of the
    // 13-token shared prefix region → run = 6 windows + 5 = 11? No:
    // shared region = 6 blurb + 7 rare = 13 tokens → windows 1..8;
    // windows 1 is blurb-only (tokens 1-6, hot, dropped); windows 2..8
    // touch the rare tail and are unique to docs 0/1 → 7 consecutive
    // windows → run 7+5 = 12.
    assert(capped.head.getLong(2) === 12L)
    // uncapped, the pair's full 13-token shared prefix is the run
    val uncapped = DedupOps.substringOverlapOn(d)
      .filter("doc_a = 0 AND doc_b = 1").collect()
    assert(uncapped.head.getLong(2) === 13L)
  }
}
