package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d21 containment dedup: the asymmetric embedded-doc case jaccard
  * misses, identity/disjoint edges, and the hot-shingle cap. */
class ContainmentSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(docs: Seq[(Long, String)], threshold: Double = 0.9,
      cap: Long = 100) = {
    val s = spark
    import s.implicits._
    DedupOps.containmentDedupOn(docs.toDF("doc_id", "text"),
      threshold, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
  }

  private val big = (1 to 100).map(i => s"w$i").mkString(" ")
  private val excerpt = (20 to 29).map(i => s"w$i").mkString(" ")

  test("an excerpt inside a 10x document flags; jaccard would miss it") {
    val m = run(Seq((1L, big), (2L, excerpt)))
    val (ca, cb, contained) = m((1L, 2L))
    assert(cb === 1.0) // every excerpt shingle is in the big doc
    assert(ca < 0.1) // the big doc is NOT contained in the excerpt
    assert(contained === 2L)
    // the symmetric measure on the same pair: |∩| = 6 shingles of
    // |∪| = 96 -> jaccard 0.0625, invisible to any useful d04 cut
    val j = 6.0 / (96 + 6 - 6)
    assert(j < 0.1)
  }

  test("identical docs are mutually contained, ties to the lower id") {
    val m = run(Seq((1L, big), (2L, big)))
    assert(m((1L, 2L)) === ((1.0, 1.0, 1L)))
  }

  test("shingle-disjoint docs produce no candidates at all") {
    val other = (200 to 260).map(i => s"x$i").mkString(" ")
    assert(run(Seq((1L, big), (2L, other))).isEmpty)
  }

  test("the hot-shingle cap drops boilerplate-only pairs") {
    // 12 docs that agree ONLY on one shared header shingle: with the
    // cap below 12 the key is dropped from both sides and no pair
    // survives; with a slack cap the header pairs all of them
    val header = "common header line repeated everywhere"
    val docs = (1L to 12L).map(i =>
      (i, header + " " + (1 to 20).map(j => s"u${i}_$j").mkString(" ")))
    // the 5-word header is ONE shared shingle of 22 per doc ->
    // containment ≈ 0.045; any sub-0.045 cut sees the pairs iff the
    // cap leaves the header key alive
    assert(run(docs, threshold = 0.04, cap = 11).isEmpty)
    assert(run(docs, threshold = 0.04, cap = 100).nonEmpty)
  }

  test("gate corpus: the 0.9 cut binds (pairs exist on both sides)") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val strict = DedupOps.containmentDedup(spark, sf).collect()
    val all = DedupOps.containmentDedupOn(
      graft.sources.Tables.load(s, sf, "documents"), threshold = 0.0)
      .collect()
    assert(strict.nonEmpty && all.length > strict.length,
      s"${strict.length} of ${all.length} — cut no longer binds")
  }
}
