package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r15 next #2: delta-sized DELETE maintenance for the ANN
  * index family. Table-level takedown was O(|list|)
  * ([[graft.sources.Deletes]]) and index INSERT maintenance was
  * delta-sized (s35/s37), but a takedown'd VECTOR stayed servable
  * until the fingerprint-triggered full rebuild. The contract set:
  * a tombstoned vector NEVER surfaces in results (s39 merge-on-read,
  * s40 post-compaction, s41 IVF), serve-time added work is
  * takedown-sized (one broadcast anti-join), and the
  * tombstone→compaction handoff is a measured decision
  * ([[SimilarityOps.annCompactionNeeded]]), not a policy guess.
  * The DuckDB oracles pin exact semantics at the gate; this spec
  * pins the takedown contracts and the handoff. */
class AnnTombstoneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
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

  private def tombstoned(ids: Seq[Long]): Seq[Long] =
    ids.filter(_ % SimilarityOps.TombstoneMod == 0)

  private def neighbors(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("neighbor_id").collect().map(_.getLong(0)).toSeq

  test("s39 merge-on-read: tombstoned vectors never surface; ranks " +
      "stay contiguous over survivors; deterministic") {
    val out = SimilarityOps.graphBeamAnnTombstonedServed(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(tombstoned(neighbors(out)).isEmpty,
      "a takedown'd vector surfaced through the merge-on-read serve")
    // per-query ranks are 1..k over SURVIVORS (re-ranked after the
    // anti-join, not holes where tombstones were)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks: $ranks")
    }
    val again = SimilarityOps.graphBeamAnnTombstonedServed(spark, sf)
    assert(again.collect().map(_.toSeq).toSet ==
      rows.map(_.toSeq).toSet, "serve must be deterministic")
  }

  test("s39 routes THROUGH tombstoned nodes: exclusion is at the " +
      "result stage, so surviving results match the classic walk's " +
      "survivors exactly") {
    // the classic walk's final merged beam, minus tombstones,
    // re-ranked = s39's definition; equality on the overlap proves
    // the walk itself (routing) was untouched by the manifest
    val classic = SimilarityOps.graphBeamAnnMultiServed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val s39 = SimilarityOps.graphBeamAnnTombstonedServed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val classicSurvivors = classic
      .filterNot(t => t._2 % SimilarityOps.TombstoneMod == 0).toSet
    // every surviving classic result appears in s39 with the same
    // cosine (s39 may ADD deeper-ranked survivors to refill to k)
    assert(classicSurvivors.subsetOf(s39.toSet),
      "result-stage exclusion changed a surviving row — the manifest " +
        "must not perturb routing")
  }

  test("s40 compaction: the rebuilt artifact holds NO tombstoned node " +
      "(not as source, not as destination); serve surfaces none") {
    val path = SimilarityOps.beamCompactedEdgesPath(spark, sf)
    val edges = spark.read.parquet(path)
    val m = SimilarityOps.TombstoneMod
    assert(edges.filter(
        org.apache.spark.sql.functions.expr(
          s"src % $m = 0 OR dst % $m = 0")).count() == 0,
      "compaction left a tombstoned vertex in the edge artifact")
    val out = SimilarityOps.graphBeamAnnCompactedServed(spark, sf)
    assert(out.count() > 0)
    assert(tombstoned(neighbors(out)).isEmpty)
  }

  test("s41 IVF: tombstoned candidates drop; the frozen centroid " +
      "model is untouched") {
    val out = SimilarityOps.ivfTopKTombstoned(spark, sf)
    assert(out.count() > 0)
    assert(tombstoned(neighbors(out)).isEmpty)
    // untombstoned queries against cells with no tombstoned member
    // return exactly the plain-IVF answer — the model (and thus the
    // probe routing) is identical, only candidates were filtered
    // ranks re-pack after the exclusion, so compare rank-free triples
    val plain = SimilarityOps.ivfTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toSet
    val tomb = out
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toSet
    val plainSurv = plain.filterNot(
      _._2 % SimilarityOps.TombstoneMod == 0)
    assert(plainSurv.subsetOf(tomb),
      "candidate filtering perturbed a surviving IVF result")
  }

  test("s44 batched+tombstoned: surviving s38 rows appear identically; " +
      "no tombstoned id surfaces") {
    val s38 = SimilarityOps.graphBeamAnnBatchedServed(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val s44 = SimilarityOps.graphBeamAnnBatchedTombstoned(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(s44.nonEmpty)
    assert(tombstoned(s44.map(_._2).toSeq).isEmpty,
      "a takedown'd vector surfaced through the batched serve")
    val surv = s38.filterNot(
      _._2 % SimilarityOps.TombstoneMod == 0).toSet
    assert(surv.subsetOf(s44.toSet),
      "result-stage exclusion perturbed a surviving batched row")
  }

  test("s43 dispatch: the default threshold serves merge-on-read; a " +
      "tripped threshold serves the compacted rebuild") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(SimilarityOps.graphBeamAnnServed(spark, sf)) ==
      rows(SimilarityOps.graphBeamAnnTombstonedServed(spark, sf)),
      "below threshold the dispatch must be the merge-on-read serve")
    assert(rows(SimilarityOps.graphBeamAnnServed(spark, sf,
        compactThreshold = 0.02)) ==
      rows(SimilarityOps.graphBeamAnnCompactedServed(spark, sf)),
      "a tripped threshold must serve the compacted rebuild")
  }

  test("tombstone→compaction handoff: the decision row counts the " +
      "manifest against the corpus and trips on the threshold") {
    val n = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val expected = (0L until n).count(_ % SimilarityOps.TombstoneMod == 0)
    val row = SimilarityOps.annCompactionNeeded(spark, sf).head()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == expected.toLong,
      s"manifest count ${row.getLong(1)} != predicate count $expected")
    assert(!row.getBoolean(3),
      "default 10% threshold must not trip at 1/41 tombstoned")
    val low = SimilarityOps.annCompactionNeeded(spark, sf, threshold = 0.02)
      .head()
    assert(low.getBoolean(3), "2% threshold must trip at 1/41 — the " +
      "handoff that triggers the beamCompactedEdgesPath rebuild")
  }
}
