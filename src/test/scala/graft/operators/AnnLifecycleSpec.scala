package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The unified index LIFECYCLE: s46's single maintenance decision
  * (insert-delta share + tombstone share, rebuild > compact > serve
  * precedence), s47's full merge serve (stored artifacts + delta
  * maintenance + merge-on-read takedowns in ONE path — every mutation
  * discipline the family ships, composed), and s48's dispatch on the
  * decision row. The insert∩takedown interaction (ids ≡
  * [[SimilarityOps.DeltaIngestRem]] mod [[SimilarityOps.DeltaIngestMod]]
  * AND ≡ 0 mod [[SimilarityOps.TombstoneMod]]) is nonempty by CRT —
  * this spec pins that a vector inserted and taken down in the same
  * batch routes (its searched-in edges are live) but never surfaces. */
class AnnLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))

  test("s46 decision: counts match the predicates; default dials " +
      "serve; each share trips its action; rebuild subsumes compact") {
    val n = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val expDelta = (0L until n).count(
      _ % SimilarityOps.DeltaIngestMod == SimilarityOps.DeltaIngestRem)
    val expTomb = (0L until n).count(
      _ % SimilarityOps.TombstoneMod == 0)
    val row = SimilarityOps.annMaintenanceNeeded(spark, sf).head()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == expDelta.toLong,
      s"delta count ${row.getLong(1)} != predicate count $expDelta")
    assert(row.getLong(3) == expTomb.toLong,
      s"tombstone count ${row.getLong(3)} != predicate count $expTomb")
    assert(row.getAs[String]("action") == "serve",
      "1/7 delta and 1/41 tombstoned must not trip the defaults")
    assert(SimilarityOps.annMaintenanceNeeded(spark, sf,
        rebuildThreshold = 0.1).head().getAs[String]("action") == "rebuild",
      "a 10% rebuild threshold must trip at 1/7 delta")
    assert(SimilarityOps.annMaintenanceNeeded(spark, sf,
        compactThreshold = 0.02).head().getAs[String]("action") == "compact",
      "a 2% compact threshold must trip at 1/41 tombstoned")
    assert(SimilarityOps.annMaintenanceNeeded(spark, sf,
        rebuildThreshold = 0.1, compactThreshold = 0.02)
        .head().getAs[String]("action") == "rebuild",
      "with both shares tripped, rebuild must take precedence — the " +
        "survivor rebuild subsumes compaction")
  }

  test("s47 full merge serve: no tombstoned id surfaces; surviving " +
      "s45 rows appear identically (routing untouched); ranks " +
      "contiguous") {
    val s45 = triples(SimilarityOps.graphBeamDeltaBatchedServed(spark, sf))
    val out = SimilarityOps.graphBeamLifecycleServed(spark, sf)
    val s47 = triples(out)
    assert(s47.nonEmpty)
    assert(s47.forall(_._2 % SimilarityOps.TombstoneMod != 0),
      "a takedown'd vector surfaced through the lifecycle serve")
    val surv = s45.filterNot(
      _._2 % SimilarityOps.TombstoneMod == 0).toSet
    assert(surv.subsetOf(s47.toSet),
      "result-stage exclusion perturbed a surviving delta-batched row")
    out.collect().groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks: $ranks")
    }
  }

  test("insert∩takedown interaction: a vector inserted and taken down " +
      "in the same batch ROUTES (its edges live in the maintained " +
      "frame) but never SURFACES") {
    val n = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val both = (0L until n).filter(id =>
      id % SimilarityOps.DeltaIngestMod == SimilarityOps.DeltaIngestRem &&
        id % SimilarityOps.TombstoneMod == 0)
    assert(both.nonEmpty, "the CRT intersection must exist at this n " +
      "for the interaction contract to be testable")
    // the serving half: the lifecycle serve must NEVER surface one
    val s47Results = triples(
      SimilarityOps.graphBeamLifecycleServed(spark, sf)).map(_._2).toSet
    both.foreach { id =>
      assert(!s47Results.contains(id),
        s"vec $id was taken down in its own insert batch and still " +
          "surfaced")
    }
    // the routing half: an inserted-then-taken-down vertex must carry
    // out-edges in the maintained frame (merge-on-read keeps it as
    // infrastructure — EXPERIMENT_r16 §2c measured why that matters)
    val frameSrcs = SimilarityOps.deltaMaintainedHop2Frame(spark, sf)
      .select("src").distinct()
      .collect().map(_.getLong(0)).toSet
    both.foreach { id =>
      assert(frameSrcs.contains(id),
        s"vec $id was inserted this batch but has no out-edges in " +
          "the maintained frame — it could never route")
    }
  }

  test("s53 serve-only twin: the walk over the stored maintained " +
      "artifact equals the inline s45 serve exactly") {
    val inline = SimilarityOps.graphBeamDeltaBatchedServed(spark, sf)
      .collect().map(_.toSeq).toSet
    val served = SimilarityOps.graphBeamDeltaMaintainedServed(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == inline,
      "artifact provenance changed the served result — the stored " +
        "maintained frame must be the inline fold verbatim")
  }

  test("s48 dispatch: default dials serve the s47 merge path; a " +
      "tripped rebuild threshold serves the survivor rebuild") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(SimilarityOps.graphBeamAnnLifecycleAuto(spark, sf)) ==
      rows(SimilarityOps.graphBeamLifecycleServed(spark, sf)),
      "below both thresholds the dispatch must be the full merge serve")
    assert(rows(SimilarityOps.graphBeamAnnLifecycleAuto(spark, sf,
        rebuildThreshold = 0.1)) ==
      rows(SimilarityOps.graphBeamAnnCompactedServed(spark, sf)),
      "a tripped rebuild threshold must serve the survivor rebuild")
    assert(rows(SimilarityOps.graphBeamAnnLifecycleAuto(spark, sf,
        compactThreshold = 0.02)) ==
      rows(SimilarityOps.graphBeamAnnCompactedServed(spark, sf)),
      "a tripped compact threshold must serve the survivor rebuild")
  }
}
