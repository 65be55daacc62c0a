package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r17 serve-only twins (benched s47i/s48i/s49i/s50i/s51i —
  * VERDICT r16 item 3: the s53 ingest/serve split applied to the
  * lifecycle/stream family before those entries join the bench): each
  * twin serves the STORED artifact its inline gate form maintains
  * per run, so the pinned contract is row-set equality against the
  * inline form at the same dials. */
class ServeTwinsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def rows(df: DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("s47i == s47: lifecycle serve from the stored maintained " +
      "artifact equals the inline delta-maintained serve") {
    val inline = rows(SimilarityOps.graphBeamLifecycleServed(spark, sf))
    val served = rows(
      SimilarityOps.graphBeamLifecycleMaintServed(spark, sf))
    assert(served == inline)
    assert(served.nonEmpty)
  }

  test("s48i == s48: the artifact-served dispatch equals the inline " +
      "lifecycle auto dispatch at gate dials") {
    val inline = rows(SimilarityOps.graphBeamAnnLifecycleAuto(spark, sf))
    val served = rows(
      SimilarityOps.graphBeamLifecycleAutoServed(spark, sf))
    assert(served == inline)
    assert(served.nonEmpty)
  }

  test("s48i forced-threshold branch: a tripped rebuild dispatches " +
      "both forms to the same compacted serve") {
    val inline = rows(SimilarityOps.graphBeamAnnLifecycleAuto(
      spark, sf, rebuildThreshold = 0.0))
    val served = rows(SimilarityOps.graphBeamLifecycleAutoServed(
      spark, sf, rebuildThreshold = 0.0))
    assert(served == inline)
  }

  test("s50i == s50: the capped serve from the stored capped artifact " +
      "equals the inline capped-maintained serve") {
    val inline = rows(SimilarityOps.graphBeamDeltaCappedServed(spark, sf))
    val served = rows(SimilarityOps.graphBeamCappedServed(spark, sf))
    assert(served == inline)
    assert(served.nonEmpty)
  }

  test("s49i == s49: the serve over the stored stream-maintained " +
      "artifact equals the inline stream fold + serve") {
    val inline = rows(
      graft.streaming.StreamAnnMaintain.beamMaintainStream(spark, sf))
    val served = rows(
      graft.streaming.StreamAnnMaintain.beamMaintainStreamServed(spark, sf))
    assert(served == inline)
    assert(served.nonEmpty)
  }

  test("s51i == s51: the serve over the stored CRUD-stream artifacts " +
      "equals the inline lifecycle stream; no tombstone surfaces") {
    val inline = rows(
      graft.streaming.StreamAnnMaintain.beamLifecycleStream(spark, sf))
    val served = rows(
      graft.streaming.StreamAnnMaintain.beamLifecycleStreamServed(spark, sf))
    assert(served == inline)
    assert(served.nonEmpty)
    val n = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val tomb = (0L until n)
      .filter(_ % SimilarityOps.TombstoneMod == 0).toSet
    assert(served.map(_._3).intersect(tomb).isEmpty)
  }
}
