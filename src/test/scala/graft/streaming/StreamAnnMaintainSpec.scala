package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

/** The streaming ANN maintenance loop (s49): per-micro-batch
  * walk-and-link inserts + 2-hop delta maintenance must compose — the
  * central claim is the IDENTITY that sequential
  * [[SimilarityOps.hop2DeltaUpdate]] folds land on exactly
  * 2hop(final edge set), no matter how the ingest was micro-batched,
  * so the stream-maintained serving frame never drifts from the
  * from-scratch rebuild. */
class StreamAnnMaintainSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("composition identity: the 3-micro-batch stream's maintained " +
      "2-hop frame equals the from-scratch 2-hop build over its final " +
      "edges; every streamed-in vector is wired") {
    val (e, h) = StreamAnnMaintain.maintainedFrames(spark, sf, nFiles = 3)
    val rebuilt = e.unionAll(
        e.select(col("src"), col("dst").as("mid"))
          .join(e.select(col("src").as("mid"), col("dst")), "mid")
          .select("src", "dst"))
      .filter(col("src") =!= col("dst")).distinct()
    assert(edgeSet(h) == edgeSet(rebuilt),
      "per-micro-batch hop2DeltaUpdate folds drifted from the " +
        "from-scratch 2-hop rebuild — the composition identity broke")
    val n = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val deltaIds = (0L until n).filter(
      _ % SimilarityOps.DeltaIngestMod == SimilarityOps.DeltaIngestRem)
    val srcs = edgeSet(e).map(_._1)
    deltaIds.foreach { id =>
      assert(srcs.contains(id),
        s"streamed-in vec $id has no out-edges after its micro-batch")
    }
  }

  test("one micro-batch degenerates to the batch path: stream(nFiles=1) " +
      "maintained frame == the s45 batch maintenance exactly") {
    val (_, h1) = StreamAnnMaintain.maintainedFrames(spark, sf, nFiles = 1)
    val batch = SimilarityOps.deltaMaintainedHop2Frame(spark, sf)
    assert(edgeSet(h1) == edgeSet(batch),
      "a single micro-batch must be the batch insert verbatim")
  }

  test("s51 CRUD stream: the manifest is exactly the delete " +
      "subsequence; the composition identity survives interleaved " +
      "deletes; no deleted id ever surfaces") {
    val (e, h, tomb) =
      StreamAnnMaintain.lifecycleFrames(spark, sf, nFiles = 3)
    val n = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val expTomb = (0L until n)
      .filter(_ % SimilarityOps.TombstoneMod == 0).toSet
    assert(tomb.collect().map(_.getLong(0)).toSet == expTomb,
      "the accumulated manifest must be the streamed deletes exactly")
    // deletes are manifest-only: the edge fold must still satisfy the
    // 2-hop identity (merge-on-read never touches edge state)
    val rebuilt = e.unionAll(
        e.select(col("src"), col("dst").as("mid"))
          .join(e.select(col("src").as("mid"), col("dst")), "mid")
          .select("src", "dst"))
      .filter(col("src") =!= col("dst")).distinct()
    assert(edgeSet(h) == edgeSet(rebuilt),
      "interleaved deletes perturbed the insert fold — the identity " +
        "must survive any CRUD interleaving")
    val out = StreamAnnMaintain.beamLifecycleStream(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val surfaced = rows.map(_.getLong(2)).toSet
    assert(surfaced.intersect(expTomb).isEmpty,
      "a streamed takedown surfaced through the lifecycle serve")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks: $ranks")
    }
  }

  test("s52 streaming IVF assignment: any micro-batching equals the " +
      "batch s35 fold minus the streamed deletes, exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = pairs(SimilarityOps.ivfAssignDelta(spark, sf))
      .filterNot(_._1 % SimilarityOps.TombstoneMod == 0)
    assert(batch.nonEmpty)
    val streamed3 = pairs(StreamAnnMaintain.ivfAssignStream(spark, sf))
    assert(streamed3 == batch,
      "the 3-micro-batch stream drifted from the batch assignment — " +
        "per-row-stateless folds must be batching-invariant")
    val streamed1 = pairs(
      StreamAnnMaintain.ivfAssignStream(spark, sf, nFiles = 1))
    assert(streamed1 == batch,
      "the single-micro-batch stream must equal the batch assignment")
  }

  test("s49 serve over the stream-maintained frame: rows, contiguous " +
      "ranks, no duplicate neighbors per query") {
    val out = StreamAnnMaintain.beamMaintainStream(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks: $ranks")
      val nbrs = rs.map(_.getLong(2)).toSeq
      assert(nbrs.distinct.size == nbrs.size,
        s"query $q returned a duplicate neighbor")
    }
  }
}
