package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-IVF-maintenance contract (the d12/g08/q96
  * incremental discipline applied to the ANN index): assigning a
  * batch into existing cells equals what the full corpus layout
  * holds for those vectors; the trained-model delta assignment is
  * deterministic serve-to-serve; and s28's balance report actually
  * actuates the retrain decision. */
class IncrementalIvfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

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

  test("incremental assignment equals the full cell-partitioned layout") {
    // the stored serving layout's cell column IS the full-corpus
    // assignment; re-assigning any batch against the same model must
    // land identically — incremental == full, never "close"
    val stored = spark.read
      .parquet(SimilarityOps.cellPartitionedPath(spark, sf))
      .select(col("vec_id"), col("cell").cast("long").as("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = SimilarityOps.vecs(spark, sf)
    val rows = graft.sources.Tables.rowCount(spark, sf, "embeddings")
    val (centIds, centVecs) = SimilarityOps.centroidModel(all, rows, 23)
    val batch = all.filter(col("vec_id") % 5 === 2) // any ingest slice
    val assigned = SimilarityOps
      .assignBatchOn(spark, batch, centIds, centVecs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned.nonEmpty)
    assigned.foreach { case (id, c) =>
      assert(stored(id) == c, s"vec $id: incremental $c != stored ${stored(id)}")
    }
  }

  test("trained-model delta assignment is deterministic and in-range") {
    val a = SimilarityOps.ivfAssignDeltaTrained(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SimilarityOps.ivfAssignDeltaTrained(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && a == b, "stored-model serve must be frozen")
    val cells = a.values.toSet
    assert(cells.forall(_ >= 0) && cells.size > 1,
      "delta must spread across existing cells")
    // delta slice only, every delta vector routed
    assert(a.keySet.forall(_ % SimilarityOps.DeltaIngestMod ==
      SimilarityOps.DeltaIngestRem))
  }

  test("balance report actuates retrain: hot cell yes, uniform no") {
    val s = spark
    import s.implicits._
    def decide(loads: Seq[Double]): Boolean =
      SimilarityOps.ivfRetrainNeeded(
        loads.zipWithIndex.map { case (lf, i) =>
          (i.toLong, 10L, lf) }.toDF("cent_id", "n_vectors", "load_factor"))
        .collect().head.getBoolean(3)
    assert(!decide(Seq(1.0, 1.1, 0.9, 1.0)), "balanced index retrains")
    assert(decide(Seq(2.5, 0.8, 0.9, 0.8)), "hot cell must trigger")
    assert(decide(Seq(1.2, 1.3, 0.3, 1.2)), "starved cell must trigger")
  }

  test("gate delta assignment: base-model cells, delta rows only") {
    val got = SimilarityOps.ivfAssignDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    // base-model centroids exclude the delta slice by construction
    got.foreach { case (id, c) =>
      assert(id % SimilarityOps.DeltaIngestMod ==
        SimilarityOps.DeltaIngestRem)
      assert(c % 23 == 0 &&
        c % SimilarityOps.DeltaIngestMod != SimilarityOps.DeltaIngestRem,
        s"cell $c is not a base centroid")
    }
  }
}
