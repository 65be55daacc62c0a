package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** g04 contract: the LSH-candidate mutual-kNN graph recovers most of
  * the exact graph's edges (the d02/s02 recall discipline — the gate
  * entry is rows-only, so the bound lives here), and candidate pairs
  * stay far below the n² the exact builder scores. */
class KnnGraphRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

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

  private def vecs = SimilarityOps.vecs(spark, sfDir)

  test("LSH strong-edge recall >= 0.8 against the exact strong graph") {
    // the g04 configuration: strong edges only (cosine >= 0.4), short
    // signatures × many tables — the regime where hyperplane collision
    // probability is high for the edges the consumer keeps. Recall on
    // the UNFLOORED graph is structurally poor on this corpus (its kNN
    // edges sit at ~60-80° where 8-plane signatures rarely collide;
    // measured 0.15) — that is the documented reason g04 targets the
    // strong graph, not a tunable.
    val exact = GraphOps.mutualKnnEdgesOn(vecs, minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = GraphOps.mutualKnnEdgesApproxOn(vecs,
        corpusRows = graft.sources.Tables.rowCount(spark, sfDir,
          "embeddings"),
        minCosine = 0.4, tables = 16, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"edges exact=${exact.size} approx=${approx.size} " +
      f"recall=$recall%.3f")
    assert(exact.nonEmpty && recall >= 0.8,
      f"strong-edge recall $recall%.3f below 0.8")
  }
}
