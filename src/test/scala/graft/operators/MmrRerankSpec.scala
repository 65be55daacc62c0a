package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s13 contract: λ=1 degenerates to plain relevance ranking, a lower λ
  * breaks up a redundant cluster, and the greedy selection is
  * deterministic under any input partitioning. */
class MmrRerankSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** One query's candidates: a redundant near-identical cluster A
    * (ids 1,2,3 — highest relevance) and a distinct direction B
    * (id 4 — slightly less relevant, nearly orthogonal to A). */
  private def cands = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, 1L, 0.90, Seq(1.0, 0.00, 0.0)),
      (0L, 2L, 0.89, Seq(1.0, 0.01, 0.0)),
      (0L, 3L, 0.88, Seq(1.0, 0.02, 0.0)),
      (0L, 4L, 0.80, Seq(0.0, 1.00, 0.0)))
      .toDF("query_id", "neighbor_id", "cosine", "v")
      .repartition(3) // selection must not depend on arrival order
  }

  test("lambda=1 is plain top-k by (cosine desc, id)") {
    val out = SimilarityOps.mmrRerankOn(cands, k = 3, lambda = 1.0)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("lambda=0.5 promotes the distinct direction over a redundant twin") {
    val out = SimilarityOps.mmrRerankOn(cands, k = 2, lambda = 0.5)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    // first pick is pure relevance (1); second pick: candidate 2's
    // redundancy ~1.0 crushes its score, candidate 4 wins on diversity
    assert(out == Seq(1L, 4L))
  }

  test("selection is deterministic across runs and gate entry returns k per query") {
    val a = SimilarityOps.mmrRerank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = SimilarityOps.mmrRerank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
    val perQuery = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQuery.values.toSet == Set(10))
  }
}
