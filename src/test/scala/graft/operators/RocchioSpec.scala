package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s31 Rocchio feedback: β = 0 degenerates to the s01 brute ranking
  * (cosine is scale-invariant and the 8-dp re-entry cannot move a
  * 4-dp rank on this corpus), and with the default β the moved query
  * is ATTRACTED to its feedback set. */
class RocchioSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("beta = 0 reproduces the s01 brute ranking") {
    val plain = ranks(SimilarityOps.bruteForceTopK(spark, sf))
    val rocchio = ranks(SimilarityOps.rocchioTopK(spark, sf, beta = 0.0))
    assert(rocchio == plain)
  }

  test("feedback docs are attracted into the expanded top-k") {
    val fb = SimilarityOps.bruteForceTopK(spark, sf, k = 5).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val after = SimilarityOps.rocchioTopK(spark, sf).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    fb.foreach { case (q, docs) =>
      val kept = docs.intersect(after(q)).size
      assert(kept >= 3,
        s"query $q kept only $kept of 5 feedback docs after expansion")
    }
  }

  test("two runs are identical (no aggregation-order jitter)") {
    val a = SimilarityOps.rocchioTopK(spark, sf).collect().map(_.toSeq).toSet
    val b = SimilarityOps.rocchioTopK(spark, sf).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
