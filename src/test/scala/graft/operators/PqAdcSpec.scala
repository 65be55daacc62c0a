package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s10 (ADC) vs s06 (reconstruction) agreement: the two score the SAME
  * quantity — dot(q, reconstruction) / (|q|·|reconstruction|) — via
  * different summation orders, so their rounded cosines must agree to
  * float-fold jitter and their neighbor SETS must match wherever the
  * rounded scores are distinct. This is the spec that licenses calling
  * ADC "s06's production serving form" rather than a new metric. */
class PqAdcSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("ADC reproduces the reconstruction scoring pairwise") {
    Persists.scoped {
      // k large enough to cover every corpus vector: full rankings, so
      // the comparison is over ALL pairs, not a top-k frontier
      val n = graft.sources.Tables.rowCount(spark, sfDir, "embeddings").toInt
      def scores(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
      val rec = scores(SimilarityOps.pqTopK(spark, sfDir, k = n))
      val adc = scores(SimilarityOps.pqAdcTopK(spark, sfDir, k = n))
      assert(rec.keySet == adc.keySet, "pair sets differ")
      val maxDiff = rec.map { case (k, v) => math.abs(v - adc(k)) }.max
      // both sides round(..., 4): fold-order jitter (~1e-15 relative)
      // only shows when a true value sits within jitter of a 0.00005
      // boundary — then the two engines may round a half-step apart
      assert(maxDiff <= 1e-4 + 1e-12,
        f"ADC diverges from reconstruction scoring: max |Δcosine| = $maxDiff%.6g")
      val disagreements = rec.count { case (k, v) => v != adc(k) }
      // knife-edge roundings must be rare or the "same quantity" claim
      // is wrong, not just jittery
      assert(disagreements <= rec.size / 1000,
        s"$disagreements of ${rec.size} pairs rounded apart")
    }
  }
}
