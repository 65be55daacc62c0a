package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q145 Wilson bounds (closed-form check, coverage ordering) and s33
  * kNN classifier eval (majority semantics, tie order, self-label
  * compare). */
class WilsonKnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q145: bounds bracket the rate and match the closed form") {
    val rows = EventOps.wilsonConversion(spark, sf).collect()
    assert(rows.nonEmpty)
    val z = 1.96; val z2 = z * z
    rows.foreach { r =>
      val (views, buys) = (r.getLong(1), r.getLong(2))
      val n = (views + buys).toDouble
      if (n > 0) {
        val p = buys / n
        val center = (p + z2 / (2 * n)) / (1 + z2 / n)
        val hw = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) /
          (1 + z2 / n)
        assert(math.abs(r.getDouble(4) - (center - hw)) < 1e-6)
        assert(math.abs(r.getDouble(5) - (center + hw)) < 1e-6)
        assert(r.getDouble(4) >= -1e-9 && r.getDouble(5) <= 1 + 1e-9,
          "wilson bounds live in [0, 1]")
        assert(r.getDouble(4) <= r.getDouble(3) + 1e-6 ||
          buys == 0, "lower bound does not exceed the rate")
      }
    }
  }

  test("q148: psi contributions are sign-correct and sum near-zero on no-drift") {
    val rows = EventOps.psiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nr, nc) = (r.getLong(2), r.getLong(3))
      val c = r.getDouble(4)
      // (p−q)·ln(p/q) is ALWAYS ≥ 0 per bin (same sign factors);
      // equality only when the smoothed shares agree
      assert(c >= -1e-9, s"bin contribution $c negative at nr=$nr nc=$nc")
    }
    // the synthetic stream is stationary, but sf0.001 has only a few
    // hundred events per type across 20 bins — SAMPLING noise alone
    // reads ~0.2 PSI at that size (measured 0.207 on one type), which
    // is itself the textbook warning about PSI on thin windows; the
    // bound here rules out gross drift, not noise
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val psi = rs.map(_.getDouble(4)).sum
      assert(psi < 0.5, s"type $t drifted: psi=$psi on stationary data")
    }
  }

  test("s33: prediction is the top-5 majority with smaller-label ties") {
    val s = spark
    import s.implicits._
    val rows = SimilarityOps.knnClassifierEval(spark, sf).collect()
    assert(rows.length == 50)
    // recompute one query's vote independently from the brute ranks
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val top5 = SimilarityOps.bruteForceTopK(spark, sf, nQueries = 50, k = 5)
      .collect().groupBy(_.getLong(0))
    rows.foreach { r =>
      val votes = top5(r.getLong(0)).map(x => labels(x.getLong(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val best = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      assert(r.getInt(2) == best, s"query ${r.getLong(0)}")
      assert(r.getBoolean(3) == (r.getInt(1) == r.getInt(2)))
    }
  }
}
