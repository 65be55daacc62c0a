package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t29 token-mass concentration: closed-form Gini extremes (uniform →
  * 0, single-holder → (n−1)/n), a hand-computed mixed case, and the
  * top-decile cutoff arithmetic. */
class GiniSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    TextOps.giniConcentrationOn(rows.toDF("source", "doc_id", "x"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
  }

  test("uniform source has gini 0; single-holder has (n-1)/n") {
    val uniform = (1L to 10L).map(i => ("u", i, 50L))
    val single = (1L to 10L).map(i => ("s", i, if (i == 10L) 500L else 0L))
    val m = run(uniform ++ single)
    assert(m("u") == ((10L, 500L, 0.0, 0.1)))
    // top decile of 10 docs = 1 doc = the 50-token doc → share 0.1
    assert(m("s")._3 == 0.9) // (n-1)/n
    assert(m("s")._4 == 1.0) // the one holder IS the top decile
  }

  test("hand-computed 4-doc gini and a ceil cutoff") {
    // x = 1,2,3,4 ascending: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    val m = run(Seq(("h", 1L, 1L), ("h", 2L, 2L), ("h", 3L, 3L), ("h", 4L, 4L)))
    assert(m("h")._3 == 0.25)
    // ceil(4/10) = 1 top doc → share 4/10
    assert(m("h")._4 == 0.4)
  }

  test("t34: vocab overlap jaccard from hand-built top-k sets") {
    // k=2 tops: a = {x, y} (w drops at rank 3), b = {x, z},
    // c = {p, q} — a∩b = {x} → jaccard 1/(4−1); a/b∩c = ∅ → no row
    val s = spark
    import s.implicits._
    val rows = TextOps.vocabOverlapOn(Seq(
      ("a", "x x x y y w"), ("b", "x x x x x z z z z v"),
      ("c", "p p q q")).toDF("source", "text"), k = 2).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 1L)
    assert(r.getDouble(3) == math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("rank ties break on doc_id identically in both orders") {
    // all-equal counts: any tie order gives gini 0 — determinism check
    val m = run((1L to 23L).map(i => ("t", i, 7L)))
    assert(m("t")._3 == 0.0)
    // ceil(23/10) = 3 docs → 21/161
    assert(m("t")._4 == math.rint(21.0 / 161.0 * 1e6) / 1e6)
  }
}
