package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** g31 link-prediction AUC: hand-built holdout with a known perfect
  * separation and a known tie, plus gate-corpus sanity. */
class LinkPredAucSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("perfect separation on cn/aa, exact tie on jac (= 0.5)") {
    val s = spark
    import s.implicits._
    // K5 on 1..5 with (1,2) held out; disjoint path 6-7-8 in train.
    // candidates: (1,2) cn=3 lbl=1; (6,8) cn=1 lbl=0 -> cn and aa
    // separate perfectly; BOTH pairs have jac = 1.0 -> tie -> 0.5
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val pairs = (k5.map { case (a, b) =>
      (a, b, a == 1L && b == 2L)
    } ++ Seq((6L, 7L, false), (7L, 8L, false)))
      .toDF("a", "b", "is_test")
    val r = GraphOps.linkPredAucOn(pairs).collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 1.0) // auc_cn
    assert(r.getDouble(3) === 1.0) // auc_aa
    assert(r.getDouble(4) === 0.5) // auc_jac: the tie-average term
  }

  test("an inverted predictor scores 0: worst-case AUC") {
    val s = spark
    import s.implicits._
    // path 1-2-3 held out at (1,3)? no: make the TRUE pair score LOWER
    // than the negative. K5 with (1,2) test (cn=3) plus a train
    // K6-clique 10..15 missing (10,11): candidate (10,11) has cn=4 >
    // 3 but lbl=0 -> cn ranks the negative above the positive
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val k6 = for (a <- 10L to 15L; b <- (a + 1) to 15L
      if !(a == 10L && b == 11L)) yield (a, b)
    val pairs = (k5.map { case (a, b) => (a, b, a == 1L && b == 2L) }
      ++ k6.map { case (a, b) => (a, b, false) })
      .toDF("a", "b", "is_test")
    val r = GraphOps.linkPredAucOn(pairs).collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 0.0) // cn: negative (cn=4) beats positive
  }

  test("gate corpus: AUCs well-formed and the run is deterministic") {
    val sf = "/root/testdata/sf0.001"
    val a = GraphOps.linkPredAuc(spark, sf).collect().head
    val b = GraphOps.linkPredAuc(spark, sf).collect().head
    assert(a.toSeq === b.toSeq)
    assert(a.getLong(0) > 0 && a.getLong(1) > 0)
    (2 to 4).foreach { i =>
      val v = a.getDouble(i)
      assert(v >= 0.0 && v <= 1.0)
    }
  }
}
