package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t27 Zipf slope: hand-checked OLS, the flat-vs-zipfian contrast the
  * operator exists to detect, and the degenerate-vocabulary edge. */
class ZipfSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(rows: Seq[(String, String)]) = {
    val s = spark
    import s.implicits._
    TextOps.zipfSlopeOn(rows.toDF("source", "text"))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("slope matches the closed-form OLS on hand counts") {
    // counts a=4, b=2, c=1 -> ranks 1,2,3
    val m = run(Seq(("A", "a a a a b b c")))
    val pts = Seq((math.log(1.0), math.log(4.0)),
      (math.log(2.0), math.log(2.0)), (math.log(3.0), math.log(1.0)))
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = m("A")
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - slope) < 1e-4)
    // a perfect power law passes through rank 1 at ln(count_1)
    assert(math.abs(r.getDouble(3) -
      ((sy - slope * sx) / n)) < 1e-4)
  }

  test("exact ties rank deterministically by word") {
    // a=2, b=2: rank(a)=1, rank(b)=2 by the word tie-break — any
    // other tie order changes the fit
    val m1 = run(Seq(("A", "a a b b")))
    val m2 = run(Seq(("A", "b b a a")))
    assert(m1("A").getDouble(2) === m2("A").getDouble(2))
  }

  test("zipfian text slopes steeper (more negative) than uniform text") {
    // zipfian: counts 8,4,2,1; uniform: every word once
    val zipf = "z " * 8 + "y " * 4 + "x " * 2 + "w"
    val flat = (1 to 15).map(i => s"u$i").mkString(" ")
    val m = run(Seq(("Z", zipf), ("F", flat)))
    assert(m("Z").getDouble(2) < m("F").getDouble(2))
    assert(m("F").getDouble(2) === 0.0) // all counts 1: flat line
  }

  test("single-word vocabulary emits NULL slope, not Infinity") {
    val m = run(Seq(("S", "only only only")))
    assert(m("S").getLong(1) === 1L)
    assert(m("S").isNullAt(2) && m("S").isNullAt(3))
  }

  test("gate corpus: every source fits with a negative slope") {
    val out = TextOps.zipfSlope(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 20)
    out.foreach(r => assert(r.getDouble(2) < 0.0,
      s"${r.getString(0)} slope ${r.getDouble(2)}"))
  }
}
