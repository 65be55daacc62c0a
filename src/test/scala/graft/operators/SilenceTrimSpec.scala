package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** m13 silence trimming: hand-placed quiet frames split the spans,
  * uniform media stay whole, and the threshold binds on gate data. */
class SilenceTrimSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(items: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    MultimodalOps.silenceTrimOn(items.toDF("media_id", "txt"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
  }

  private val loud = "z" * 64
  private val quiet = "a" * 64

  test("a quiet frame splits the active region into two spans") {
    // z z a z: frame 2 is ~20% below the item mean -> silent
    val out = run(Seq((1L, loud + loud + quiet + loud)))
    assert(out === Seq((1L, 0, 1, 2), (1L, 3, 3, 1)))
  }

  test("uniform media trim nothing: one span covering every frame") {
    val out = run(Seq((1L, "m" * 256)))
    assert(out === Seq((1L, 0, 3, 4)))
  }

  test("leading and trailing silence are trimmed away entirely") {
    val out = run(Seq((1L, quiet + loud + loud + quiet)))
    assert(out === Seq((1L, 1, 2, 2)))
  }

  test("incomplete tails drop; sub-frame media vanish") {
    val out = run(Seq((1L, loud + "tail"), (2L, "short")))
    assert(out === Seq((1L, 0, 0, 1)))
  }

  test("gate corpus: the 0.98-of-mean cut binds (some frames trimmed)") {
    val spans = MultimodalOps.silenceTrim(spark, "/root/testdata/sf0.001")
      .collect()
    assert(spans.nonEmpty)
    val kept = spans.map(_.getInt(3).toLong).sum
    // total complete frames across eligible docs
    val total = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("sum(length(text) div 64) AS f")
      .collect().head.getLong(0)
    assert(kept < total, s"nothing trimmed: $kept of $total")
    assert(kept > total / 2, s"over-trimmed: $kept of $total")
  }
}
