package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q142 time-weighted average (hand step-function integral vs the
  * plain mean) and t33 canonicalization (planted variants collapse to
  * the clean hash and flag as changed). */
class TwapCanonSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("q142: twa equals the hand step integral, not the plain mean") {
    val rows = EventOps.timeWeightedAvg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      if (r.getLong(2) == 0L) assert(r.isNullAt(3))
    }
    // recompute one type by hand from the raw events
    val raw = graft.sources.Tables.load(spark, sf, "events")
      .selectExpr("event_id", "event_type", "value", "unix_micros(ts) AS us")
      .collect()
      .groupBy(_.getString(1))
    val expected = raw.map { case (tpe, es) =>
      val sorted = es.sortBy(e => (e.getLong(3), e.getLong(0)))
      val span = sorted.last.getLong(3) - sorted.head.getLong(3)
      val num = sorted.sliding(2).collect { case Array(a, b) =>
        a.getDouble(2) * (b.getLong(3) - a.getLong(3))
      }.sum
      tpe -> (if (span == 0) None
              else Some(math.rint(num / span * 1e4) / 1e4))
    }
    rows.foreach { r =>
      expected(r.getString(0)) match {
        case Some(v) => assert(math.abs(r.getDouble(3) - v) <= 1e-4,
          s"${r.getString(0)}: ${r.getDouble(3)} vs $v")
        case None => assert(r.isNullAt(3))
      }
    }
  }

  test("t33: planted variants collapse to the clean canonical hash") {
    val rows = TextOps.canonicalize(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getLong(3))).toMap
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val (_, changed, len) = rows(id)
      if (id % 6 <= 2) {
        assert(changed, s"planted variant $id must flag changed")
        // canonical form strips the plant back to the clean text
        assert(len == text.length)
      } else assert(!changed)
    }
    // a planted-uppercase doc and its clean sibling with equal text
    // hash equally: verify via recomputation on one example
    val (id0, t0) = texts.find(_._1 % 6 == 0).get
    val df = spark.sql(s"SELECT md5('${t0.replace("'", "''")}') AS h")
    assert(rows(id0)._1 == df.collect().head.getString(0),
      "upper-cased plant canonicalizes to the clean text's md5")
  }
}
