package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BM25 cross-checked against an independent plain-Scala scorer over
  * the collected corpus — the distributed pipeline (array-filter →
  * explode → two aggregations → broadcast joins) must reproduce the
  * textbook formula exactly, including the rounded tie-break order. */
class SearchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  test("top-k matches an independent in-memory BM25 scorer") {
    val terms = Seq("vector", "stream", "merge")
    val k = 20
    val corpus = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap

    val n = corpus.size.toDouble
    val dl = corpus.map { case (id, toks) => id -> toks.size.toDouble }
    val avgdl = dl.values.sum / n
    val tf = corpus.map { case (id, toks) =>
      id -> terms.map(t => t -> toks.count(_ == t).toDouble)
        .filter(_._2 > 0).toMap
    }.filter(_._2.nonEmpty)
    val df = terms.map(t => t -> tf.values.count(_.contains(t)).toDouble).toMap
    val (k1, b) = (SearchOps.K1, SearchOps.B)
    val expected = tf.map { case (id, tfs) =>
      val s = tfs.map { case (t, f) =>
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (f * (k1 + 1)) / (f + k1 * (1 - b + b * dl(id) / avgdl))
      }.sum
      id -> BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (id, i + 1, s) }

    val got = SearchOps.bm25TopK(spark, sfDir, terms, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

    assert(got == expected)
  }

  test("every returned doc actually contains a query term") {
    val hits = SearchOps.bm25TopK(spark, sfDir).collect().map(_.getLong(0)).toSet
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    hits.foreach { id =>
      val toks = texts(id).split(" ", -1).toSet
      assert(Seq("vector", "stream", "merge").exists(toks.contains), s"doc $id")
    }
  }
}
