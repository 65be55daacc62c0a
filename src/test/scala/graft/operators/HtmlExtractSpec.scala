package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The t35 extraction contract: boilerplate containers (head, script,
  * style, nav, footer) never leak into the clean text, entities
  * decode, whitespace collapses — and extraction moves the downstream
  * quality signals (t01) that raw markup poisons, which is the whole
  * reason the pass runs first in a web-corpus pipeline. */
class HtmlExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def extract(html: String): (String, Long, Long) = {
    val s = spark
    import s.implicits._
    val r = TextOps.htmlExtractOn(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("boilerplate containers drop; content and entities survive") {
    val (clean, nRaw, nClean) = extract(
      "<html><head><title>SEO Bait</title><style>p{color:red}</style>" +
        "</head><body><nav>Home | About | Login</nav>" +
        "<h1>Real &amp; honest title</h1>" +
        "<p>the actual   article body</p>" +
        "<script>trackUser();</script>" +
        "<footer>cookie notice legal spam</footer></body></html>")
    assert(clean == "Real & honest title the actual article body")
    assert(nClean < nRaw)
    // every boilerplate class is provably gone
    Seq("SEO", "color", "Login", "trackUser", "cookie").foreach(b =>
      assert(!clean.contains(b), s"boilerplate '$b' leaked"))
  }

  test("plain text passes through; stray tags strip; quotes decode") {
    assert(extract("no markup at all")._1 == "no markup at all")
    assert(extract("a <b>bold</b> move")._1 == "a bold move")
    assert(extract("say &quot;hi&gt;&quot; now")._1 == "say \"hi>\" now")
  }

  test("extraction repairs the t01 quality signals markup poisons") {
    val s = spark
    import s.implicits._
    val body = "the quick brown fox jumps over the lazy dog " * 3
    val html = "<html><head><style>body{margin:0;padding:0}</style></head>" +
      "<body><nav><a href=\"/a/b/c\">x</a></nav><p>" + body.trim +
      "</p><script>function f(){return 42;}</script></body></html>"
    def stats(text: String): (Double, Double) = {
      val r = TextOps.qualityStatsOn(
        Seq((1L, text)).toDF("doc_id", "text")).collect().head
      (r.getDouble(3), r.getDouble(4)) // (avg_word_len, stopword_ratio)
    }
    val (rawLen, rawStop) = stats(html)
    val (cleanLen, cleanStop) = stats(extract(html)._1)
    // markup inflates word length (tag soup tokens) and dilutes the
    // stopword ratio; extraction must move BOTH toward natural text
    assert(cleanLen < rawLen, "avg word length should drop after strip")
    assert(cleanStop > rawStop, "stopword ratio should rise after strip")
  }

  test("fixture plant: clean text is the heading plus the source text") {
    val sf = "/root/testdata/sf0.001"
    val got = TextOps.htmlExtract(spark, sf)
      .select("doc_id", "clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> s"Doc ${r.getLong(0)} & notes ${r.getString(1)}")
      .toMap
    assert(got.nonEmpty && got == want)
  }
}
