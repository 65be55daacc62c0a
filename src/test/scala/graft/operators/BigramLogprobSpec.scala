package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t13 against an independent in-memory bigram scorer, plus the
  * discrimination property that motivates the operator: predictable
  * (repetitive) word transitions must outscore shuffled ones. */
class BigramLogprobSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("matches an independent in-memory bigram scorer") {
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairsOf = (t: String) => t.split(" ").toSeq.sliding(2)
      .collect { case Seq(a, b) => (a, b) }.toSeq
    val allPairs = texts.values.filter(_.split(" ").length >= 2)
      .flatMap(pairsOf).toSeq
    val c2 = allPairs.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = allPairs.groupBy(_._1).map { case (k, v) => k -> v.size }
    val want = texts.collect {
      case (id, t) if t.split(" ").length >= 2 =>
        val ps = pairsOf(t)
        val mean = ps.map(p => math.log(c2(p).toDouble / c1(p._1))).sum / ps.size
        id -> BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
    }
    val got = TextOps.bigramLogprob(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, lp) =>
      assert(math.abs(lp - want(id)) <= 1e-4 + 1e-9,
        s"doc $id: $lp vs ${want(id)}")
    }
  }

  test("predictable transitions outscore shuffled ones") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    // 50 copies of a fixed sentence vs 50 docs of the same WORDS in
    // distinct seeded-shuffle orders: identical unigram stats, but the
    // shuffled docs' transitions are mostly one-off pairs
    val sent = (0 until 12).map(i => s"w$i").mkString(" ")
    def shuf(k: Int) =
      new scala.util.Random(k).shuffle((0 until 12).map(i => s"w$i").toList)
        .mkString(" ")
    val docs = ((0 until 50).map(i => (i.toLong, sent)) ++
      (50 until 100).map(i => (i.toLong, shuf(i)))).toDF("doc_id", "text")
    // score through the same pipeline shape, model from this corpus
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val pairs = ws.select(col("doc_id"), explode(zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val u1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val scored = pairs.join(bg, Seq("w1", "w2")).join(u1, Seq("w1"))
      .groupBy("doc_id").agg(avg(log(col("c2") / col("c1"))).as("lp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fixedMean = (0 until 50).map(i => scored(i.toLong)).sum / 50
    val rotMean = (50 until 100).map(i => scored(i.toLong)).sum / 50
    assert(fixedMean > rotMean + 0.5,
      s"fixed $fixedMean should clearly beat rotated $rotMean")
  }
}
