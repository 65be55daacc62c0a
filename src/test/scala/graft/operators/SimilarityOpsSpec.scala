package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale bounds of the IVF centroid model: the plan-time collect must
  * stay under DefaultMaxCentroids rows regardless of corpus size (the
  * round-3 fixed mod made C = n/23 — ~4% of the corpus to the driver),
  * while the fixed mod below the crossover keeps the sf0.001/0.01/0.1
  * oracles byte-identical. */
class SimilarityOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("centroidModFor keeps the oracle mod at test scale factors") {
    // every driver-checked SF samples vec_id % 23 = 0, matching the
    // hard-coded `% 23` in ivfOracle
    assert(SimilarityOps.centroidModFor(50) == 23)    // sf0.001
    assert(SimilarityOps.centroidModFor(500) == 23)   // sf0.01
    assert(SimilarityOps.centroidModFor(5000) == 23)  // sf0.1
    // exact crossover: n = 23 * 4096 is the last fixed-mod corpus
    assert(SimilarityOps.centroidModFor(23L * 4096) == 23)
    assert(SimilarityOps.centroidModFor(23L * 4096 + 1) > 23)
  }

  test("centroidModFor caps C at DefaultMaxCentroids for any corpus size") {
    for (n <- Seq(100000L, 1000000L, 100000000L, 20000000000L)) {
      val mod = SimilarityOps.centroidModFor(n)
      val c = n / mod
      assert(c <= SimilarityOps.DefaultMaxCentroids,
        s"n=$n mod=$mod gives C=$c > cap")
      // and the cap is used, not wildly undershot (sampling stays dense)
      assert(c >= SimilarityOps.DefaultMaxCentroids / 2,
        s"n=$n mod=$mod gives C=$c — cap badly undershot")
    }
  }

  test("centroid model collect is bounded on a synthetic 1M-row corpus") {
    // 10^6 vectors, 2 dims — the round-3 mod would collect 43478 rows
    val all = spark.range(1000000L)
      .select(col("id").as("vec_id"),
        array(col("id").cast("double"),
          (col("id") % 97).cast("double")).as("v"))
    val (ids, vecs) = SimilarityOps.centroidModel(all, 1000000L, baseMod = 23)
    assert(ids.size <= SimilarityOps.DefaultMaxCentroids,
      s"model has ${ids.size} centroids — driver collect unbounded")
    assert(ids.size == vecs.size)
    // deterministic: sorted by cent_id, every mod'th vector
    val mod = SimilarityOps.centroidModFor(1000000L)
    assert(ids == ids.sorted)
    assert(ids.forall(_ % mod == 0))
  }

  test("s25 recall eval equals the manual join of s01 truth and s05") {
    val sf = "/root/testdata/sf0.001"
    val truth = SimilarityOps.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val approx = SimilarityOps.lshTopKPortable(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val want = truth.groupBy(_._1).view.mapValues { ns =>
      val hits = ns.count(approx.contains).toLong
      (hits, BigDecimal(hits.toDouble / ns.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = SimilarityOps.annRecallEval(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
    // every query graded, recall within [0,1], and the evaluation is
    // non-degenerate on the gate corpus (LSH finds SOMETHING)
    assert(got.keySet == truth.map(_._1).toSet)
    assert(got.values.forall { case (h, r) => h >= 0 && r >= 0 && r <= 1 })
    assert(got.values.map(_._1).sum > 0)
  }

  test("s25i truth-artifact serving equals the inline eval") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val inline = rows(SimilarityOps.annRecallEval(spark, sf))
    val served = rows(SimilarityOps.annRecallEvalFromTruth(spark, sf))
    assert(inline.nonEmpty && inline == served)
  }

  test("s26 drift: per-dim shard means and rounded-operand delta") {
    val s = spark
    import s.implicits._
    // even ids (shard a): dim0 mean 2.0, dim1 mean 0.0
    // odd ids (shard b):  dim0 mean 1.0, dim1 mean 0.5
    val v = Seq(
      (0L, Seq(1.0, 0.0)), (2L, Seq(3.0, 0.0)),
      (1L, Seq(1.0, 1.0)), (3L, Seq(1.0, 0.0)))
      .toDF("vec_id", "v")
    val got = SimilarityOps.embeddingDriftOn(v).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got(0) == (2.0, 1.0, 1.0))
    assert(got(1) == (0.0, 0.5, -0.5))
  }

  test("s27 rrf equals the manual fusion of s01 and s24 rankings") {
    val sf = "/root/testdata/sf0.001"
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Int]("rank")).toMap
    val a = ranks(SimilarityOps.bruteForceTopK(spark, sf))
    val b = ranks(SimilarityOps.projectedTopK(spark, sf))
    val want = (a.keySet ++ b.keySet).map { key =>
      val s = a.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        b.get(key).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      key -> BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = SimilarityOps.rrfFusion(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1),
        r.getDouble(3)))
    got.foreach { case (key, _, rrf) =>
      assert(rrf == want(key), s"$key")
    }
    // per query: exactly topK rows, ranks 1..10, rrf non-increasing
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to 10))
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
  }

  test("s28 balance: census covers the corpus, load factors normalize") {
    val sf = "/root/testdata/sf0.001"
    val got = SimilarityOps.ivfBalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = got.map(_._2).sum
    assert(total == 500L) // every vector lands in exactly one cell
    val c = got.length.toLong
    got.foreach { case (_, n, lf) =>
      val want = BigDecimal(n.toDouble * c / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lf == want)
    }
    // the mean of load factors weighted by population is 1 by
    // construction — sanity that the normalizer is the right one
    val weighted = got.map { case (_, n, lf) => n * lf }.sum / total
    assert(math.abs(weighted - got.map(t => t._2 * t._2).sum.toDouble
      * c / (total.toDouble * total)) < 1e-9)
  }
}
