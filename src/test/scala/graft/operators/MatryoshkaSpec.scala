package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s29 Matryoshka prefix-dim serve: identity contract, measured
  * prefix-pass recall, and the funnel-correction property. */
class MatryoshkaSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("fetchN >= corpus IS exact brute top-k (identity contract)") {
    val sf = "/root/testdata/sf0.001"
    val brute = SimilarityOps.bruteForceTopK(spark, sf)
      .collect().map(_.toSeq).toSet
    val full = SimilarityOps.matryoshkaTopK(spark, sf, fetchN = 600)
      .collect().map(_.toSeq).toSet
    assert(brute.nonEmpty && full === brute)
  }

  test("prefixDims = full dims degenerates to brute even at small fetchN") {
    // with the whole vector as the "prefix", the coarse order IS the
    // exact order (same kernel, 9-dp vs 4-dp grid only), so the top-10
    // after fetching 50 equals brute exactly — pins that the funnel
    // introduces no ranking distortion of its own
    val sf = "/root/testdata/sf0.001"
    val brute = SimilarityOps.bruteForceTopK(spark, sf)
      .collect().map(_.toSeq).toSet
    val deg = SimilarityOps.matryoshkaTopK(spark, sf, prefixDims = 64)
      .collect().map(_.toSeq).toSet
    assert(deg === brute)
  }

  test("16-dim prefix pass keeps useful recall at fetchN = 50") {
    val sf = "/root/testdata/sf0.001"
    def top(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = top(SimilarityOps.bruteForceTopK(spark, sf))
    val mrl = top(SimilarityOps.matryoshkaTopK(spark, sf))
    val recall = (brute & mrl).size.toDouble / brute.size
    // 16 of 64 dims, 50 of 500 candidates: the synthetic corpus has NO
    // front-loaded (MRL-trained) structure, so this is the hard case —
    // measured 0.44 (sf0.001) / 0.48 (sf0.01)
    assert(recall >= 0.3, s"recall@10 $recall")
  }

  test("rerank corrects a coarse inversion the prefix alone would make") {
    val s = spark
    import s.implicits._
    // query 0; candidate 10 beats candidate 11 on the 2-dim prefix but
    // loses badly on the full vector — with fetchN = 2 both survive the
    // coarse cut and the exact rerank must put 11 first
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 1.0, 1.0)),
      (10L, Seq(1.0, 0.0, -1.0, -1.0)), // prefix-perfect, full-poor
      (11L, Seq(0.9, 0.1, 1.0, 1.0)), // prefix-close, full-near-identical
      (12L, Seq(-1.0, 0.0, 0.0, 0.0))) // filler, never fetched
      .toDF("vec_id", "v")
    val out = SimilarityOps.matryoshkaTopKOn(spark, vecs,
      nQueries = 1, prefixDims = 2, fetchN = 2, k = 2)
      .collect().sortBy(_.getInt(1))
    assert(out.map(_.getLong(2)).toSeq === Seq(11L, 10L))
  }
}
