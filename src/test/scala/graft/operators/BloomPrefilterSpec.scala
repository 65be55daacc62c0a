package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c12's contract, in three parts: (1) the bloom-prefiltered
  * decontamination equals the exact c04 form row-for-row (the lossless
  * prefilter claim — also gated by the shared oracle, but pinned here
  * at spec granularity); (2) the filter admits EVERY key that was
  * added (no false negatives — the property that makes the prefilter
  * safe at all); (3) the prefilter actually prunes: bloom-positive
  * train rows are close to the true-match count, far below the
  * exploded train-side stream the c04 shape would shuffle. */
class BloomPrefilterSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    graft.functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("bloom-prefiltered decontamination equals the exact form") {
    val exact = rows(CurationOps.decontaminate(spark, sfDir))
    val bloomed = rows(CurationOps.decontaminateBloom(spark, sfDir))
    assert(exact.nonEmpty, "fixture must produce contaminated pairs")
    assert(bloomed == exact)
  }

  test("no false negatives: every added key probes positive") {
    // distributed build over one side, distributed probe of the SAME
    // keys — a single missed key breaks the prefilter's losslessness
    val keys = spark.range(0, 5000, 1, 8)
      .selectExpr("concat('k-', md5(cast(id AS STRING))) AS key")
    val bf = keys.agg(expr(
      "graft_bloom_agg(key, 5000L, CAST(0.01 AS DOUBLE))").as("bf"))
    val missed = keys.crossJoin(broadcast(bf))
      .filter(!expr("graft_bloom_contains(bf, key)"))
      .count()
    assert(missed == 0L)
  }

  test("false-positive rate honors the sizing contract") {
    val added = spark.range(0, 10000, 1, 8)
      .selectExpr("concat('in-', cast(id AS STRING)) AS key")
    val absent = spark.range(0, 10000, 1, 8)
      .selectExpr("concat('out-', cast(id AS STRING)) AS key")
    val bf = added.agg(expr(
      "graft_bloom_agg(key, 10000L, CAST(0.01 AS DOUBLE))").as("bf"))
    val fp = absent.crossJoin(broadcast(bf))
      .filter(expr("graft_bloom_contains(bf, key)"))
      .count()
    // 1% nominal; 3x headroom keeps the bound meaningful but unflaky
    assert(fp <= 300L, s"false positives $fp exceed 3x the 1% sizing")
  }

  test("the prefilter prunes the train-side stream to near the matches") {
    val spark0 = spark
    graft.functions.GraftFunctions.register(spark0)
    val d = graft.sources.Tables.load(spark0, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        Shingles.wordShingles("text", 8).as("sh"))
    val evalSh = d.filter(col("source") === "src0")
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("key"))
    val trainSh = d.filter(col("source") =!= "src0")
      .select(col("doc_id").as("train_id"), explode(col("sh")).as("key"))
    val nEval = evalSh.count()
    val bf = evalSh.agg(expr(
      s"graft_bloom_agg(key, ${nEval}L, CAST(0.01 AS DOUBLE))").as("bf"))
    val total = trainSh.count()
    val candidates = trainSh.crossJoin(broadcast(bf))
      .filter(expr("graft_bloom_contains(bf, key)")).count()
    val trueMatches = trainSh.join(
      evalSh.select("key").distinct(), Seq("key"), "left_semi").count()
    assert(candidates >= trueMatches, "prefilter may never drop a match")
    assert(candidates <= trueMatches + (total - trueMatches) / 20 + 50,
      s"candidates=$candidates vs matches=$trueMatches of $total — " +
        "prefilter admits far more than fpp of the non-matches")
    assert(candidates < total,
      "prefilter must prune something on the fixture")
  }
}
