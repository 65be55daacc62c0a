package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Packing semantics on a hand-computed fixture: fixed token-offset
  * buckets — a document's chunk is its preceding token total div the
  * budget, so a crossing document stays in the slot it started in and
  * an over-budget document leaves a skipped chunk id behind it;
  * streams (sources) pack independently. */
class PackingOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("chunk assignment follows the running-total rule per stream") {
    // budget 100; stream a: 60, 60, 60 -> tok_before 0, 60, 120
    //   -> chunks 0, 0, 1 (doc 2 starts at offset 60 < 100, doc 3 at 120)
    // stream b: 250 (over budget), 10 at offset 250 -> chunks 0, 2
    //   (chunk id 1 is skipped: offsets 100-199 are inside doc 4)
    val d = spark.createDataFrame(Seq(
      (1L, "a", 60L), (2L, "a", 60L), (3L, "a", 60L),
      (4L, "b", 250L), (5L, "b", 10L)
    )).toDF("doc_id", "source", "tokens")
    val got = PackingOps.packSequencesOn(d, budget = 100)
      .select("doc_id", "chunk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 2L))
  }

  test("a shard column splits a source into independent pack streams") {
    val d = spark.createDataFrame(Seq(
      (1L, "a", 0L, 60L), (2L, "a", 0L, 60L),
      (3L, "a", 1L, 60L), (4L, "a", 1L, 60L)
    )).toDF("doc_id", "source", "shard", "tokens")
    val packed = PackingOps.packSequencesOn(d, budget = 100,
      streamCols = Seq("source", "shard"))
    // the full stream key survives into the output (chunk ids are only
    // unique per stream)
    assert(packed.columns.toSeq ==
      Seq("doc_id", "source", "shard", "tokens", "tok_before", "chunk"))
    val got = packed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tok_before")).toMap
    // each shard restarts its running total (docs 3/4 mirror docs 1/2)
    assert(got == Map(1L -> 0L, 2L -> 60L, 3L -> 0L, 4L -> 60L))
  }

  test("a non-last chunk only closes past its budget line") {
    val budget = 500
    val packed = PackingOps.packSequences(
      spark, "/root/testdata/sf0.001", budget = budget)
    import org.apache.spark.sql.functions._
    // cumulative token count at each chunk's end; a chunk closes only
    // when that total has crossed the (chunk+1)*budget line — the
    // invariant that makes the chunks maximal prefix runs
    val perChunk = packed.groupBy("source", "chunk")
      .agg(max(col("tok_before") + col("tokens")).as("cum_end"))
    val lastChunk = packed.groupBy("source")
      .agg(max("chunk").as("last_chunk"))
    val nonLast = perChunk.join(lastChunk, "source")
      .filter(col("chunk") < col("last_chunk"))
      .select("chunk", "cum_end").collect()
    assert(nonLast.nonEmpty)
    nonLast.foreach { r =>
      val (c, cumEnd) = (r.getAs[Long]("chunk"), r.getAs[Long]("cum_end"))
      assert(cumEnd >= (c + 1) * budget, s"chunk $c closed at $cumEnd")
    }
  }
}
