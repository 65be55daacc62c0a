package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming near-dup bucket state must pair a document with
  * co-bucketed documents from EARLIER micro-batches (the property a
  * batch self-join can't give a stream), and the bucket cap must stop
  * a hot bucket from accumulating. */
class StreamDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sdedup-ckpt").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("near-dups pair across micro-batches; the bucket cap stops a hot bucket") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again"
    val src = MemoryStream[(Long, String)]
    val q = StreamDedup
      .nearDupCandidates(src.toDF().toDF("doc_id", "text"), maxBucket = 2)
      .writeStream.format("memory").queryName("sdedup_pairs")
      .outputMode("append").start()
    try {
      src.addData((1L, text), (50L, "utterly unrelated words here nothing shared at all"))
      q.processAllAvailable()
      val afterBatch1 = spark.sql("SELECT count(*) c FROM sdedup_pairs")
        .collect().head.getLong(0)
      assert(afterBatch1 == 0, "nothing to pair with in batch 1")

      // batch 2: identical doc arrives LATER — must pair with batch 1's
      src.addData((2L, text))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM sdedup_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"expected cross-batch pair, got $pairs")

      // batch 3: bucket already at cap=2 — a third copy adds nothing
      src.addData((3L, text))
      q.processAllAvailable()
      val after = spark.sql("SELECT DISTINCT id_a, id_b FROM sdedup_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == Set((1L, 2L)),
        s"capped bucket must stop accumulating, got $after")
    } finally q.stop()
  }
}
