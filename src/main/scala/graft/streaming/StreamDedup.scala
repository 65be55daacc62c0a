package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.{DedupOps, Shingles}

/** STREAMING near-duplicate detection: MinHash-banded LSH over an
  * unbounded document stream.
  *
  * The batch dedup (DedupOps) buckets the whole corpus and self-joins
  * within buckets; a stream can't self-join its entire history, so the
  * bucket IS the state: documents are banded with the same portable
  * signature algebra as d06, grouped by (band, band-signature), and a
  * `flatMapGroupsWithState` keeps each bucket's members — every
  * arriving document emits a candidate pair against each co-bucketed
  * predecessor, exactly the pairs the batch self-join produces. Bucket
  * state is capped at `maxBucket` members (the hot-bucket cutoff's
  * streaming form: a boilerplate mega-bucket stops accumulating instead
  * of going quadratic).
  *
  * Production note: state here never expires (NoTimeout) — the gate
  * query runs one bounded AvailableNow pass. A 100 TB firehose bounds
  * it the sessionize way: watermark the ingest timestamp and evict
  * bucket members via event-time timeout, accepting that only documents
  * within the horizon can match (the standard streaming-dedup
  * trade-off, as in dropDuplicatesWithinWatermark).
  */
object StreamDedup {

  /** documents.parquet physical schema. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  final case class BandedDoc(band: Int, bsig: Long, doc_id: Long, sh: Seq[String])
  final case class Bucket(members: Vector[(Long, Seq[String])])
  final case class CandPair(
      id_a: Long, id_b: Long, sh_a: Seq[String], sh_b: Seq[String])

  /** Candidate pairs from a (doc_id, text) stream — every pair of
    * documents sharing a band bucket, id_a < id_b, with both shingle
    * sets carried for downstream verification. Pairs colliding in
    * several bands emit once per band; dedup downstream. */
  def nearDupCandidates(
      docs: DataFrame, maxBucket: Int = 5000): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    docs
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .withColumn("sig", expr(DedupOps.portableSigSql))
      .select(col("doc_id"), col("sh"),
        posexplode(expr(DedupOps.portableBandSql)).as(Seq("band", "bsig")))
      .select(col("band").cast("int").as("band"), col("bsig"),
        col("doc_id"), col("sh"))
      .as[BandedDoc]
      .groupByKey(r => (r.band, r.bsig))
      .flatMapGroupsWithState[Bucket, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          var members = state.getOption.map(_.members).getOrElse(Vector.empty)
          val out = Vector.newBuilder[CandPair]
          rows.foreach { r =>
            if (members.size < maxBucket && !members.exists(_._1 == r.doc_id)) {
              members.foreach { case (mid, msh) =>
                if (mid < r.doc_id) out += CandPair(mid, r.doc_id, msh, r.sh)
                else out += CandPair(r.doc_id, mid, r.sh, msh)
              }
              members = members :+ (r.doc_id -> r.sh)
            }
          }
          state.update(Bucket(members))
          out.result().iterator
      }
  }

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The streaming near-dup pipeline as a correctness-gate query: the
    * documents parquet as a file-source stream → banded stateful
    * candidate generation → (batch) pair dedup + exact-jaccard verify
    * on the completed sink. The candidate algebra is byte-identical to
    * d06's, so the DuckDB oracle for the BATCH pipeline must hash-match
    * the STREAMING result — stream == batch, checked by the driver. */
  def nearDupStreamed(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val name = s"graft_stream_neardup_${streamRuns.incrementAndGet()}"
    val docsStream = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .select("doc_id", "text")
    val q = nearDupCandidates(docsStream)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(300000)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        "q51 streaming batch did not finish within 300s")
    }
    q.stop()
    spark.table(name)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_stream_neardup" ->
      ((s: SparkSession, d: String) => nearDupStreamed(s, d)))

  /** The batch d06 oracle verbatim: the stream must reproduce the batch
    * banding algebra pair for pair. */
  def oracleSql: Map[String, String] = Map(
    "q51_stream_neardup" ->
      DedupOps.oracleSql("d06_dedup_minhash_portable"))
}
