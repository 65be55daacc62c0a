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
  * signature algebra as d06 (computed via the expanded per-band form —
  * a stream cannot take the persist barrier the batch path uses, and
  * referencing an intermediate sig column would inline the whole
  * signature computation into every band), grouped by
  * (band, band-signature), and a `flatMapGroupsWithState` bucket emits
  * an id-only candidate pair for each co-bucketed predecessor — exactly
  * the pairs the batch self-join produces. State per bucket is a
  * Vector[Long] of member ids (shingle sets are NOT carried: the
  * verify-stage jaccard re-derives them with one batch join after the
  * stream completes, the same shape as the batch verify).
  *
  * `maxBucket` caps bucket state (quadratic-stage backstop): once a
  * bucket is full, later arrivals emit no pairs in it. At any corpus
  * where no bucket can exceed the cap (every test SF: corpus ≤ cap)
  * this is provably a no-op and the stream equals the uncapped batch
  * algebra — which is what the q51 oracle asserts. Beyond that, the
  * capped stream keeps pairs it already emitted (a stream cannot
  * retro-drop them), whereas the batch hot-bucket cutoff drops the
  * whole bucket; both are documented recall-loss modes of the same
  * backstop.
  *
  * Production note: bucket state never expires here (NoTimeout) — the
  * gate query runs one bounded AvailableNow pass. A 100 TB firehose
  * bounds it the sessionize way: watermark the ingest timestamp and
  * evict bucket members via event-time timeout, accepting that only
  * documents within the horizon can match (the standard streaming-dedup
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

  final case class BandedDoc(band: Int, bsig: Long, doc_id: Long)
  final case class Bucket(members: Vector[Long])
  final case class IdPair(id_a: Long, id_b: Long)

  /** Id-only candidate pairs from a (doc_id, text) stream — every pair
    * of documents sharing a band bucket, id_a < id_b. Pairs colliding
    * in several bands emit once per band; dedup downstream. */
  def nearDupCandidates(
      docs: DataFrame, maxBucket: Int = 5000): Dataset[IdPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    docs
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .select(col("doc_id"),
        posexplode(expr(DedupOps.portableBandsDirectSql))
          .as(Seq("band", "bsig")))
      .select(col("band").cast("int").as("band"), col("bsig"), col("doc_id"))
      .as[BandedDoc]
      .groupByKey(r => (r.band, r.bsig))
      .flatMapGroupsWithState[Bucket, IdPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          var members = state.getOption.map(_.members).getOrElse(Vector.empty)
          // membership as a Set, rebuilt ONCE per invocation (O(size)),
          // so per-arrival checks are O(1) — a Vector.contains per
          // arrival is O(size) and makes bucket maintenance quadratic
          // across a full micro-batch even when nothing is emitted
          val seen = scala.collection.mutable.HashSet.from(members)
          val out = Vector.newBuilder[IdPair]
          rows.foreach { r =>
            if (members.size < maxBucket && seen.add(r.doc_id)) {
              members.foreach { mid =>
                if (mid < r.doc_id) out += IdPair(mid, r.doc_id)
                else out += IdPair(r.doc_id, mid)
              }
              members = members :+ r.doc_id
            }
          }
          state.update(Bucket(members))
          out.result().iterator
      }
  }

  /** The streaming near-dup pipeline as a correctness-gate query: the
    * documents parquet as a file-source stream → banded stateful
    * candidate generation → (batch) pair dedup + exact-jaccard verify
    * joined back against the corpus. The candidate algebra is
    * byte-identical to d06's at gate scale (see the cap note above), so
    * the batch d06 DuckDB oracle must hash-match the STREAMING result
    * — stream == batch, checked by the driver. */
  def nearDupStreamed(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val docsStream = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .select("doc_id", "text")
    val pairs = StreamRun.toCompletion(
      nearDupCandidates(docsStream).toDF(), "graft_stream_neardup")
      .dropDuplicates("id_a", "id_b")
    val sh = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), Shingles.wordShingles("text", 4).as("sh"))
    pairs
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          size(array_union(col("sa.sh"), col("sb.sh"))), 4).as("jaccard"))
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
