package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.operators.{Persists, SimilarityOps}
import graft.sources.{FsUtil, Tables}

/** STREAMING ANN-index maintenance: the s37/s45 ingest-batch loop run
  * as a Structured Streaming job — new vectors land continuously, and
  * a `foreachBatch` sink folds each micro-batch into the serving
  * artifacts with the SAME delta-sized primitives the batch path
  * uses: walk-and-link insertion against the CURRENT graph
  * ([[SimilarityOps.deltaInsertEdgesFor]] — batch N's inserts search
  * the graph that already contains batches 1..N-1, the true
  * incremental semantics a one-shot batch insert can't exercise) and
  * per-batch 2-hop maintenance ([[SimilarityOps.hop2DeltaUpdate]] —
  * whose composition across micro-batches is an IDENTITY:
  * sequential applications land on exactly 2hop(final edge set),
  * StreamAnnMaintainSpec pins frame equality against the
  * from-scratch rebuild). Serving reads the maintained frame with the
  * halved-barrier batched walk (s38's discipline).
  *
  * State lives in driver-held `localCheckpoint`ed frames, truncated
  * per batch — the micro-batch work is |Δ|-sized against cached
  * artifacts, never a corpus rescan, so the loop holds at a 1000×
  * corpus exactly where s37's batch analysis does. Gate entry is
  * rows-only by design (the walk has no SQL twin); the maintenance
  * contracts are spec-pinned. */
object StreamAnnMaintain {

  val deltaSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType))))

  /** The ingest-feed fixture: the gate's delta vectors
    * (`vec_id % DeltaIngestMod = DeltaIngestRem`) written as `nFiles`
    * range-split parquet files so `maxFilesPerTrigger=1` replays them
    * as that many deterministic micro-batches. Fingerprint-keyed like
    * every index artifact. */
  def deltaStreamPath(
      spark: SparkSession, sfDir: String, nFiles: Int): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = FsUtil.qualified("target/tmp/graph/deltastream_" +
      FsUtil.sanitize(sfDir) + s"_n${n}_f${nFiles}_$fp")
    if (!FsUtil.exists(spark, dir + "/_SUCCESS"))
      SimilarityOps.vecs(spark, sfDir)
        .filter(pmod(col("vec_id"), lit(SimilarityOps.DeltaIngestMod)) ===
          SimilarityOps.DeltaIngestRem)
        .repartitionByRange(nFiles, col("vec_id"))
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Run the maintenance stream to completion and return the final
    * (1-hop edges, 1∪2-hop frame) pair. Package-visible so the spec
    * can pin the composition identity on the frames themselves. */
  private[streaming] def maintainedFrames(
      spark: SparkSession, sfDir: String, nFiles: Int = 3,
      beam: Int = 8, steps: Int = 6, entries: Int = 4,
      insertDegree: Int = 10,
      timeoutMs: Long = 300000): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    // the stored artifacts every ingest batch starts from
    var curBase = SimilarityOps.vecs(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(SimilarityOps.DeltaIngestMod)) =!=
        SimilarityOps.DeltaIngestRem)
      .localCheckpoint(true)
    var curE = spark.read
      .parquet(SimilarityOps.beamBaseEdgesPath(spark, sfDir))
      .select("src", "dst").localCheckpoint(true)
    var curH = spark.read
      .parquet(SimilarityOps.beamBaseHop2Path(spark, sfDir))
      .select("src", "dst").localCheckpoint(true)
    val feed = spark.readStream
      .schema(deltaSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(deltaStreamPath(spark, sfDir, nFiles))
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the micro-batch runs in a cloned session state — make sure
        // graft_cosine resolves there too
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val b = batch.select("vec_id", "v").localCheckpoint(true)
        if (b.count() > 0) {
          val d = SimilarityOps.deltaInsertEdgesFor(spark, b, curBase,
            curE, beam, steps, entries, insertDegree)
            .localCheckpoint(true)
          // order matters: the 2-hop update reads the PRE-batch curE
          curH = SimilarityOps.hop2DeltaUpdate(curH, curE, d)
            .localCheckpoint(true)
          curE = curE.unionAll(d).localCheckpoint(true)
          curBase = curBase.unionAll(b).localCheckpoint(true)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"ANN maintenance stream did not finish within ${timeoutMs / 1000}s")
    }
    q.stop()
    Persists.releaseAll()
    (curE, curH)
  }

  /** s49: serve the batched walk over the STREAM-maintained frame. */
  def beamMaintainStream(
      spark: SparkSession, sfDir: String,
      nFiles: Int = 3, nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10): DataFrame = {
    val (_, h) = maintainedFrames(spark, sfDir, nFiles, beam, steps,
      entries, insertDegree)
    SimilarityOps.serveWalkOver(spark, sfDir, h, (steps + 1) / 2,
      nQueries, beam, k, entries)
  }

  /** The stored STREAM-maintained 1∪2-hop artifact — the 3-micro-batch
    * ingest fold materialized once (the beamMaintainedHop2Path
    * discipline applied to the streaming fold; what a serving tier
    * reads between stream triggers). Fingerprint-keyed like every
    * index artifact. */
  def streamMaintainedHop2Path(
      spark: SparkSession, sfDir: String, nFiles: Int = 3): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = FsUtil.qualified("target/tmp/graph/streammainthop2_" +
      FsUtil.sanitize(sfDir) + s"_n${n}_f${nFiles}_$fp")
    if (!FsUtil.exists(spark, dir + "/_SUCCESS"))
      maintainedFrames(spark, sfDir, nFiles)._2
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** s49's SERVE-ONLY twin (benched s49i — VERDICT r16 item 3): the
    * batched walk over the STORED stream-maintained artifact, paying
    * none of the per-run stream replay. Identical output to
    * [[beamMaintainStream]] (ServeTwinsSpec pins it). */
  def beamMaintainStreamServed(
      spark: SparkSession, sfDir: String,
      nFiles: Int = 3, nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    val h = graft.operators.Persists.barrier(
      spark.read.parquet(streamMaintainedHop2Path(spark, sfDir, nFiles))
        .select("src", "dst"))
    SimilarityOps.serveWalkOver(spark, sfDir, h, (steps + 1) / 2,
      nQueries, beam, k, entries)
  }

  /** The stored CRUD-stream lifecycle artifacts: (1∪2-hop frame dir,
    * tombstone-manifest dir) — the s51 fold materialized once. */
  def streamLifecyclePaths(
      spark: SparkSession, sfDir: String,
      nFiles: Int = 3): (String, String) = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val base = FsUtil.qualified("target/tmp/graph/streamlife_" +
      FsUtil.sanitize(sfDir) + s"_n${n}_f${nFiles}_$fp")
    if (!FsUtil.exists(spark, base + "/h/_SUCCESS") ||
        !FsUtil.exists(spark, base + "/tomb/_SUCCESS")) {
      val (_, h, tomb) = lifecycleFrames(spark, sfDir, nFiles)
      h.write.mode("overwrite").parquet(base + "/h")
      tomb.write.mode("overwrite").parquet(base + "/tomb")
    }
    (base + "/h", base + "/tomb")
  }

  /** s51's SERVE-ONLY twin (benched s51i): the batched walk over the
    * stored CRUD-stream artifacts, manifest honored merge-on-read.
    * Identical output to [[beamLifecycleStream]]. */
  def beamLifecycleStreamServed(
      spark: SparkSession, sfDir: String,
      nFiles: Int = 3, nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    val (hDir, tombDir) = streamLifecyclePaths(spark, sfDir, nFiles)
    val h = graft.operators.Persists.barrier(
      spark.read.parquet(hDir).select("src", "dst"))
    SimilarityOps.serveWalkOver(spark, sfDir, h, (steps + 1) / 2,
      nQueries, beam, k, entries,
      exclude = Some(spark.read.parquet(tombDir).select("node")))
  }

  val cdcSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType))))

  /** The CRUD feed fixture: the gate's delta vectors as `insert` rows
    * and its tombstone ids (`vec_id % TombstoneMod = 0`) as `delete`
    * rows (v = null — a takedown carries no payload), range-split by
    * vec_id into `nFiles` files so inserts and deletes INTERLEAVE
    * across micro-batches the way a real change feed arrives. */
  def cdcStreamPath(
      spark: SparkSession, sfDir: String, nFiles: Int): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = FsUtil.qualified("target/tmp/graph/cdcstream_" +
      FsUtil.sanitize(sfDir) + s"_n${n}_f${nFiles}_$fp")
    if (!FsUtil.exists(spark, dir + "/_SUCCESS")) {
      val vs = SimilarityOps.vecs(spark, sfDir)
      vs.filter(pmod(col("vec_id"), lit(SimilarityOps.DeltaIngestMod)) ===
          SimilarityOps.DeltaIngestRem)
        .select(lit("insert").as("op"), col("vec_id"), col("v"))
        .unionAll(vs
          .filter(pmod(col("vec_id"), lit(SimilarityOps.TombstoneMod)) === 0)
          .select(lit("delete").as("op"), col("vec_id"),
            lit(null).cast(ArrayType(DoubleType)).as("v")))
        .repartitionByRange(nFiles, col("vec_id"))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** Run the CRUD stream to completion: inserts fold into the edge
    * artifacts exactly as [[maintainedFrames]] does; deletes
    * accumulate in the tombstone manifest (merge-on-read — edge state
    * is NEVER touched by a delete, so the fold of the insert
    * subsequence and the manifest of the delete subsequence commute
    * with any interleaving). Returns (final edges, final 2-hop frame,
    * manifest). */
  private[streaming] def lifecycleFrames(
      spark: SparkSession, sfDir: String, nFiles: Int = 3,
      beam: Int = 8, steps: Int = 6, entries: Int = 4,
      insertDegree: Int = 10,
      timeoutMs: Long = 300000): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    var curBase = SimilarityOps.vecs(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(SimilarityOps.DeltaIngestMod)) =!=
        SimilarityOps.DeltaIngestRem)
      .localCheckpoint(true)
    var curE = spark.read
      .parquet(SimilarityOps.beamBaseEdgesPath(spark, sfDir))
      .select("src", "dst").localCheckpoint(true)
    var curH = spark.read
      .parquet(SimilarityOps.beamBaseHop2Path(spark, sfDir))
      .select("src", "dst").localCheckpoint(true)
    var curTomb = spark.range(0).select(col("id").as("node"))
      .localCheckpoint(true)
    val feed = spark.readStream
      .schema(cdcSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(cdcStreamPath(spark, sfDir, nFiles))
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val b = batch.localCheckpoint(true)
        val ins = b.filter(col("op") === "insert").select("vec_id", "v")
        val del = b.filter(col("op") === "delete")
          .select(col("vec_id").as("node"))
        if (ins.count() > 0) {
          val d = SimilarityOps.deltaInsertEdgesFor(spark, ins, curBase,
            curE, beam, steps, entries, insertDegree)
            .localCheckpoint(true)
          curH = SimilarityOps.hop2DeltaUpdate(curH, curE, d)
            .localCheckpoint(true)
          curE = curE.unionAll(d).localCheckpoint(true)
          curBase = curBase.unionAll(ins).localCheckpoint(true)
        }
        if (del.count() > 0)
          curTomb = curTomb.unionAll(del).distinct().localCheckpoint(true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"ANN CRUD stream did not finish within ${timeoutMs / 1000}s")
    }
    q.stop()
    Persists.releaseAll()
    (curE, curH, curTomb)
  }

  /** s51: the FULL streaming lifecycle serve — the CRUD stream's
    * maintained frame walked batched, its accumulated manifest
    * honored merge-on-read. s47's semantics with BOTH mutation feeds
    * arriving as a stream. */
  def beamLifecycleStream(
      spark: SparkSession, sfDir: String,
      nFiles: Int = 3, nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10): DataFrame = {
    val (_, h, tomb) = lifecycleFrames(spark, sfDir, nFiles, beam, steps,
      entries, insertDegree)
    SimilarityOps.serveWalkOver(spark, sfDir, h, (steps + 1) / 2,
      nQueries, beam, k, entries, exclude = Some(tomb))
  }

  /** s52: streaming IVF assignment maintenance — the s35 incremental
    * assignment run over the SAME CRUD feed the graph family streams
    * ([[cdcStreamPath]]): per micro-batch, inserts are assigned into
    * the FROZEN base-corpus cell model (one broadcast-model codegen'd
    * map — [[SimilarityOps.assignBatchOn]], the exact s35 kernel) and
    * deletes accumulate in the manifest; the final state is the live
    * assignment table. Because assignment is PER-ROW STATELESS
    * against a frozen model, the stream provably equals the batch
    * fold under ANY micro-batching — so unlike the walk entries this
    * streaming query is HASH-GREEN: the oracle is s35's verbatim with
    * the tombstone exclusion appended. */
  def ivfAssignStream(
      spark: SparkSession, sfDir: String, nFiles: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val base = SimilarityOps.vecs(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(SimilarityOps.DeltaIngestMod)) =!=
        SimilarityOps.DeltaIngestRem)
    val rows = Tables.rowCount(spark, sfDir, "embeddings")
    val (centIds, centVecs) =
      SimilarityOps.centroidModel(base, rows, 23)
    var assigned = spark.range(0)
      .select(col("id").as("vec_id"), col("id").as("cent_id"))
      .localCheckpoint(true)
    var tomb = spark.range(0).select(col("id").as("vec_id"))
      .localCheckpoint(true)
    val feed = spark.readStream
      .schema(cdcSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(cdcStreamPath(spark, sfDir, nFiles))
    val q = feed.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val b = batch.localCheckpoint(true)
        val ins = b.filter(col("op") === "insert").select("vec_id", "v")
        val del = b.filter(col("op") === "delete").select("vec_id")
        if (ins.count() > 0)
          assigned = assigned.unionAll(
              SimilarityOps.assignBatchOn(spark, ins, centIds, centVecs))
            .localCheckpoint(true)
        if (del.count() > 0)
          tomb = tomb.unionAll(del).distinct().localCheckpoint(true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(300000)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        "IVF assignment stream did not finish within 300s")
    }
    q.stop()
    Persists.releaseAll()
    assigned.join(tomb, Seq("vec_id"), "left_anti")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rows-only by design (no SQL twin for the walk);
    // StreamAnnMaintainSpec pins the composition identity (per-batch
    // hop2DeltaUpdate folds land on exactly 2hop(final edges)), that
    // every streamed-in vector is wired, and stream(1 micro-batch) ≡
    // the batch s45 maintenance exactly
    "s49_stream_beam_maintain" -> ((s: SparkSession, d: String) =>
      beamMaintainStream(s, d)),
    // rows-only; the CRUD contracts (manifest = the delete
    // subsequence exactly, no deleted id surfaces, the identity
    // survives interleaving) live in StreamAnnMaintainSpec
    "s51_stream_beam_lifecycle" -> ((s: SparkSession, d: String) =>
      beamLifecycleStream(s, d)),
    "s52_stream_ivf_assign" -> ((s: SparkSession, d: String) =>
      ivfAssignStream(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    // per-row-stateless assignment against a frozen model: the stream
    // equals the batch fold under any micro-batching, so s35's oracle
    // pins it exactly, with the streamed deletes excluded at the end
    "s52_stream_ivf_assign" -> SimilarityOps.ivfAssignDeltaOracle(
      s" AND vec_id % ${SimilarityOps.TombstoneMod} <> 0")
  )
}
