package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.operators.CdcOps
import graft.sources.{FsUtil, Tables}

/** STREAMING CDC materialization: the q74 merge fed by a change-feed
  * STREAM — the shape a 100 TB table is actually maintained in
  * production: a Debezium/binlog feed lands continuously, a streaming
  * job folds it to latest-state-per-key, and snapshot publishes read
  * that state against the base.
  *
  * The fold is a COMPLETE-mode streaming aggregation (`max_by` over
  * seq — q56's pattern with an LWW aggregate instead of counts):
  * state = one row per TOUCHED key, O(delta) not O(table), and
  * arrival order is irrelevant because max_by is commutative in seq —
  * the fixture is deliberately split into shuffled files replayed one
  * per micro-batch, so a key's delete can arrive batches after (or
  * before) its update and the result cannot change. The publish half
  * (anti join + union against the base) is batch post-processing on
  * the completed state via [[CdcOps.applyLatest]] — exactly how a
  * lakehouse publishes snapshots: fold continuously, publish at
  * checkpoints. Gated by q74's DuckDB oracle verbatim.
  *
  * On an endless feed the complete-mode table stays bounded only
  * while the touched-key set is; a production job compacts the fold
  * into the base at every publish and restarts the state (the d12
  * incremental-ingest pattern applied to mutations). */
object StreamCdc {

  val changeSchema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("seq", IntegerType),
    StructField("op", StringType),
    StructField("custkey", LongType),
    StructField("status", StringType),
    StructField("price", DoubleType)))

  /** The q74 changeset materialized once per sfDir as a 4-file parquet
    * dir (the change-feed fixture; _SUCCESS-marked, Hadoop-FS-checked,
    * idempotent). 4 files × maxFilesPerTrigger=1 forces a MULTI-batch
    * replay, so cross-micro-batch LWW state is what's exercised. The
    * directory name embeds a fingerprint of [[CdcOps.changesetSql]]:
    * an edited changeset definition must mint a NEW fixture — a bare
    * existence check would silently replay the old rows against the
    * freshly-rebuilt oracle. */
  def changesPath(spark: SparkSession, sfDir: String): String = {
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(CdcOps.changesetSql.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val dir = FsUtil.qualified(
      "target/tmp/cdc/changes_" + FsUtil.sanitize(sfDir) + "_" + fp)
    if (!FsUtil.exists(spark, dir + "/_SUCCESS"))
      CdcOps.changeset(spark, sfDir).repartition(4)
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** q75: fold the change stream to latest-per-key, then publish the
    * merged snapshot. */
  def cdcMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(changesPath(spark, sfDir))
    val latest = StreamRun.toCompletion(
      CdcOps.latestPerKey(changes), "graft_stream_cdc",
      outputMode = "complete")
    CdcOps.applyLatest(
      Tables.load(spark, sfDir, "orders"), latest,
      baseKey = "o_orderkey",
      colMap = Seq("custkey" -> "o_custkey", "status" -> "o_orderstatus",
        "price" -> "o_totalprice"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_stream_cdc" -> (cdcMerge _)
  )

  def oracleSql: Map[String, String] = Map(
    // the batch merge's oracle verbatim: the streamed fold must land
    // on the identical snapshot
    "q75_stream_cdc" -> CdcOps.oracleSql("q74_cdc_merge")
  )
}
