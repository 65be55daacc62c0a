package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot reads (TIME TRAVEL) over a manifest-tracked
  * directory — the other half of the [[Vacuum]] discipline: if the
  * commit-time manifest is the liveness truth, then KEEPING every
  * version's manifest gives historical reads for free. An append
  * commit writes new data files into the same directory and a new
  * manifest listing old + new; reading "as of version N" scans
  * exactly manifest-N's files and is immune to every later append —
  * which a plain directory read is not (it sees whatever has landed,
  * a moving target mid-pipeline). This is Delta/Iceberg time travel
  * re-expressed as plain parquet manifests.
  *
  * Interplay with vacuum, documented because it bites: manifests here
  * are cumulative (append keeps old files), so vacuuming against the
  * LATEST manifest preserves every retained version; dropping old
  * versions = vacuum against the latest manifest minus the retired
  * ones. SnapshotsSpec pins both the isolation property (v1 read is
  * byte-stable across the append) and vacuum-compatibility (vacuum
  * at v2 deletes nothing).
  *
  * Scale shape: a commit appends file-count-sized metadata (one
  * manifest row per live file); readAt plans from the manifest's file
  * list exactly like q90's consult — only file NAMES cross the
  * driver, data files are never rewritten, and historical reads cost
  * the same scan they always did.
  */
object Snapshots {

  val Files = 8

  /** The v1/v2 split predicate — shared with the oracle (v1 is the
    * low-quantity half so both versions admit rows at every SF). */
  val SplitQty = 25.0

  private def tmp(name: String): String =
    FsUtil.qualified("target/tmp/snapshots/" + name)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] =
    fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))

  private def writeManifest(
      spark: SparkSession, mpath: String, files: Seq[String]): Unit = {
    val spark2 = spark
    import spark2.implicits._
    files.toDF("file").coalesce(1).write.mode("overwrite").parquet(mpath)
  }

  /** Two committed versions of a lineitem table in ONE directory:
    * v1 = the `l_quantity <= SplitQty` half, v2 = v1's files plus an
    * appended write of the rest. Returns the table path; manifests
    * land at `<dir>_manifest_v{1,2}`. Idempotent per sfDir. */
  def writeVersions(spark: SparkSession, sfDir: String): String = {
    val dir = tmp("lineitem_" + FsUtil.sanitize(sfDir))
    val m2 = manifestPath(dir, 2)
    if (!FsUtil.exists(spark, m2 + "/_SUCCESS")) {
      val base = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
      base.filter(col("l_quantity") <= SplitQty)
        .repartition(Files, col("l_partkey"))
        .write.mode("overwrite").parquet(dir)
      val v1Files = dataFiles(spark, dir)
      writeManifest(spark, manifestPath(dir, 1), v1Files)
      base.filter(col("l_quantity") > SplitQty)
        .repartition(Files, col("l_partkey"))
        .write.mode("append").parquet(dir)
      writeManifest(spark, m2, dataFiles(spark, dir))
    }
    dir
  }

  def manifestPath(dir: String, version: Int): String =
    dir + s"_manifest_v$version"

  /** Read the table AS OF `version`: scan exactly that manifest's
    * files. Exact for any cumulative manifest chain — later appends
    * add files this read never selects. */
  def readAt(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val files = spark.read.parquet(manifestPath(dir, version))
      .select("file").collect().map(r => dir + "/" + r.getString(0)).toSeq
    require(files.nonEmpty, s"manifest v$version lists no files")
    spark.read.parquet(files: _*)
  }

  /** q93: the v1 time-travel read AFTER v2 was appended into the same
    * directory — hash-checked against the v1 predicate over the source
    * table, so the gate can only pass if the read is manifest-planned
    * (a naive directory scan would return the appended rows too). */
  def timeTravelRead(spark: SparkSession, sfDir: String): DataFrame =
    readAt(spark, writeVersions(spark, sfDir), 1)

  /** Full paths of a version's files. */
  private[sources] def filesOf(
      spark: SparkSession, dir: String, version: Int): Seq[String] =
    spark.read.parquet(manifestPath(dir, version))
      .select("file").collect().map(r => dir + "/" + r.getString(0)).toSeq

  /** The per-file stats manifest AS OF a version, maintained
    * INCREMENTALLY: v1's stats are a stored commit artifact; v2's are
    * v1's rows plus stats over ONLY the appended files
    * ([[ZoneMap.buildManifestFiles]]). Manifest refresh is therefore
    * O(delta) per commit, never a corpus re-scan — at 100 TB the
    * difference between per-commit stats being free and being the
    * dominant ingest cost (the p10 ANALYZE lesson applied to file
    * stats). SnapshotsSpec pins increment ≡ full rebuild and that the
    * refresh read only the appended files. */
  def statsManifestAt(
      spark: SparkSession, sfDir: String, version: Int): DataFrame = {
    val dir = writeVersions(spark, sfDir)
    val m1Stats = dir + "_stats_v1"
    if (!FsUtil.exists(spark, m1Stats + "/_SUCCESS"))
      ZoneMap.buildManifestFiles(spark, filesOf(spark, dir, 1),
          Seq("l_quantity"))
        .write.mode("overwrite").parquet(m1Stats)
    val v1 = spark.read.parquet(m1Stats)
    if (version == 1) v1
    else {
      val newFiles = {
        val v1Names = spark.read.parquet(manifestPath(dir, 1))
          .select("file").collect().map(_.getString(0)).toSet
        spark.read.parquet(manifestPath(dir, 2))
          .select("file").collect().map(_.getString(0))
          .filterNot(v1Names).map(dir + "/" + _).toSeq
      }
      v1.unionByName(
        ZoneMap.buildManifestFiles(spark, newFiles, Seq("l_quantity")))
    }
  }

  /** The q96 box: entirely inside v1's `l_quantity <= SplitQty` half,
    * so the maintained manifest must prune EVERY appended file. */
  private[sources] val QtyBox: Seq[(String, Long, Long)] =
    Seq(("l_quantity", 0L, 20L))

  /** q96: a range scan served through the INCREMENTALLY maintained
    * stats manifest — consult + file-subset read + residual filter
    * (the q69 pipeline, manifest built per-commit from the delta
    * alone). Hash-checked against the plain predicate over the source
    * table; SnapshotsSpec asserts the box admits only v1 files. */
  def incrementalManifestScan(
      spark: SparkSession, sfDir: String): DataFrame = {
    val dir = writeVersions(spark, sfDir)
    ZoneMap.prunedRead(spark, statsManifestAt(spark, sfDir, 2), QtyBox)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_time_travel" -> (timeTravelRead _),
    "q96_manifest_incremental" -> (incrementalManifestScan _)
  )

  def oracleSql: Map[String, String] = Map(
    "q93_time_travel" ->
      s"""SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
                 l_extendedprice
          FROM lineitem WHERE l_quantity <= $SplitQty""",
    // the exact-for-any-manifest property under incremental
    // maintenance: pruned scan + residual ≡ the direct predicate
    "q96_manifest_incremental" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
                l_extendedprice
         FROM lineitem WHERE l_quantity BETWEEN 0 AND 20"""
  )
}
