package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ROW-LEVEL DELETE / TAKEDOWN over a manifest-tracked directory —
  * the legally-forced corpus operation ("remove these doc_ids") the
  * snapshot family was missing (VERDICT r11 "what's missing" #2).
  * Two standard modes, both commits in the [[Snapshots]] chain:
  *
  *  - EQUALITY-DELETE (merge-on-read): the takedown commit writes
  *    ONLY a small key manifest beside the version manifest; readers
  *    of that version anti-join the keys out. O(|takedown list|)
  *    write cost — at 100 TB a takedown touches no data file at all,
  *    which is why every production table format ships this mode.
  *  - COPY-ON-WRITE maintenance: a later commit rewrites ONLY the
  *    files that actually contain deleted keys (file-level pruning
  *    via the `_metadata.file_path` column — never a corpus rewrite)
  *    and drops the key manifest; readers pay zero merge cost again.
  *
  * Time travel and vacuum compose exactly as in [[Snapshots]] /
  * [[Vacuum]]: v1 reads stay byte-stable across both commits (a
  * takedown must not rewrite history silently — retention of prior
  * versions is a POLICY call made by [[vacuumRetaining]], which
  * keeps every retained version readable and physically drops
  * superseded files only when the versions listing them are
  * retired). DeletesSpec pins all of it on a fixture it owns.
  *
  * Scale shape: the equality read is one broadcast anti-join
  * (takedown lists are ~thousands of keys against billions of rows;
  * past broadcast size Spark's AQE falls back to a shuffle
  * anti-join on the same plan); CoW planning is file-count-sized
  * metadata plus a rewrite of the affected files only.
  */
object Deletes {

  val Files = 8

  /** The takedown-key predicate — shared with the oracle. */
  val TakedownMod = 53

  private val Cols = Seq("doc_id", "source", "lang", "n_chars")

  private def tmp(name: String): String =
    FsUtil.qualified("target/tmp/deletes/" + name)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] =
    fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))

  def manifestPath(dir: String, version: Int): String =
    dir + s"_manifest_v$version"

  /** The equality-delete key manifest committed WITH a version (the
    * Iceberg equality-delete-file analog, keyed on doc_id). */
  def deletesPath(dir: String, version: Int): String =
    dir + s"_deletes_v$version"

  private def writeManifest(
      spark: SparkSession, mpath: String, files: Seq[String]): Unit = {
    val spark2 = spark
    import spark2.implicits._
    files.toDF("file").coalesce(1).write.mode("overwrite").parquet(mpath)
  }

  private[sources] def filesOf(
      spark: SparkSession, dir: String, version: Int): Seq[String] =
    spark.read.parquet(manifestPath(dir, version))
      .select("file").collect().map(r => dir + "/" + r.getString(0)).toSeq

  /** The three-commit chain over any (doc_id, …) frame into `dir`:
    * v1 = the full table; v2 = the TAKEDOWN commit (same data files +
    * the `keys` equality-delete manifest — metadata-only); v3 = the
    * COPY-ON-WRITE maintenance commit (affected files rewritten
    * without the keys, key manifest dropped). One definition shared
    * by the sfDir gate artifact and DeletesSpec's own fixture. */
  private[sources] def commitChain(
      spark: SparkSession, dir: String,
      base: DataFrame, keys: DataFrame): Unit = {
    base.select(Cols.map(col): _*)
      .repartition(Files, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    val v1Files = dataFiles(spark, dir)
    writeManifest(spark, manifestPath(dir, 1), v1Files)
    // v2: the takedown — a key manifest beside an UNCHANGED file list
    keys.select("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(deletesPath(dir, 2))
    writeManifest(spark, manifestPath(dir, 2), v1Files)
    // v3: copy-on-write — prune to the files that actually hold a
    // deleted key (file-path metadata + one semi-join), rewrite only
    // their survivors, commit (untouched ∪ rewritten)
    val dels = spark.read.parquet(deletesPath(dir, 2))
    val keyed = spark.read.parquet(v1Files.map(dir + "/" + _): _*)
      .withColumn("fname",
        element_at(split(col("_metadata.file_path"), "/"), -1))
    val affected = keyed.join(dels, "doc_id")
      .select("fname").distinct().collect().map(_.getString(0)).toSet
    val before = dataFiles(spark, dir).toSet
    keyed.filter(col("fname").isin(affected.toSeq: _*))
      .join(dels, Seq("doc_id"), "left_anti")
      .select(Cols.map(col): _*)
      .write.mode("append").parquet(dir)
    val rewritten = dataFiles(spark, dir).filterNot(before)
    writeManifest(spark, manifestPath(dir, 3),
      v1Files.filterNot(affected) ++ rewritten)
  }

  /** The POSITION-delete manifest committed with a version (the
    * Iceberg position-delete-file analog: rows of (file, pos)). */
  def posDeletesPath(dir: String, version: Int): String =
    dir + s"_posdeletes_v$version"

  /** The positional-delete three-commit chain — the OTHER half of the
    * standard v2 table-format delete surface beside [[commitChain]]'s
    * equality deletes, and the cheap path when the offender rows are
    * already LOCATED: v2 commits only (file, row-position) pairs (the
    * one locating scan uses the parquet `_metadata.file_path` +
    * `_metadata.row_index` columns — positions are stable because
    * data files are immutable); v3 is the same file-level CoW
    * compaction as the equality chain (affected files = the manifest's
    * DISTINCT file list, a metadata-sized driver set — no join needed
    * to find them, which is exactly why positional is the cheap
    * form). */
  private[sources] def commitChainPositional(
      spark: SparkSession, dir: String,
      base: DataFrame, offenders: org.apache.spark.sql.Column): Unit = {
    base.select(Cols.map(col): _*)
      .repartition(Files, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    val v1Files = dataFiles(spark, dir)
    writeManifest(spark, manifestPath(dir, 1), v1Files)
    // v2: locate once, commit positions — data files unchanged
    val keyed = spark.read.parquet(v1Files.map(dir + "/" + _): _*)
      .withColumn("fname",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("pos", col("_metadata.row_index"))
    keyed.filter(offenders)
      .select(col("fname").as("file"), col("pos"))
      .coalesce(1).write.mode("overwrite").parquet(posDeletesPath(dir, 2))
    writeManifest(spark, manifestPath(dir, 2), v1Files)
    // v3: copy-on-write — affected files read straight off the
    // manifest, survivors of ONLY those files rewritten
    val dels = spark.read.parquet(posDeletesPath(dir, 2))
      .withColumnRenamed("pos", "dpos")
    val affected = dels.select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val before = dataFiles(spark, dir).toSet
    keyed.filter(col("fname").isin(affected.toSeq: _*))
      .join(broadcast(dels),
        col("fname") === col("file") && col("pos") === col("dpos"),
        "left_anti")
      .select(Cols.map(col): _*)
      .write.mode("append").parquet(dir)
    val rewritten = dataFiles(spark, dir).filterNot(before)
    writeManifest(spark, manifestPath(dir, 3),
      v1Files.filterNot(affected) ++ rewritten)
  }

  /** Read AS OF `version` under POSITIONAL deletes: that manifest's
    * files minus its (file, row-position) pairs — the row identity is
    * recomputed from the same metadata columns the locator used, and
    * the pair manifest is takedown-sized, so the anti-join
    * broadcasts. Versions without a position manifest (v1 history,
    * v3 post-compaction) read plain. */
  def readAtPos(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val files = filesOf(spark, dir, version)
    require(files.nonEmpty, s"manifest v$version lists no files")
    val df = spark.read.parquet(files: _*)
    val ppath = posDeletesPath(dir, version)
    if (!FsUtil.exists(spark, ppath + "/_SUCCESS")) df
    else {
      val dels = spark.read.parquet(ppath)
        .withColumnRenamed("file", "dfile").withColumnRenamed("pos", "dpos")
      df.withColumn("__fname",
          element_at(split(col("_metadata.file_path"), "/"), -1))
        .withColumn("__pos", col("_metadata.row_index"))
        .join(broadcast(dels),
          col("__fname") === col("dfile") && col("__pos") === col("dpos"),
          "left_anti")
        .drop("__fname", "__pos")
    }
  }

  /** The positional gate artifact: same takedown predicate as the
    * equality chain, committed as located (file, pos) pairs. */
  def writeTakedownPositionalVersions(
      spark: SparkSession, sfDir: String): String = {
    val dir = tmp("documents_pos_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, manifestPath(dir, 3) + "/_SUCCESS"))
      commitChainPositional(spark, dir,
        Tables.load(spark, sfDir, "documents"),
        col("doc_id") % TakedownMod === 0)
    dir
  }

  /** The gate artifact: documents under a `doc_id % TakedownMod = 0`
    * takedown, all three versions committed. Idempotent per sfDir. */
  def writeTakedownVersions(spark: SparkSession, sfDir: String): String = {
    val dir = tmp("documents_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, manifestPath(dir, 3) + "/_SUCCESS")) {
      val base = Tables.load(spark, sfDir, "documents")
      commitChain(spark, dir, base,
        base.filter(col("doc_id") % TakedownMod === 0).select("doc_id"))
    }
    dir
  }

  /** Read AS OF `version`: that manifest's files, minus that
    * version's equality-delete keys if it committed any. The key
    * frame is takedown-sized, so the anti-join broadcasts. */
  def readAt(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val files = filesOf(spark, dir, version)
    require(files.nonEmpty, s"manifest v$version lists no files")
    val df = spark.read.parquet(files: _*)
    val dpath = deletesPath(dir, version)
    if (FsUtil.exists(spark, dpath + "/_SUCCESS"))
      df.join(broadcast(spark.read.parquet(dpath).select("doc_id")),
        Seq("doc_id"), "left_anti")
    else df
  }

  /** Vacuum keeping every version in `versions` readable: a visible
    * data file is live iff SOME retained manifest lists it — retiring
    * old versions is what finally drops a taken-down row's bytes
    * (the CoW commit supersedes the affected files; their physical
    * deletion must wait for v1/v2 retirement or time travel breaks).
    * Returns the deleted names; idempotent like [[Vacuum.vacuum]]. */
  def vacuumRetaining(
      spark: SparkSession, dir: String, versions: Seq[Int]): Seq[String] = {
    val live = versions.flatMap(v =>
      filesOf(spark, dir, v).map(_.split('/').last)).toSet
    val f = fs(spark, dir)
    val orphans = dataFiles(spark, dir).filterNot(live)
    orphans.foreach { n =>
      require(f.delete(new Path(dir, n), false),
        s"vacuum failed to delete superseded file $n")
    }
    orphans
  }

  /** Per-file stats manifest AS OF a takedown version, maintained
    * INCREMENTALLY across the copy-on-write commit — the q96 append
    * discipline ([[Snapshots.statsManifestAt]]) applied to DELETES:
    * v1's stats are a commit artifact; v3's rows are v1's MINUS the
    * replaced files PLUS stats over ONLY the rewritten files —
    * O(affected files) per takedown, never a corpus re-scan. v2
    * deliberately serves v1's stats unchanged: under equality
    * deletes, file stats are UPPER BOUNDS (standard table-format
    * semantics — pruning stays exact, counts may overcount until the
    * CoW compaction lands). Stats are keyed by file NAME so they
    * join the version manifests. */
  def statsManifestAt(
      spark: SparkSession, sfDir: String, version: Int): DataFrame = {
    val dir = writeTakedownVersions(spark, sfDir)
    def withNames(df: DataFrame): DataFrame =
      df.withColumn("file",
        element_at(split(col("file"), "/"), -1))
    val m1Stats = dir + "_stats_v1"
    if (!FsUtil.exists(spark, m1Stats + "/_SUCCESS"))
      withNames(ZoneMap.buildManifestFiles(
          spark, filesOf(spark, dir, 1), Seq("n_chars")))
        .coalesce(1).write.mode("overwrite").parquet(m1Stats)
    val v1 = spark.read.parquet(m1Stats)
    if (version <= 2) v1
    else {
      val v1Names = spark.read.parquet(manifestPath(dir, 1))
        .select("file").collect().map(_.getString(0)).toSet
      val v3Names = spark.read.parquet(manifestPath(dir, 3))
        .select("file").collect().map(_.getString(0)).toSet
      val rewritten = (v3Names -- v1Names).toSeq.sorted
      val kept = v1.filter(col("file")
        .isin((v1Names & v3Names).toSeq: _*))
      if (rewritten.isEmpty) kept
      else kept.unionByName(withNames(ZoneMap.buildManifestFiles(
        spark, rewritten.map(dir + "/" + _), Seq("n_chars"))))
    }
  }

  /** q153: the post-takedown stats roll-up served from the
    * INCREMENTALLY maintained v3 manifest — hash-checked against a
    * direct recompute over the takedown-filtered table, so the gate
    * passes only if the O(affected) refresh describes EXACTLY the
    * post-delete data (a stale or double-counted file shows up as a
    * wrong n_rows). */
  def takedownStatsRollup(spark: SparkSession, sfDir: String): DataFrame =
    statsManifestAt(spark, sfDir, 3).agg(
      sum("n_rows").cast("long").as("n_rows"),
      min("n_chars_min").as("min_chars"),
      max("n_chars_max").as("max_chars"))

  /** q149: the MERGE-ON-READ takedown read — v2's files with the
    * equality-delete keys anti-joined out. Hash-checked against the
    * source table minus the takedown predicate: the gate passes only
    * if the read applies the key manifest (a plain directory or
    * manifest scan would return the taken-down rows). */
  def takedownRead(spark: SparkSession, sfDir: String): DataFrame =
    readAt(spark, writeTakedownVersions(spark, sfDir), 2)

  /** q150: the COPY-ON-WRITE read — v3 after the maintenance rewrite,
    * no merge work left at read time. Same oracle as q149: both modes
    * must agree exactly. */
  def takedownCompactRead(spark: SparkSession, sfDir: String): DataFrame =
    readAt(spark, writeTakedownVersions(spark, sfDir), 3)

  /** q155: the POSITIONAL merge-on-read takedown — v2's files with the
    * located (file, row-position) pairs anti-joined out. Same oracle
    * as q149: equality and positional deletes of the same offenders
    * must agree exactly. */
  def takedownPositionalRead(spark: SparkSession, sfDir: String): DataFrame =
    readAtPos(spark, writeTakedownPositionalVersions(spark, sfDir), 2)

  /** q156: the positional chain after its CoW compaction — v3 reads
    * plain (no merge work left), still the same oracle. */
  def takedownPositionalCompact(
      spark: SparkSession, sfDir: String): DataFrame =
    readAtPos(spark, writeTakedownPositionalVersions(spark, sfDir), 3)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_takedown_read" -> (takedownRead _),
    "q150_takedown_compact" -> (takedownCompactRead _),
    "q153_stats_after_takedown" -> (takedownStatsRollup _),
    "q155_takedown_positional" -> (takedownPositionalRead _),
    "q156_takedown_pos_compact" -> (takedownPositionalCompact _)
  )

  private[sources] val takedownOracle: String =
    s"""SELECT doc_id, source, lang, n_chars
        FROM documents WHERE doc_id % $TakedownMod <> 0"""

  def oracleSql: Map[String, String] = Map(
    "q149_takedown_read" -> takedownOracle,
    "q150_takedown_compact" -> takedownOracle,
    "q155_takedown_positional" -> takedownOracle,
    "q156_takedown_pos_compact" -> takedownOracle,
    "q153_stats_after_takedown" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 min(n_chars) AS min_chars, max(n_chars) AS max_chars
          FROM documents WHERE doc_id % $TakedownMod <> 0"""
  )
}
