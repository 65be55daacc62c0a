package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-driven VACUUM — the table-maintenance pass that makes a
  * manifest-tracked directory safe to read by listing: a failed or
  * speculative task attempt, a killed compaction, or an interrupted
  * ingest can leave stray `part-*.parquet` files that a plain
  * directory scan happily reads as data — silently DUPLICATING rows
  * (VacuumSpec measures exactly that). The fix every table format
  * ships (Delta VACUUM, Iceberg remove_orphan_files): the manifest
  * written at commit time is the source of truth for liveness; any
  * data file in the directory but not in the manifest is an orphan
  * and is deleted.
  *
  * Scale shape: the orphan computation is listing − manifest, both
  * file-count-sized (the same objects the split planner and the
  * q66/q90 manifest consults already handle); deletes are per-file
  * metadata operations from the driver, the standard shape (Delta
  * parallelizes the LISTING of huge tables; the set difference and
  * delete loop stay driver-side, bounded by file count, and never
  * touch data bytes). Hidden files (`_SUCCESS`, `.␣*`) are
  * infrastructure, never vacuumed; subdirectories are left alone.
  *
  * Completes the maintenance triad with q59 (small-file compaction)
  * and q82 (write-audit-publish): WAP keeps bad data from becoming
  * visible, compaction keeps file counts sane, vacuum keeps the
  * directory equal to the committed table.
  */
object Vacuum {

  val Files = 16

  private def tmp(name: String): String =
    FsUtil.qualified("target/tmp/vacuum/" + name)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Visible data files under `dir` (name only): everything a plain
    * `spark.read.parquet(dir)` would scan. */
  private def dataFiles(spark: SparkSession, dir: String): Seq[String] =
    fs(spark, dir).listStatus(new Path(dir)).toSeq
      .filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))

  /** lineitem written into [[Files]] files with the live file set
    * recorded as a manifest at commit time — the state every
    * manifest-tracked write ends in. Idempotent per sfDir. */
  def writeTracked(spark: SparkSession, sfDir: String): (String, String) = {
    val dir = tmp("lineitem_" + FsUtil.sanitize(sfDir))
    val mpath = tmp("manifest_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, mpath + "/_SUCCESS")) {
      Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
        .repartition(Files, col("l_partkey"))
        .write.mode("overwrite").parquet(dir)
      val spark2 = spark
      import spark2.implicits._
      dataFiles(spark, dir).toDF("file")
        .coalesce(1).write.mode("overwrite").parquet(mpath)
    }
    (dir, mpath)
  }

  /** Simulate a failed task attempt: copy a live file under a fresh
    * `part-…-orphan` name the directory scan WILL read but the
    * manifest does not know. Idempotent. */
  def plantOrphan(spark: SparkSession, dir: String): String = {
    val f = fs(spark, dir)
    val orphan = new Path(dir, "part-99999-orphan-attempt-1.snappy.parquet")
    if (!f.exists(orphan)) {
      val live = dataFiles(spark, dir).head
      org.apache.hadoop.fs.FileUtil.copy(
        f, new Path(dir, live), f, orphan, false, f.getConf)
    }
    orphan.getName
  }

  /** Delete every visible data file under `dir` that the manifest does
    * not list; returns the deleted names. Exact by construction: the
    * manifest is the commit-time truth, so live files are never
    * touched and a second vacuum deletes nothing. */
  def vacuum(
      spark: SparkSession, dir: String, manifestPath: String): Seq[String] = {
    val live = spark.read.parquet(manifestPath)
      .select("file").collect().map(_.getString(0)).toSet
    val f = fs(spark, dir)
    val orphans = dataFiles(spark, dir).filterNot(live)
    orphans.foreach { n =>
      require(f.delete(new Path(dir, n), false),
        s"vacuum failed to delete orphan $n")
    }
    orphans
  }

  /** q92: the vacuum pipeline gated end to end — tracked write, a
    * planted orphan (which a naive listing-read would double-count),
    * vacuum, then the plain directory read. Hash-checked against the
    * source table directly: the gate can only pass if the orphan's
    * duplicate rows are gone and every live row survived. */
  def vacuumedRead(spark: SparkSession, sfDir: String): DataFrame = {
    val (dir, mpath) = writeTracked(spark, sfDir)
    plantOrphan(spark, dir)
    vacuum(spark, dir, mpath)
    spark.read.parquet(dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_vacuum" -> (vacuumedRead _)
  )

  def oracleSql: Map[String, String] = Map(
    "q92_vacuum" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
                l_extendedprice
         FROM lineitem"""
  )
}
