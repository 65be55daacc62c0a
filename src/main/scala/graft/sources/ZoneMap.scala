package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max manifest — the poor man's ZoneMap (Moerkotte,
  * "Small Materialized Aggregates", VLDB 1998), generalizing the
  * z-order row-group evidence (tools/ZOrderSkipDemo) into a QUERYABLE
  * index an engine consults BEFORE the scan: a table of
  * (file, n_rows, col_min, col_max, ...) rows, one per data file.
  *
  * Why it matters at 100 TB: parquet's own min/max stats prune row
  * groups only after the footer of every file is opened and read —
  * at hundreds of thousands of files that is a metadata storm before
  * the first data byte. A manifest is file-count-sized (the same
  * scale as the file listing the driver already holds), lives in one
  * tiny table, and removes non-overlapping FILES from the scan plan
  * entirely; this is the design Delta/Iceberg ship as per-file stats
  * in the transaction log, re-expressed as plain DataFrames.
  *
  * The manifest BUILD is one distributed pass (group by
  * `input_file_name`), the cost an ETL writer pays once per ingest.
  * The CONSULT is a driver-side filter of the manifest — bounded by
  * file count, the same object the driver's split planner enumerates
  * anyway.
  */
object ZoneMap {

  /** Per-file stats manifest over the parquet files under `dir`: one
    * row per physical file with row count and min/max of each of
    * `cols`. One distributed scan, shuffled on the (file-count-sized)
    * file name key. */
  def buildManifest(
      spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    manifestOf(spark.read.parquet(dir), cols)

  /** [[buildManifest]] restricted to an explicit file list — the
    * INCREMENTAL maintenance surface: a commit's manifest refresh
    * scans only the appended files (Snapshots.statsManifestAt). */
  def buildManifestFiles(
      spark: SparkSession, files: Seq[String], cols: Seq[String]): DataFrame =
    manifestOf(spark.read.parquet(files: _*), cols)

  private def manifestOf(data: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one indexed column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    data
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** The files whose [min, max] extent of `column` overlaps
    * [lo, hi] — the consult step. Driver-side collect, bounded by the
    * manifest's file count. */
  def overlappingFiles(
      manifest: DataFrame, column: String, lo: Long, hi: Long): Seq[String] =
    manifest
      .filter(col(s"${column}_min") <= hi && col(s"${column}_max") >= lo)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range scan through the manifest: read ONLY the overlapping files,
    * then apply the predicate as a residual filter — exact for any
    * manifest (a stale or coarse manifest costs extra files, never
    * wrong rows, provided it covers all files holding matching rows).
    * `conjuncts` are (column, lo, hi) ranges, all of which must
    * overlap (a file is pruned if ANY indexed extent misses).
    *
    * A file-subset read drops hive partition columns unless Spark is
    * told the table root: pass `basePath = Some(tableDir)` when the
    * table is hive-partitioned and downstream code needs the partition
    * column; without it, indexed/residual columns must be DATA
    * columns (they are here — the manifest indexes data columns). */
  def prunedRead(
      spark: SparkSession, manifest: DataFrame,
      conjuncts: Seq[(String, Long, Long)],
      basePath: Option[String] = None): DataFrame = {
    val keep = conjuncts.foldLeft(lit(true)) { case (acc, (c, lo, hi)) =>
      acc && col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
    }
    val files = manifest.filter(keep)
      .select("file").collect().map(_.getString(0)).toSeq
    val residual = conjuncts.foldLeft(lit(true)) { case (acc, (c, lo, hi)) =>
      acc && col(c).between(lo, hi)
    }
    val reader = basePath.foldLeft(spark.read)((r, b) => r.option("basePath", b))
    if (files.nonEmpty) reader.parquet(files: _*).filter(residual)
    else {
      // no file overlaps: schema-only read of any file, zero rows
      val any = manifest.select("file").limit(1)
        .collect().map(_.getString(0)).toSeq
      require(any.nonEmpty, "prunedRead over an empty manifest")
      reader.parquet(any.head).filter(lit(false))
    }
  }

  /** The q69 box — sized to admit rows at EVERY gate scale factor
    * (sf0.001's key domain only spans l_partkey < 200, l_suppkey < 10,
    * so the wider ZoneMapSkipDemo box would go empty there). */
  private[sources] val PrunedBox: Seq[(String, Long, Long)] =
    Seq(("l_partkey", 64L, 127L), ("l_suppkey", 2L, 7L))

  /** q69: the USER half of the zone map, gated end to end — q66 proves
    * the manifest algebra, this proves the consult + pruned scan +
    * residual filter pipeline returns exactly what the predicate over
    * the full table returns (the exact-for-any-manifest property, now
    * hash-checked by a direct DuckDB predicate on the source table
    * rather than demo-measured). ZoneMapSpec additionally asserts the
    * admitted file set is a strict subset, so this entry can't pass by
    * degenerating into a full scan. */
  def zonemapPrunedScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = writeZPartitioned(spark, sfDir)
    val manifest = buildManifest(spark, dir, Seq("l_partkey", "l_suppkey"))
    prunedRead(spark, manifest, PrunedBox, basePath = Some(dir))
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
  }

  /** Number of z-curve file blocks the q66 layout targets; the block
    * width W = maxZ/Files + 1 is derived with the SAME integer math in
    * the DuckDB oracle, so file membership is deterministic at every
    * scale factor (unlike a range-partitioner's sampled boundaries,
    * which could never be oracle-checked). */
  val Files = 256

  private def tmp(name: String): String =
    FsUtil.qualified("target/tmp/zonemap/" + name)

  /** Write lineitem z-clustered into ~[[Files]] hive-partitioned file
    * blocks (`zfile = z div W`), one file per block — the deterministic
    * stand-in for "ingest wrote z-sorted files". Idempotent per sfDir
    * (the Bucketing discipline). Returns the table path. */
  def writeZPartitioned(spark: SparkSession, sfDir: String): String = {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmp("lineitem_z_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, dir + "/_SUCCESS")) {
      val z = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"),
          expr("graft_zvalue(l_partkey, l_suppkey)").as("z"))
      val maxZ = z.agg(max("z")).collect()(0).getLong(0) // one scalar
      val w = maxZ / Files + 1
      z.withColumn("zfile", expr(s"z div ${w}L")).drop("z")
        .repartition(col("zfile"))
        .write.mode("overwrite").partitionBy("zfile").parquet(dir)
    }
    dir
  }

  /** q66: the manifest itself, aggregated to the deterministic zfile
    * blocks (multiple files per block fold together, so the result is
    * layout-stable) — n_rows and (l_partkey, l_suppkey) extents per
    * block. The DuckDB oracle recomputes the interleave, the block
    * width, and the same aggregates straight from the source table, so
    * the gate proves the file-side manifest algebra (input_file_name
    * grouping + path→block mapping) reproduces the direct answer. */
  def zonemapManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = writeZPartitioned(spark, sfDir)
    buildManifest(spark, dir, Seq("l_partkey", "l_suppkey"))
      .withColumn("zfile",
        regexp_extract(col("file"), "zfile=(\\d+)", 1).cast("long"))
      .groupBy("zfile").agg(
        sum("n_rows").as("n_rows"),
        min("l_partkey_min").as("pk_min"), max("l_partkey_max").as("pk_max"),
        min("l_suppkey_min").as("sk_min"), max("l_suppkey_max").as("sk_max"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_zonemap" -> (zonemapManifest _),
    "q69_zonemap_pruned" -> (zonemapPrunedScan _)
  )

  /** The q58 interleave CTE chain (same four spread steps as
    * ZValue.spread16), then the block width W = max(z)/Files + 1 and
    * per-block aggregates — integer math end to end. */
  def oracleSql: Map[String, String] = Map(
    "q66_zonemap" ->
      s"""WITH s0 AS (SELECT l_partkey, l_suppkey,
                            l_partkey % 65536 AS px, l_suppkey % 65536 AS py
                     FROM lineitem),
          s1 AS (SELECT l_partkey, l_suppkey,
                        (px | (px << 8)) & 16711935 AS px,
                        (py | (py << 8)) & 16711935 AS py FROM s0),
          s2 AS (SELECT l_partkey, l_suppkey,
                        (px | (px << 4)) & 252645135 AS px,
                        (py | (py << 4)) & 252645135 AS py FROM s1),
          s3 AS (SELECT l_partkey, l_suppkey,
                        (px | (px << 2)) & 858993459 AS px,
                        (py | (py << 2)) & 858993459 AS py FROM s2),
          s4 AS (SELECT l_partkey, l_suppkey,
                        (px | (px << 1)) & 1431655765 AS px,
                        (py | (py << 1)) & 1431655765 AS py FROM s3),
          z AS (SELECT l_partkey, l_suppkey, px | (py << 1) AS z FROM s4),
          wdt AS (SELECT max(z) // $Files + 1 AS w FROM z)
        SELECT z // w AS zfile,
               count(*) AS n_rows,
               min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
               min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
        FROM z, wdt GROUP BY 1""",
    // the exact-for-any-manifest property: pruned scan + residual ≡ the
    // direct predicate over the source table
    "q69_zonemap_pruned" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_extendedprice
         FROM lineitem
         WHERE l_partkey BETWEEN 64 AND 127 AND l_suppkey BETWEEN 2 AND 7"""
  )
}
