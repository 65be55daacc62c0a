package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter manifest — the EQUALITY-predicate complement
  * of [[ZoneMap]]'s min/max manifest. Min/max extents prune range
  * scans over clustered layouts, but on a layout scattered by an
  * unrelated key (hash-distributed ingest, the common case for a
  * corpus store) every file's extent of a high-NDV column spans
  * nearly the whole domain, and a point lookup admits every file. A
  * per-file Bloom filter answers "could this file contain key k?"
  * independently of clustering: `false` is definitive (Bloom filters
  * have no false negatives), `true` costs at most fpp extra files.
  * This is the design Parquet ships per row group (bloom_filter
  * column metadata) and Iceberg/Delta expose as file-level bloom
  * stats, re-expressed as a plain DataFrame manifest.
  *
  * Scale accounting at 100 TB: the manifest holds ~1.2 bytes per
  * indexed ROW at 1% fpp (9.6 bits/key, independent of file count) —
  * ~120 GB for 10^11 rows, a distributed table in its own right. The
  * CONSULT therefore stays distributed: filter the manifest frame on
  * `graft_bloom_contains`, collect only the MATCHING file names
  * (bounded by true hits + fpp · files, not by manifest size). Only
  * the file-name list crosses to the driver — the same object the
  * split planner enumerates anyway.
  *
  * The manifest BUILD is one distributed pass (group by
  * `input_file_name`, fold keys into per-file sketches with
  * `graft_bloom_agg` — partial aggregation applies, one sketch per
  * task crosses the shuffle), paid once per ingest and stored as a
  * parquet artifact next to the table, the [[graft.operators.DedupOps
  * .signatureTablePath]] discipline.
  *
  * Reference frame: parimarjan/query-optimizer reads base tables via
  * Calcite JDBC scans with no skipping index at all
  * (DbInfo.java:19-40); this surface is part of the engine-contract
  * rows the reference's Postgres layer would supply.
  */
object BloomSkip {

  /** File blocks the scattered layout targets; 64 keeps ~90 rows per
    * file at sf0.001 so pruning is measurable at every gate scale. */
  val Files = 64

  val Fpp = 0.01

  private def tmp(name: String): String =
    FsUtil.qualified("target/tmp/bloomskip/" + name)

  /** lineitem written into [[Files]] hash-partitioned files on
    * `l_partkey` — a layout deliberately UNCORRELATED with
    * `l_orderkey`, so every file's orderkey extent spans ~the whole
    * domain and min/max pruning is useless (BloomSkipSpec measures
    * exactly that). Idempotent per sfDir (the Bucketing discipline). */
  def writeScattered(spark: SparkSession, sfDir: String): String = {
    val dir = tmp("lineitem_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, dir + "/_SUCCESS")) {
      Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
        .repartition(Files, col("l_partkey"))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** Per-file Bloom manifest over the parquet files under `dir`: one
    * row per physical file with its row count and a sketch of `keyCol`
    * sized for `expectedPerFile` keys. One distributed scan, shuffled
    * on the (file-count-sized) file name key. */
  def buildManifest(
      spark: SparkSession, dir: String, keyCol: String,
      expectedPerFile: Long, fpp: Double = Fpp): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"graft_bloom_agg(CAST($keyCol AS STRING), " +
          s"${expectedPerFile}L, CAST($fpp AS DOUBLE))").as("bloom"))
  }

  /** The manifest as a stored ingest artifact, built once per sfDir —
    * at 100 TB the writer folds this into the ingest job and every
    * point lookup consults the stored table. */
  def manifestPath(spark: SparkSession, sfDir: String): String = {
    val dir = writeScattered(spark, sfDir)
    val mpath = tmp("manifest_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, mpath + "/_SUCCESS")) {
      val rows = Tables.rowCount(spark, sfDir, "lineitem")
      // 2× headroom over the mean file population: an overfull sketch
      // degrades fpp, never correctness (no false negatives either way)
      buildManifest(spark, dir, "l_orderkey", rows / Files * 2 + 64)
        .write.mode("overwrite").parquet(mpath)
    }
    mpath
  }

  /** Files the manifest CANNOT rule out for any of `keys` — the
    * consult step. The filter runs distributed over the manifest
    * frame; only matching file names are collected (true hits +
    * fpp · files, not manifest-sized). */
  def candidateFiles(
      manifest: DataFrame, keys: Seq[Long]): Seq[String] = {
    graft.functions.GraftFunctions.register(manifest.sparkSession)
    val hit = keys.map(k => expr(s"graft_bloom_contains(bloom, '$k')"))
      .reduce(_ || _)
    manifest.filter(hit).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Point-lookup scan through the manifest: read ONLY the candidate
    * files, then apply the IN-list as a residual filter — exact for
    * any manifest (false positives cost I/O, never wrong rows; false
    * negatives are impossible by Bloom's contract). */
  def prunedKeyRead(
      spark: SparkSession, manifest: DataFrame, keyCol: String,
      keys: Seq[Long]): DataFrame = {
    val files = candidateFiles(manifest, keys)
    require(files.nonEmpty,
      "bloom consult admitted no files for keys drawn from the table")
    spark.read.parquet(files: _*).filter(col(keyCol).isin(keys: _*))
  }

  /** Four probe orderkeys spread across the key domain, derived from
    * the data with engine-portable integer math (the largest key ≤
    * lo + span·i/3 for i = 0..3) — deterministic at every scale
    * factor, and spanning the domain so the layout's uselessness for
    * min/max pruning is exercised, not dodged. Two aggregates, four
    * scalars to the driver. */
  def probeKeys(spark: SparkSession, sfDir: String): Seq[Long] = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val bounds = li.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val t1 = lo + (hi - lo) * 1 / 3
    val t2 = lo + (hi - lo) * 2 / 3
    val mids = li.agg(
      max(when(col("l_orderkey") <= t1, col("l_orderkey"))),
      max(when(col("l_orderkey") <= t2, col("l_orderkey")))).head()
    Seq(lo, mids.getLong(0), mids.getLong(1), hi).distinct
  }

  /** q90: the Bloom-skipping pipeline gated end to end — build (or
    * reuse) the stored manifest over the hash-scattered layout,
    * consult it for the four probe keys, read only candidate files,
    * residual-filter. Hash-checked by a direct DuckDB IN-list over the
    * source table, so the gate proves consult + pruned scan + residual
    * returns exactly the full-scan answer; BloomSkipSpec additionally
    * asserts the admitted file set is a strict subset AND that a
    * min/max manifest over the same layout prunes (almost) nothing. */
  def bloomPrunedScan(spark: SparkSession, sfDir: String): DataFrame = {
    val manifest = spark.read.parquet(manifestPath(spark, sfDir))
    prunedKeyRead(spark, manifest, "l_orderkey", probeKeys(spark, sfDir))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_bloom_skip" -> (bloomPrunedScan _)
  )

  /** Same probe-key derivation in DuckDB integer math (`//` floors like
    * Scala Long division for the non-negative spans here). */
  def oracleSql: Map[String, String] = Map(
    "q90_bloom_skip" ->
      """WITH b AS (SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi
                    FROM lineitem),
          t AS (SELECT lo, hi,
                       lo + (hi - lo) * 1 // 3 AS t1,
                       lo + (hi - lo) * 2 // 3 AS t2 FROM b),
          ks AS (SELECT min(l_orderkey) AS k0,
                        max(CASE WHEN l_orderkey <= t1 THEN l_orderkey END) AS k1,
                        max(CASE WHEN l_orderkey <= t2 THEN l_orderkey END) AS k2,
                        max(l_orderkey) AS k3
                 FROM lineitem, t)
        SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
        FROM lineitem, ks
        WHERE l_orderkey IN (k0, k1, k2, k3)"""
  )
}
