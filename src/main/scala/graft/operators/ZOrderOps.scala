package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order (Morton-curve) clustering for 2-D data skipping — the
  * layout tool a 100 TB parquet store uses when queries filter on TWO
  * independent keys and a single-column sort order can only serve one.
  *
  * Sorting by `graft_zvalue(x, y)` (a native codegen'd expression,
  * [[graft.functions.ZValue]]) gives every naturally-aligned block of
  * 4^k curve positions a GUARANTEED 2^k × 2^k bounding box in (x, y):
  * each file / row group covers a small tile of the key plane instead
  * of a stripe, so parquet min/max statistics prune range predicates
  * on either key, or both. The q58 query materializes exactly that
  * evidence — per curve-block extents of both dimensions — and the
  * DuckDB oracle recomputes the interleave arithmetically, so the
  * native expression's bit kernel is hash-verified end to end.
  *
  * At real key widths (> 16 bits) the caller buckets each dimension
  * into ≤ 65536 cells first (divide by a cell width); the curve then
  * clusters cells, which is all data skipping needs — row-group
  * pruning works at cell granularity, not key granularity.
  */
object ZOrderOps {

  /** q58: z-bucket extents over lineitem's (l_partkey, l_suppkey).
    * Each `zbucket` is a naturally-aligned 2^16-position curve block —
    * a 256×256 CELL tile — so `pk_max - pk_min ≤ 255·cellWidth` and
    * `sk_max - sk_min ≤ 255·cellWidth` hold for EVERY row of the
    * result (ZOrderSpec asserts it at cellWidth=1 on real data and the
    * scaled bound on a >16-bit synthetic domain); that bound is the
    * data-skipping guarantee a z-ordered writer ships.
    *
    * `cellWidth` is the header's "bucket each dimension first": keys
    * are integer-DIVIDED into cells (division preserves locality —
    * adjacent keys share or neighbor a cell), so a caller with keys
    * beyond 2^16 passes ceil(maxKey / 65536) and the curve clusters
    * cells. A modulo would instead ALIAS distant keys onto one cell
    * and void the extent bound. The default 1 is lossless for this
    * schema's key domains at every verification SF. One narrow
    * codegen'd map + one hash aggregation on a ≤ 2^16-ary key: no
    * window, no join, scale-free. */
  def zorderExtents(
      spark: SparkSession, sfDir: String, cellWidth: Long = 1L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    zorderExtentsOn(Tables.load(spark, sfDir, "lineitem"), cellWidth)
  }

  /** [[zorderExtents]] over any (l_partkey, l_suppkey) frame —
    * fixture-injectable; caller must have registered GraftFunctions. */
  def zorderExtentsOn(d: DataFrame, cellWidth: Long): DataFrame =
    d.select(col("l_partkey"), col("l_suppkey"),
        expr(s"graft_zvalue(l_partkey div $cellWidth, " +
          s"l_suppkey div $cellWidth)").as("z"))
      .withColumn("zbucket", shiftright(col("z"), 16))
      .groupBy("zbucket").agg(
        count(lit(1)).as("n"),
        min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
        min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))

  /** The cell width the GATED q58 entry runs at. Both the Spark query
    * and the DuckDB oracle below are generated from this ONE constant
    * (the oracle's s0 CTE divides by it), so a future change of the
    * gated width moves both sides together instead of silently
    * diverging. */
  val GatedCellWidth = 1L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_zorder_cluster" ->
      ((s: SparkSession, d: String) => zorderExtents(s, d, GatedCellWidth))
  )

  /** The oracle spreads each 16-bit operand with the same four
    * shift-or-mask steps the native kernel uses (ZValue.spread16), one
    * CTE per step — identical integer math in both engines, so the
    * hash gate verifies the codegen'd bit kernel arithmetically. The
    * cell division (`// GatedCellWidth`) mirrors the Spark side's
    * `div cellWidth` from the same constant. */
  def oracleSql: Map[String, String] = Map(
    "q58_zorder_cluster" ->
      s"""WITH s0 AS (SELECT l_partkey, l_suppkey,
                            (l_partkey // $GatedCellWidth) % 65536 AS px,
                            (l_suppkey // $GatedCellWidth) % 65536 AS py
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
          z AS (SELECT l_partkey, l_suppkey, px | (py << 1) AS z FROM s4)
        SELECT z >> 16 AS zbucket,
               count(*) AS n,
               min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
               min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
        FROM z GROUP BY 1"""
  )
}
