package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the parquet driver contract: CSV
  * and JSON-lines round-trips, and a hive-partitioned parquet sink read
  * back through partition pruning.
  *
  * The reference's only source is a JDBC Postgres schema
  * (`pg-schema.json:1-16`); a general engine needs the text formats
  * every ingest pipeline starts from. Each query WRITES the testdata
  * table in the target format (under `target/tmp/`, repo-local), reads
  * it back with an explicit schema — never inference, which at 100 TB
  * means a full extra pass over the data and type drift between runs —
  * and returns the read-back rows, so the DuckDB oracle over the
  * ORIGINAL parquet verifies byte fidelity of the whole
  * write-serialize-parse cycle, types included.
  */
object SourceFormats {

  private def tmp(name: String): String =
    new java.io.File("target/tmp/formats/" + name).getAbsolutePath

  /** q52: orders → CSV (header, default quoting) → read back with the
    * parquet schema (bigint, varchar, double, timestamp_ntz all cross
    * the text boundary). */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val orig = Tables.load(spark, sfDir, "orders")
    val dir = tmp("orders_csv")
    orig.write.mode("overwrite").option("header", "true").csv(dir)
    spark.read.schema(orig.schema).option("header", "true").csv(dir)
  }

  /** q53: customer → JSON lines → read back with the parquet schema.
    * JSON-lines is the LLM-corpus interchange format; the explicit
    * schema keeps doubles doubles (inference would widen/narrow). */
  def jsonRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val orig = Tables.load(spark, sfDir, "customer")
    val dir = tmp("customer_json")
    orig.write.mode("overwrite").json(dir)
    spark.read.schema(orig.schema).json(dir)
  }

  /** q54: documents → parquet partitioned BY lang (the hive layout a
    * production corpus store uses, one directory per partition value),
    * then an aggregate over a two-partition read. The filter on the
    * partition column prunes at planning time — `.explain` shows only
    * the en/de directories scanned, the moral equivalent of reading 2
    * of 1000 date partitions at 100 TB. */
  def partitionedSink(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmp("documents_by_lang")
    Tables.load(spark, sfDir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    spark.read.parquet(dir)
      .filter(col("lang").isin("en", "de"))
      .groupBy("lang").agg(
        count(lit(1)).as("docs"),
        sum("n_chars").as("chars"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_csv_source" -> (csvRoundTrip _),
    "q53_json_source" -> (jsonRoundTrip _),
    "q54_partitioned_sink" -> (partitionedSink _)
  )

  def oracleSql: Map[String, String] = Map(
    // fidelity oracles: the round-trip must equal the ORIGINAL table
    "q52_csv_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders""",
    "q53_json_source" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer""",
    "q54_partitioned_sink" ->
      """SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents WHERE lang IN ('en', 'de') GROUP BY lang"""
  )
}
