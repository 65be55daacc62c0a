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
    FsUtil.qualified("target/tmp/formats/" + name)

  /** q52: orders → CSV (header, default quoting) → read back with the
    * parquet schema (bigint, varchar, double, timestamp_ntz all cross
    * the text boundary). */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val orig = Tables.load(spark, sfDir, "orders")
    val dir = tmp("orders_csv")
    orig.write.mode("overwrite").option("header", "true").csv(dir)
    spark.read.schema(orig.schema).option("header", "true").csv(dir)
  }

  /** q143: MALFORMED-ROW CSV INGESTION — the robustness contract of
    * a real ingest: a feed with corrupted records must load in
    * PERMISSIVE mode, quarantine the bad rows via
    * `_corrupt_record`, and report clean/corrupt counts per source
    * instead of failing the batch (FAILFAST) or silently dropping
    * (DROPMALFORMED). The fixture plants a type-corrupt `n_chars`
    * ('xx' where an int belongs) on every 41st doc — the q94
    * pollution discipline — so the quarantine provably CATCHES a
    * known row set; the oracle recomputes the expected split from
    * the clean table and the plant rule, which is exactly the claim
    * "the parser classifies precisely the planted rows". Output
    * (source, n_good, n_corrupt, good_chars). */
  def csvMalformed(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = tmp("documents_badcsv")
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        expr("""CASE WHEN doc_id % 41 = 0 THEN 'xx'
                     ELSE CAST(n_chars AS STRING) END""").as("n_chars"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("n_chars", IntegerType),
      StructField("_corrupt_record", StringType)))
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .groupBy("source")
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
          .as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"),
        coalesce(sum(when(col("_corrupt_record").isNull,
          col("n_chars").cast("long"))), lit(0L)).as("good_chars"))
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

  /** q97: supplier → ORC → read back. ORC is the other columnar
    * format Spark ships natively (predicate pushdown, column pruning
    * and vectorized reads all apply, like parquet); a corpus store
    * interoperating with Hive/Trino warehouses reads and writes it
    * directly. The explicit schema keeps timestamp_ntz stable across
    * the format boundary. */
  def orcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val orig = Tables.load(spark, sfDir, "supplier")
    val dir = tmp("supplier_orc")
    orig.write.mode("overwrite").orc(dir)
    spark.read.schema(orig.schema).orc(dir)
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

  /** q98: DYNAMIC partition pruning — the partition filter that cannot
    * exist at planning time because it arrives THROUGH A JOIN: the
    * fact table is lang-partitioned (q54's layout), the dim table
    * carries the selection on a non-partition attribute (`keep`), and
    * only executing the dim side reveals which partitions matter.
    * Spark's DPP plans a dynamic pruning subquery into the fact scan:
    * the dim's broadcast result filters the fact's PARTITIONS before
    * any fact bytes are read — at 100 TB the difference between
    * scanning 2 of 1000 date partitions and scanning them all, on
    * every star-schema join whose dim filter is not a partition-column
    * literal. DppSpec asserts the dynamicpruning expression is in the
    * executed plan and that only the en/de directories were read. */
  def dppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val factDir = tmp("documents_by_lang_dpp_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, factDir + "/_SUCCESS"))
      Tables.load(spark, sfDir, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(factDir)
    val dimDir = tmp("lang_dim_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, dimDir + "/_SUCCESS"))
      // keep is an INT flag, not boolean: DPP only inserts its pruning
      // subquery when the dim side carries a "likely selective" filter
      // (PartitionPruning → isLikelySelective), whose pattern list has
      // BinaryComparison but not a bare boolean attribute — and a
      // `bool_col = true` filter constant-folds to the bare attribute
      // before the rule runs. `keep = 1` over int survives as EqualTo.
      Tables.load(spark, sfDir, "documents")
        .select(col("lang")).distinct()
        .withColumn("keep",
          when(col("lang").isin("en", "de"), 1).otherwise(0))
        .coalesce(1).write.mode("overwrite").parquet(dimDir)
    // DPP's benefit heuristic is BYTE-based (insert the pruning
    // subquery only when filterRatio × fact-scan bytes beats the dim
    // re-execution cost) and refuses at KB-scale fixture sizes; a
    // production fact table passes it without these dials. useStats
    // off = take the fallback ratio, raised so the KB-scale fact
    // still clears the bar. Semantics are unaffected either way.
    // The dials live on a CLONED session (same SparkContext, own
    // SQLConf) and the returned DataFrame is bound to it, so the
    // caller's session keeps stock DPP heuristics for every query
    // planned after this one; restoring the confs here instead would
    // silently disable DPP, because the plan is only built when the
    // caller executes the frame.
    val dpp = spark.newSession()
    dpp.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    dpp.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
      "10")
    val fact = dpp.read.parquet(factDir)
    val dim = dpp.read.parquet(dimDir)
      .filter(col("keep") === 1).select("lang")
    fact.join(dim.hint("broadcast"), "lang")
      .groupBy("lang").agg(
        count(lit(1)).as("docs"), sum("n_chars").as("chars"))
  }

  /** q59: small-file compaction — the maintenance pass a streaming-
    * ingested table needs at 100 TB, where thousands of per-microbatch
    * files kill scan throughput and metadata listing. Fragment orders
    * into 64 tiny files (the ingest pathology), then rewrite to a
    * byte-size-derived file count with `coalesce` — which CONCATENATES
    * input partitions without a shuffle (repartition would round-robin
    * every row through an exchange; compaction doesn't need that
    * balance). The read-back is verified against the ORIGINAL table,
    * so the whole fragment→compact cycle is byte-fidelity-checked;
    * `SourceFormatsSpec` asserts the file-count collapse. Sizing goes
    * through the Hadoop `FileSystem` resolved FROM the table's own
    * path — the same code path works on HDFS/S3/local, because the
    * actual 100 TB home of small-file compaction is an object store,
    * not the driver's local disk. */
  def compact(spark: SparkSession, sfDir: String,
      targetBytes: Long = 32L * 1024 * 1024): DataFrame = {
    val fragDir = tmp("orders_fragmented")
    val compDir = tmp("orders_compacted")
    val orig = Tables.load(spark, sfDir, "orders")
    orig.repartition(64).write.mode("overwrite").parquet(fragDir)
    val frag = spark.read.parquet(fragDir)
    val bytes = parquetBytes(spark, fragDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes)).toInt
    frag.coalesce(nFiles).write.mode("overwrite").parquet(compDir)
    spark.read.parquet(compDir)
  }

  /** q76: schema evolution across parquet generations — the table
    * grew a column (`c_mktsegment`) between ingest generation 1 and
    * generation 2, the layout every long-lived corpus store ends up
    * with. `mergeSchema` unions the footer schemas at read time and
    * back-fills the missing column with NULL for generation-1 files —
    * no rewrite of the old petabytes, which is the point: at 100 TB,
    * adding a column must cost zero data movement. Generations are
    * split by key parity so the fixture is SF-independent; the oracle
    * replays the same union + NULL fill over the original table.
    * (mergeSchema reads every footer; a production store caches the
    * merged schema in a catalog — the read semantics are what's gated
    * here.) */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val orig = Tables.load(spark, sfDir, "customer")
    val g1 = tmp("customer_gen1")
    val g2 = tmp("customer_gen2")
    orig.filter(col("c_custkey") % 2 === 0)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(g1)
    orig.filter(col("c_custkey") % 2 =!= 0)
      .write.mode("overwrite").parquet(g2)
    spark.read.option("mergeSchema", "true").parquet(g1, g2)
  }

  /** Per-lang audit frame: row count, char volume, and an
    * order-insensitive content checksum (bit_xor of the portable
    * content hash) — the invariants a write must preserve end to end.
    * One aggregation, langs-sized output. */
  def langAudit(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val h = graft.operators.PortableHash.packed("text")
    df.groupBy("lang").agg(
      count(lit(1)).as("docs"),
      sum("n_chars").as("chars"),
      expr(s"bit_xor($h)").as("checksum"))
  }

  /** q82: WRITE-AUDIT-PUBLISH — the pattern that keeps a 100 TB corpus
    * store trustworthy: land the write in a STAGING directory nobody
    * reads, audit the staged files by re-reading them (count + volume
    * + order-insensitive checksum per partition, compared against the
    * same audit of the source frame), and only then atomically rename
    * staging into the published location readers point at. A failed
    * audit leaves the published table untouched and throws — corrupt
    * or truncated writes can never become visible (SourceFormatsSpec
    * drops a partition from staging and publish refuses). Returns the
    * audit of the PUBLISHED table, which must equal the source-side
    * audit the DuckDB oracle computes. */
  def writeAuditPublish(spark: SparkSession, sfDir: String): DataFrame = {
    val staging = tmp("docs_wap_staging")
    val published = tmp("docs_wap_published")
    val src = Tables.load(spark, sfDir, "documents")
    src.write.mode("overwrite").partitionBy("lang").parquet(staging)
    publishAudited(spark, src, staging, published)
    langAudit(spark.read.parquet(published))
  }

  /** The audit + atomic-rename half, factored so the spec can aim it
    * at a tampered staging directory. */
  def publishAudited(spark: SparkSession,
      src: org.apache.spark.sql.DataFrame,
      staging: String, published: String): Unit = {
    def rows(df: org.apache.spark.sql.DataFrame) =
      langAudit(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val expected = rows(src)
    val staged = rows(spark.read.parquet(staging))
    if (staged != expected)
      throw new IllegalStateException(
        s"WAP audit failed: staged $staged != expected $expected — " +
          "refusing to publish")
    val conf = spark.sessionState.newHadoopConf()
    val pubPath = new org.apache.hadoop.fs.Path(published)
    val fs = pubPath.getFileSystem(conf)
    if (fs.exists(pubPath)) fs.delete(pubPath, true)
    // Hadoop rename reports failure by RETURNING false (missing parent,
    // permissions, cross-filesystem move) — ignoring it would leave the
    // published table silently absent after a passing audit
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), pubPath))
      throw new IllegalStateException(
        s"WAP publish failed: rename $staging -> $published returned false")
  }

  /** Total parquet data bytes under `dir`, listed via the Hadoop
    * FileSystem that owns the path (works for file://, hdfs://,
    * s3a://, ... — `java.io.File` would NPE on anything non-local). */
  def parquetBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_compact" -> ((s: SparkSession, d: String) => compact(s, d)),
    "q52_csv_source" -> (csvRoundTrip _),
    "q143_csv_malformed" -> (csvMalformed _),
    "q53_json_source" -> (jsonRoundTrip _),
    "q97_orc_source" -> (orcRoundTrip _),
    "q98_dpp_join" -> (dppJoin _),
    "q54_partitioned_sink" -> (partitionedSink _),
    "q76_schema_evolution" -> (schemaEvolution _),
    "q82_write_audit_publish" -> (writeAuditPublish _)
  )

  def oracleSql: Map[String, String] = Map(
    // q143: the expected quarantine split recomputed from the clean
    // table and the plant rule — "the parser classifies precisely the
    // planted rows" IS the oracle claim
    "q143_csv_malformed" ->
      """SELECT source,
                count(*) FILTER (WHERE doc_id % 41 <> 0) AS n_good,
                count(*) FILTER (WHERE doc_id % 41 = 0) AS n_corrupt,
                CAST(coalesce(
                    sum(n_chars) FILTER (WHERE doc_id % 41 <> 0), 0)
                  AS BIGINT) AS good_chars
         FROM documents GROUP BY source""",
    // fidelity oracles: the round-trip must equal the ORIGINAL table
    "q59_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders""",
    "q97_orc_source" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    "q98_dpp_join" ->
      """SELECT d.lang, count(*) AS docs,
                CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents d
         JOIN (SELECT DISTINCT lang FROM documents
               WHERE lang IN ('en', 'de')) x ON x.lang = d.lang
         GROUP BY d.lang""",
    "q52_csv_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders""",
    "q53_json_source" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer""",
    "q54_partitioned_sink" ->
      """SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents WHERE lang IN ('en', 'de') GROUP BY lang""",
    "q76_schema_evolution" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                CAST(NULL AS VARCHAR) AS c_mktsegment
         FROM customer WHERE c_custkey % 2 = 0
         UNION ALL
         SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey % 2 <> 0""",
    // the published table's audit must equal the source's: same
    // counts, volume, and bit_xor of the shared portable content hash
    "q82_write_audit_publish" -> {
      val h = graft.operators.PortableHash.packed("text")
      s"""SELECT lang, count(*) AS docs,
                 CAST(sum(n_chars) AS BIGINT) AS chars,
                 bit_xor($h) AS checksum
          FROM documents GROUP BY lang"""
    }
  )
}
