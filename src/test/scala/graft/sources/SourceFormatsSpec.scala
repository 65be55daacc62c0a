package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must actually collapse the file count (that's its whole
  * point) while preserving every row — the fidelity half is also
  * hash-checked against DuckDB by the q59 oracle. */
class SourceFormatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction collapses 64 ingest files to the size-derived count") {
    val compacted = SourceFormats.compact(spark, sfDir)
    val frag = parquetFiles(
      new java.io.File("target/tmp/formats/orders_fragmented").getAbsolutePath)
    val comp = parquetFiles(
      new java.io.File("target/tmp/formats/orders_compacted").getAbsolutePath)
    assert(frag.length == 64)
    // tiny corpus, 32 MiB target -> everything fits one file
    assert(comp.length == 1, s"expected 1 compacted file, got ${comp.length}")
    assert(compacted.count() ==
      Tables.load(spark, sfDir, "orders").count())
  }

  test("compaction respects the byte target when it binds") {
    // force a 64 KiB target so the size-derived count exceeds 1
    val compacted = SourceFormats.compact(spark, sfDir, targetBytes = 64L * 1024)
    val comp = parquetFiles(
      new java.io.File("target/tmp/formats/orders_compacted").getAbsolutePath)
    assert(comp.length > 1, "a 64 KiB target must split this corpus")
    assert(compacted.count() ==
      Tables.load(spark, sfDir, "orders").count())
  }

  test("WAP refuses to publish a tampered staging directory, leaving " +
      "the published location untouched") {
    import org.apache.spark.sql.functions.col
    val src = Tables.load(spark, sfDir, "documents")
    val staging = FsUtil.qualified("target/tmp/formats/wap_tamper_staging")
    val published = FsUtil.qualified("target/tmp/formats/wap_tamper_pub")
    // stage a write that silently lost a whole partition
    src.filter(col("lang") =!= "de")
      .write.mode("overwrite").partitionBy("lang").parquet(staging)
    val e = intercept[IllegalStateException] {
      SourceFormats.publishAudited(spark, src, staging, published)
    }
    assert(e.getMessage.contains("refusing to publish"))
    assert(!FsUtil.exists(spark, published),
      "a failed audit must never create the published table")
  }

  test("WAP publishes a faithful staging directory and the audit " +
      "round-trips") {
    val audit = SourceFormats.writeAuditPublish(spark, sfDir)
    val direct = SourceFormats.langAudit(
      Tables.load(spark, sfDir, "documents"))
    assert(audit.collect().toSet == direct.collect().toSet)
  }

  test("schema evolution: merged read back-fills the new column with " +
      "NULL for generation-1 rows only") {
    import org.apache.spark.sql.functions.col
    val merged = SourceFormats.schemaEvolution(spark, sfDir)
    assert(merged.columns.contains("c_mktsegment"),
      "merged schema must include the generation-2 column")
    val orig = Tables.load(spark, sfDir, "customer")
    assert(merged.count() == orig.count())
    // gen-1 (even keys) lack the column; gen-2 (odd keys) carry it
    assert(merged.filter(col("c_mktsegment").isNull)
      .filter(col("c_custkey") % 2 =!= 0).count() == 0)
    assert(merged.filter(col("c_custkey") % 2 === 0)
      .filter(col("c_mktsegment").isNotNull).count() == 0)
    assert(merged.filter(col("c_custkey") % 2 =!= 0)
      .filter(col("c_mktsegment").isNull).count() == 0)
  }
}
