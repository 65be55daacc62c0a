package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (SURVEY.md §2 ✦ rows +
  * the LLM-pipeline additions); every entry with an `oracleSql` twin is
  * hash-checked against DuckDB at sf0.01 by the driver's Verify pass.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      TextOps.queries ++
      DedupOps.queries ++
      SimilarityOps.queries ++
      MultimodalOps.queries ++
      SkewOps.queries ++
      SkylineOps.queries ++
      AuditOps.queries ++
      AsofOps.queries ++
      RangeOps.queries ++
      GraphOps.queries ++
      CurationOps.queries ++
      CdcOps.queries ++
      EventOps.queries ++
      TokenizerOps.queries ++
      PackingOps.queries ++
      SearchOps.queries ++
      ZOrderOps.queries ++
      graft.sources.SourceFormats.queries ++
      graft.sources.Bucketing.queries ++
      graft.sources.ZoneMap.queries ++
      graft.sources.BloomSkip.queries ++
      graft.sources.Vacuum.queries ++
      graft.sources.Snapshots.queries ++
      graft.sources.Deletes.queries ++
      graft.plans.PlannerQueries.queries ++
      graft.plans.TableStats.queries ++
      graft.streaming.EventStream.queries ++
      graft.streaming.StreamDedup.queries ++
      graft.streaming.StreamCuration.queries ++
      graft.streaming.StreamFunnel.queries ++
      graft.streaming.StreamSessions.queries ++
      graft.streaming.StreamCdc.queries ++
      graft.streaming.StreamWap.queries ++
      graft.streaming.StreamAnnMaintain.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++
      TextOps.oracleSql ++
      DedupOps.oracleSql ++
      SimilarityOps.oracleSql ++
      MultimodalOps.oracleSql ++
      SkewOps.oracleSql ++
      SkylineOps.oracleSql ++
      AuditOps.oracleSql ++
      AsofOps.oracleSql ++
      RangeOps.oracleSql ++
      GraphOps.oracleSql ++
      CurationOps.oracleSql ++
      CdcOps.oracleSql ++
      EventOps.oracleSql ++
      TokenizerOps.oracleSql ++
      PackingOps.oracleSql ++
      SearchOps.oracleSql ++
      ZOrderOps.oracleSql ++
      graft.sources.SourceFormats.oracleSql ++
      graft.sources.Bucketing.oracleSql ++
      graft.sources.ZoneMap.oracleSql ++
      graft.sources.BloomSkip.oracleSql ++
      graft.sources.Vacuum.oracleSql ++
      graft.sources.Snapshots.oracleSql ++
      graft.sources.Deletes.oracleSql ++
      graft.plans.PlannerQueries.oracleSql ++
      graft.plans.TableStats.oracleSql ++
      graft.streaming.EventStream.oracleSql ++
      graft.streaming.StreamDedup.oracleSql ++
      graft.streaming.StreamCuration.oracleSql ++
      graft.streaming.StreamFunnel.oracleSql ++
      graft.streaming.StreamSessions.oracleSql ++
      graft.streaming.StreamCdc.oracleSql ++
      graft.streaming.StreamWap.oracleSql ++
      graft.streaming.StreamAnnMaintain.oracleSql
}
