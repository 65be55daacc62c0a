package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Driver-contract integrity: the `++`-merged query map would SILENTLY
  * shadow a query on a duplicate key (one operator's entry replacing
  * another's), and an oracle without a query never runs — both would
  * surface only as a mysteriously missing CORRECTNESS row. */
class SparkEntrySpec extends AnyFunSuite {

  private val parts = Seq(
    "relational" -> RelationalQueries.queries.keySet,
    "text" -> TextOps.queries.keySet,
    "dedup" -> DedupOps.queries.keySet,
    "similarity" -> SimilarityOps.queries.keySet,
    "multimodal" -> MultimodalOps.queries.keySet,
    "skew" -> SkewOps.queries.keySet,
    "skyline" -> SkylineOps.queries.keySet,
    "audit" -> AuditOps.queries.keySet,
    "asof" -> AsofOps.queries.keySet,
    "range" -> RangeOps.queries.keySet,
    "graph" -> GraphOps.queries.keySet,
    "curation" -> CurationOps.queries.keySet,
    "cdc" -> CdcOps.queries.keySet,
    "events" -> EventOps.queries.keySet,
    "tokenizer" -> TokenizerOps.queries.keySet,
    "packing" -> PackingOps.queries.keySet,
    "search" -> SearchOps.queries.keySet,
    "zorder" -> ZOrderOps.queries.keySet,
    "formats" -> graft.sources.SourceFormats.queries.keySet,
    "bucketing" -> graft.sources.Bucketing.queries.keySet,
    "zonemap" -> graft.sources.ZoneMap.queries.keySet,
    "bloomskip" -> graft.sources.BloomSkip.queries.keySet,
    "vacuum" -> graft.sources.Vacuum.queries.keySet,
    "snapshots" -> graft.sources.Snapshots.queries.keySet,
    "deletes" -> graft.sources.Deletes.queries.keySet,
    "planners" -> graft.plans.PlannerQueries.queries.keySet,
    "tablestats" -> graft.plans.TableStats.queries.keySet,
    "stream-events" -> graft.streaming.EventStream.queries.keySet,
    "stream-dedup" -> graft.streaming.StreamDedup.queries.keySet,
    "stream-curation" -> graft.streaming.StreamCuration.queries.keySet,
    "stream-funnel" -> graft.streaming.StreamFunnel.queries.keySet,
    "stream-sessions" -> graft.streaming.StreamSessions.queries.keySet,
    "stream-cdc" -> graft.streaming.StreamCdc.queries.keySet,
    "stream-wap" -> graft.streaming.StreamWap.queries.keySet,
    "stream-annmaintain" -> graft.streaming.StreamAnnMaintain.queries.keySet)

  test("query keys are collision-free across operator modules") {
    for {
      (n1, k1) <- parts; (n2, k2) <- parts if n1 < n2
    } assert((k1 & k2).isEmpty,
      s"modules $n1 and $n2 both define ${k1 & k2} — '++' would shadow one")
    assert(parts.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("every oracle key has a query; every query is named canonically") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles without a query (never run): $stray")
    val pattern = "^[a-z][0-9]{2,3}[a-z]?_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filter(k =>
      pattern.findFirstIn(k).isEmpty)
    assert(bad.isEmpty, s"non-canonical query names: $bad")
  }
}
