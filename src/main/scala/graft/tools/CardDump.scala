// Dump TRUE cardinalities for every connected subset of every
// ExperimentCorpus join graph, in the reference's pg.json format
// (Map[queryName, Map[subset-key, rows]] — MyMetadataQuery.java:107-114,
// FIXTURES.md §2). The driver-side analog of the reference's Python
// client injecting true cardinalities.
//
// Key shape mirrors the reference's dump exactly: a subset containing a
// FILTERED table is keyed with the filter literal appended to that
// table's name (MyUtils.getTableNameWithFilter:143-192) — the key
// CardinalityStore's second-chance lookup builds — while unfiltered
// subsets use the plain sorted-name key. Counts are always computed WITH
// the query's filters applied (they are the true cardinalities of the
// filtered subquery).
//
// Usage: runMain graft.tools.CardDump [sfDir [outJson [corpus]]]
//   corpus: "core" (default, ExperimentCorpus) or "job" (JobCorpus —
//   the 8-14-relation JOB-scale workload; dump at sf0.001, where the
//   full connected-subset sweep stays minutes, not hours)
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans._

object CardDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("fixtures/cards_sf0.001.json")
    val corpus = args.lift(2).getOrElse("core") match {
      case "core" => ExperimentCorpus.all
      case "job" => JobCorpus.all
      case "tail" => JobCorpus.tails
      case "ceiling" => JobCorpus.ceiling
      case "wide" => ExperimentCorpus.wide
      case "exch" => ExperimentCorpus.exch
      case other =>
        sys.error(s"unknown corpus '$other' (core|job|tail|ceiling|wide|exch)")
    }
    val spark = SparkSession.builder().master("local[16]")
      // 64 partitions, not 16: the wide corpus's truth subsets sort-
      // merge tens of millions of rows — 16 concurrent partition-sized
      // sorts exhausted execution memory in a default-heap JVM
      // (UNABLE_TO_ACQUIRE_MEMORY); finer partitions spill less and
      // fit. Run under a big heap (SBT_OPTS=-Xmx16g) for sf0.1 dumps.
      .config("spark.sql.shuffle.partitions", "64")
      // no auto-broadcast either: single-file parquet inputs are one
      // partition, and a chain of BHJs then runs the whole multi-way
      // fan-out in ONE task (observed at sf0.1: one 27M-row subset
      // count pinned a single core for minutes). Shuffle joins spread
      // every subset count across the 16 threads.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entries = corpus.map { cq =>
      val g = cq.graph
      val dfs = g.relations.map(n => AliasedRels.load(spark, sfDir, n))
      val inputs = g.relations.zip(dfs).zip(cq.filters).map { case ((n, df), f) =>
        RelInput(n, df, f.map(org.apache.spark.sql.functions.expr))
      }
      // every connected, non-empty subset of the graph
      val subsets = (1L to g.full).filter(s => g.connected(s))
      val counts = subsets.map { s =>
        val tree = spanningTree(g, s)
        // broadcastRows = 0: NO forced broadcast hints. The dummy
        // uniform cardinality would otherwise mark every side (even a
        // multi-million-row intermediate) broadcastable — at sf0.1 the
        // wide corpus's truth subsets then collect whole intermediates
        // to the driver single-threaded (observed: one count pinned a
        // core for 40+ min). Plain shuffle joins count the same rows;
        // Spark's own plan-stats autoBroadcast still handles the
        // genuinely tiny sides.
        val cnt = JoinTreeExecutor
          .build(tree, g, inputs, HeuristicCardinality.uniform(
            g, Array.fill(g.n)(1.0)), broadcastRows = 0L)
          .count()
        CardinalityStore.qualifiedKey(g, s, cq.filters) -> cnt
      }
      println(s"${cq.name}: ${counts.size} subsets")
      counts.foreach { case (k, v) => println(f"  $v%10d  $k") }
      cq.name -> counts
    }

    val json = entries.map { case (name, counts) =>
      s""""$name": {${counts.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}"""
    }.mkString("{", ",\n ", "}")
    val p = java.nio.file.Paths.get(out)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json)
    println(s"wrote $out")
    spark.stop()
  }

  /** any join tree over subset `s` (left-deep along connectivity) —
    * result cardinality is order-independent. */
  private def spanningTree(g: QueryGraph, s: Long): JoinTree = {
    val first = java.lang.Long.numberOfTrailingZeros(s)
    var tree: JoinTree = Leaf(first)
    var remaining = s & ~(1L << first)
    while (remaining != 0) {
      val next = (0 until g.n).find { i =>
        ((remaining >> i) & 1L) == 1L &&
          g.crossEdges(tree.set, 1L << i).nonEmpty
      }.getOrElse(throw new IllegalStateException(s"subset $s not connected"))
      tree = Node(tree, Leaf(next))
      remaining &= ~(1L << next)
    }
    tree
  }
}
