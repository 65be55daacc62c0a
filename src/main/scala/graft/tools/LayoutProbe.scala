// Layout-evidence probe for the round-8 serving layouts: how much I/O
// the cell-partitioned IVF layout (s11) actually skips, and what the
// bucketed-base CDC merge (q88) plans when the delta cannot broadcast.
// Output feeds SCALE_r8.md.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

object LayoutProbe {
  private def initial(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.initialPlan
    case other => other
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      // broadcast OFF so the q88 probe shows the DEGRADED path the
      // spec pins, not an AQE broadcast conversion
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- s11: partition pruning as I/O, not rows -------------------
    graft.operators.Persists.scoped {
      val df = graft.operators.SimilarityOps.ivfTopKPartitioned(spark, sfDir)
      val dir = graft.operators.SimilarityOps.cellPartitionedPath(spark, sfDir)
      val full = spark.read.parquet(dir)
      val totalCells = full.select("cell").distinct().count()
      val scan = initial(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("ivf_cells")) => f
      }.head
      val sel = scan.selectedPartitions
      val fullScan = initial(full.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec => f
      }.head
      val all = fullScan.selectedPartitions
      println(s"s11 partitions=${sel.partitionCount}/${all.partitionCount} " +
        s"(cells=$totalCells) files=${sel.totalNumberOfFiles}/${all.totalNumberOfFiles} " +
        f"bytes=${sel.totalFileSize}/${all.totalFileSize} " +
        f"frac=${sel.totalFileSize.toDouble / all.totalFileSize}%.3f")
    }

    // --- q88: degraded merge is exchange-free on the base ----------
    graft.operators.Persists.scoped {
      val df = graft.operators.CdcOps.mergeOrdersBucketed(spark, sfDir)
      val plan = initial(df.queryExecution.executedPlan)
      val antis = plan.collect {
        case j: SortMergeJoinExec if j.joinType == LeftAnti => j
      }
      val baseShuffles = antis.headOption
        .map(_.left.collect { case e: ShuffleExchangeLike => e }.size)
      val totalShuffles = plan.collect { case e: ShuffleExchangeLike => e }.size
      println(s"q88 smjAnti=${antis.size} baseSideExchanges=$baseShuffles " +
        s"planExchanges=$totalShuffles")
    }
    spark.stop()
  }
}
