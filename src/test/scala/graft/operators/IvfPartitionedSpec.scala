package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s11's I/O promise: the cell-partitioned serving layout turns the
  * probe restriction into PARTITION PRUNING — the corpus scan under
  * the candidate join selects exactly the probed cells' directories,
  * a strict subset of the layout's C partitions. (The oracle gate
  * separately pins the ANSWER to s08's.) */
class IvfPartitionedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    Persists.releaseAll()
    if (spark != null) spark.stop()
  }

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = {
    val root = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    root.collect { case f: FileSourceScanExec => f }
  }

  test("scan selects exactly the probed partitions, a strict subset") {
    val df = SimilarityOps.ivfTopKPartitioned(spark, sfDir)
    val dir = SimilarityOps.cellPartitionedPath(spark, sfDir)
    val totalCells = spark.read.parquet(dir)
      .select("cell").distinct().count()
    // the corpus scan is the one over the partitioned artifact
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivf_cells")))
    assert(scans.size == 1, s"expected one partitioned corpus scan, got $scans")
    val selected = scans.head.selectedPartitions.partitionCount
    // 5 queries x 4 probes = at most 20 distinct probed cells
    assert(selected <= 20, s"scan reads $selected partitions — pruning lost")
    assert(selected < totalCells,
      s"probed $selected of $totalCells cells must be a strict subset")
    assert(selected > 0)
  }

  test("partitioned serve equals the post-scan-filter multiprobe serve") {
    val part = SimilarityOps.ivfTopKPartitioned(spark, sfDir)
      .orderBy("query_id", "rank").collect().toSeq
    val plain = SimilarityOps.ivfTopK(spark, sfDir,
        nprobe = SimilarityOps.MultiProbe)
      .orderBy("query_id", "rank").collect().toSeq
    assert(part == plain)
  }
}
