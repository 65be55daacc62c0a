package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s19 composed IVF-PQ: the rows-only contract — a recall@10 floor vs
  * brute force, residual coding beating the raw-vector full-scan PQ
  * (s10), partition-pruned I/O, and a codes-only storage schema.
  * Everything here is deterministic at the fixed SF, so the asserts
  * are exact, not statistical. */
class IvfPqRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

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

  private def neighborSets(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private def meanRecall(got: Map[Long, Set[Long]],
      truth: Map[Long, Set[Long]]): Double =
    truth.keys.toSeq.map { q =>
      got.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble /
        truth(q).size
    }.sum / truth.size

  test("recall@10 vs brute clears the floor and beats raw-vector PQ-ADC") {
    val truth = neighborSets(SimilarityOps.bruteForceTopK(spark, sfDir))
    val composed = neighborSets(SimilarityOps.ivfPqTopK(spark, sfDir))
    val rawPq = neighborSets(SimilarityOps.pqAdcTopK(spark, sfDir))
    val rComposed = meanRecall(composed, truth)
    val rRaw = meanRecall(rawPq, truth)
    // measured 0.30 at sf0.001 (0.34 at sf0.01); floor with margin
    assert(rComposed >= 0.25, s"composed recall $rComposed below floor")
    // residual coding + pruned probe must not rank WORSE than the
    // full-scan raw-vector ADC (measured 0.30 vs 0.22): residuals are
    // better centered than raw vectors, so the same codebook budget
    // quantizes them more finely
    assert(rComposed >= rRaw,
      s"composed $rComposed must be >= raw full-scan ADC $rRaw")
  }

  test("scan reads only probed partitions of the codes-only layout") {
    val df = SimilarityOps.ivfPqTopK(spark, sfDir)
    val dir = SimilarityOps.ivfPqPath(spark, sfDir)
    val totalCells = spark.read.parquet(dir + "/data")
      .select("cell").distinct().count()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val scans = root.collect { case f: FileSourceScanExec => f }
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("ivfpq")))
    assert(scans.size == 1, s"expected one ivfpq data scan, got $scans")
    val selected = scans.head.selectedPartitions.partitionCount
    // 5 queries' probe UNION covers most of the 16 tiny gate cells —
    // the strict-subset assert is the honest multi-query claim here;
    // the per-query bound below is where pruning bites (and at
    // production C ≈ √n ≫ nprobe it bites for any query count)
    assert(selected < totalCells,
      s"probed $selected of $totalCells cells must be a strict subset")
    val one = SimilarityOps.ivfPqTopK(spark, sfDir, nQueries = 1)
    val oneRoot = one.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val oneScan = oneRoot.collect { case f: FileSourceScanExec => f }
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("ivfpq"))).head
    assert(oneScan.selectedPartitions.partitionCount <= 10,
      s"one query probes 10 cells, scan reads " +
        s"${oneScan.selectedPartitions.partitionCount}")
    // codes-only: the serving table carries m ints + one norm per row,
    // never the raw vector
    val cols = spark.read.parquet(dir + "/data").columns.toSet
    assert(cols === Set("vec_id", "codes", "rn2", "cell"))
  }
}
