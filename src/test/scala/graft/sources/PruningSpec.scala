package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime pruning contracts: (1) q98's partition filter really is
  * DYNAMIC (a dynamicpruning subquery in the executed plan — it cannot
  * be static, the selective predicate lives on a non-partition dim
  * attribute) and only the surviving partitions' files are read;
  * (2) with the V2 parquet reader, aggregate pushdown answers
  * min/max/count from footer metadata (PushedAggregation in the scan)
  * and agrees with the computed answer. */
class PruningSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("q98 prunes partitions dynamically and reads only en/de dirs") {
    val df = SourceFormats.dppJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.toLowerCase
    assert(plan.contains("dynamicpruning"),
      "fact scan must carry a dynamic pruning subquery")
    // `df.inputFiles` is computed from the STATIC relation and always
    // lists all five lang dirs; runtime pruning only shows in the
    // executed scan's metrics. Assert on pruned PARTITION count (en,
    // de of 5 langs) — a file count would couple the test to the
    // fixture writer emitting exactly one file per partition.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec        => allScans(q.plan)
      case s: FileSourceScanExec    => Seq(s)
      case other                    => other.children.flatMap(allScans)
    }
    val factScan = allScans(df.queryExecution.executedPlan)
      .filter(_.toString.contains("documents_by_lang_dpp"))
    assert(factScan.nonEmpty, "fact FileSourceScanExec not found")
    val numParts = factScan.head.metrics("numPartitions").value
    assert(numParts == 2,
      s"expected 2 pruned fact partitions (en, de), read $numParts")
  }

  test("V2 parquet reader answers min/max/count from footer metadata") {
    // an isolated SQLConf over the same context: useV1SourceList and
    // aggregatePushdown are runtime confs, so newSession() suffices
    // (getOrCreate() would return the existing session unchanged)
    val v2 = spark.newSession()
    v2.conf.set("spark.sql.sources.useV1SourceList", "")
    v2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val agg = v2.read.parquet(sfDir + "/lineitem.parquet")
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"),
        count(lit(1)).as("n"))
    val row = agg.collect()(0)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      "scan must push min/max/count into the parquet footers")
    val truth = Tables.load(spark, sfDir, "lineitem")
      .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1))).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (truth.getLong(0), truth.getLong(1), truth.getLong(2)))
  }
}
