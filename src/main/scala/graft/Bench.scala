package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Execution is forced through the noop datasource (full computation of
  * every output row, zero write cost) — `count()` would let Spark prune
  * the project/compute away and fake the numbers.
  */
object Bench {

  /** Headline set: flagship join, heavy agg, window, planner-built join,
    * and one of each pipeline family. */
  val headline: Seq[String] = Seq(
    "q03_flagship", "q08_agg_tpch_q1", "q04_join_inner", "q13_window_rank",
    "q14_window_frame", "q21_in_subquery", "q26_events_daily",
    "p01_planner_dpccp", "d01_dedup_exact", "d02_dedup_minhash",
    "t01_quality", "t03_fingerprint_md5", "s01_ann_brute", "s02_ann_lsh",
    "s04_ann_ivf")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same extensions as Verify: benchmark the engine WITH its injected
    // optimizer rules — that is the deployed configuration
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries
    // one warm-up action so JVM/codegen/FS-cache startup isn't billed to
    // the first query
    all("q01_scan_project")(spark, sfDir).write
      .format("noop").mode("overwrite").save()

    // Two timed runs per query — the reference's execution loop
    // (QueryOptExperiment.java:596-613 times each query twice). The
    // reported per-query number is the SECOND (steady-state) run: the
    // first run is dominated by one-time codegen compilation + plan
    // costs that amortize away on a long-running cluster; both runs are
    // emitted so the cold cost stays visible.
    val results = headline.flatMap { name =>
      all.get(name).map { fn =>
        def once(): Double = {
          val t0 = System.nanoTime()
          // per-query barrier scope: build + execute inside, release after
          graft.operators.Persists.scoped {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          (System.nanoTime() - t0) / 1e9
        }
        try { val cold = once(); (name, once(), cold) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            (name, -1.0, -1.0)
        }
      }
    }
    val qs = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val qsCold = results.map { case (k, _, c) => f""""$k":$c%.3f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v, _) if v < 0 => s""""$k"""" }
    if (failed.nonEmpty) {
      // a failing query must read as a FAILURE, not as a faster total —
      // report value:-1 + the failed list and exit nonzero
      println(s"""{"metric":"total","value":-1,"unit":"sec","queries":$qs,""" +
        s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
      spark.stop()
      sys.exit(1)
    }
    val total = results.map(_._2).sum
    val totalCold = results.map(_._3).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""queries_cold":$qsCold,"total_cold":$totalCold%.3f,"runs_per_query":2,"sf":"$sfDir"}""")
    spark.stop()
  }
}
