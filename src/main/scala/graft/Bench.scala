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

    val results = headline.flatMap { name =>
      all.get(name).map { fn =>
        val t0 = System.nanoTime()
        try {
          // per-query barrier scope: build + execute inside, release after
          graft.operators.Persists.scoped {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0
        }
      }
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => s""""$k"""" }
    if (failed.nonEmpty) {
      // a failing query must read as a FAILURE, not as a faster total —
      // report value:-1 + the failed list and exit nonzero
      println(s"""{"metric":"total","value":-1,"unit":"sec","queries":$qs,""" +
        s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
      spark.stop()
      sys.exit(1)
    }
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
