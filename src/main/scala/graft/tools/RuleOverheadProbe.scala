// Scratch probe: how much wall time do the three injected optimizer
// rules add to the heavier bench queries? Runs each query twice with the
// rules enabled and twice disabled (same session, same JVM/cache state).
//
// Usage: runMain graft.tools.RuleOverheadProbe [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession

object RuleOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("d02_dedup_minhash", "s02_ann_lsh", "q03_flagship",
      "q08_agg_tpch_q1")
    val all = graft.SparkEntry.queries
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.operators.Persists.scoped {
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    def setRules(on: Boolean): Unit = Seq(
      "spark.graft.joinReorder.enabled",
      "spark.graft.outerJoinElim.enabled",
      "spark.graft.selfJoinElim.enabled").foreach(k =>
      spark.conf.set(k, on.toString))
    runOnce("q03_flagship") // warm-up
    qs.foreach { q =>
      // alternate off/on 3x each so JVM warm-up bias cancels; report mins
      val times = (0 until 6).map { i =>
        setRules(i % 2 == 1)
        (i % 2 == 1) -> runOnce(q)
      }
      val on = times.collect { case (true, t) => t }.min
      val off = times.collect { case (false, t) => t }.min
      println(f"PROBE $q%-20s rulesOn=$on%6.3f rulesOff=$off%6.3f " +
        f"delta=${on - off}%+6.3f  raw=${times.map(t => f"${t._2}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
