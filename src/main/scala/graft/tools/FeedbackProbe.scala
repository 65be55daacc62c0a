// Scale probe for the LEO loop (p23): what does harvesting cost
// relative to the query it observes, and what does consulting the
// dictionary cost at plan time? Harvest is a driver-side walk over the
// executed plan's node tree reading already-aggregated SQL metrics —
// the claim is "zero extra cluster work, microseconds of driver work";
// this measures it instead of asserting it.
// Usage: runMain graft.tools.FeedbackProbe [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans.{ExecutionFeedback, PlannerQueries}

object FeedbackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    PlannerQueries.flagshipGraph._1.relations.foreach(r =>
      graft.sources.Tables.load(spark, sfDir, r).createOrReplaceTempView(r))

    def ms[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e6)
    }

    ExecutionFeedback.clear()
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    val df = spark.sql(PlannerQueries.flagshipSqlText)
    val (_, execMs) = ms(df.collect())
    val (n, harvestMs) = ms(ExecutionFeedback.harvest(df))
    println(f"[feedback-probe] execute=${execMs}%.1f ms " +
      f"harvest=${harvestMs}%.2f ms observations=$n " +
      f"store=${ExecutionFeedback.size}")

    spark.conf.set("spark.graft.joinReorder.stats", "feedback")
    val (_, planFbMs) = ms(
      spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
    spark.conf.set("spark.graft.joinReorder.stats", "hist")
    val (_, planHistMs) = ms(
      spark.sql(PlannerQueries.flagshipSqlText).queryExecution.optimizedPlan)
    println(f"[feedback-probe] plan(feedback)=${planFbMs}%.1f ms " +
      f"plan(hist)=${planHistMs}%.1f ms")

    val (_, saveMs) = ms(ExecutionFeedback.save("target/tmp/feedback_probe.json"))
    println(f"[feedback-probe] save=${saveMs}%.2f ms")
    spark.stop()
  }
}
