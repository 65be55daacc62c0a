// Per-query job/stage accounting — quantifies the superstep latency
// floor (VERDICT r16 item 1): a query whose wall time far exceeds its
// summed task time across many tiny jobs is scheduling-bound, and
// folding K supersteps into one lineage cut is the lever.
// Usage: runMain graft.tools.JobCountProbe [sfDir [reps [query ...]]]
package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val names =
      if (args.size > 2) args.drop(2).toSeq
      else Seq("g10i_khop_bfs", "g09i_hits", "s36_ann_graph_beam_multi")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A/B knob: GRAFT_PROBE_AQE=false isolates AQE's per-stage job
      // overhead on the latency-bound superstep kernels
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      }
    })
    val all = graft.SparkEntry.queries ++ graft.Bench.benchOnly
    def runOnce(name: String): (Double, Int, Int, Int, Long) = {
      // give the async listener bus a moment to drain before reading
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      graft.operators.Persists.scoped {
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // give the async listener bus a moment to drain before reading
      Thread.sleep(300)
      spark.catalog.clearCache()
      System.gc()
      (dt, jobs.get(), stages.get(), tasks.get(), taskMs.get())
    }
    runOnce(names.head) // warm-up
    names.foreach { n =>
      val rs = Seq.fill(reps)(runOnce(n))
      val best = rs.minBy(_._1)
      println(f"JOBS $n%-28s wall=${best._1}%7.3f jobs=${best._2}%4d " +
        f"stages=${best._3}%4d tasks=${best._4}%5d taskSec=${best._5 / 1e3}%8.2f " +
        f"raw=${rs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
