// Min-of-N per-query timer in one JVM — noise-resistant comparison of
// individual bench queries (machine variance makes single-shot Bench
// runs unreliable for A/B work).
// Usage: runMain graft.tools.QueryTimer [sfDir [reps [query ...]]]
package graft.tools

import org.apache.spark.sql.SparkSession

object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val names =
      if (args.size > 2) args.drop(2).toSeq
      else Seq("d02_dedup_minhash", "s01_ann_brute", "s02_ann_lsh",
        "s04_ann_ivf", "d01_dedup_exact")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries ++ graft.Bench.benchOnly
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.operators.Persists.scoped {
        all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    runOnce(names.head) // warm-up
    names.foreach { n =>
      val ts = Seq.fill(reps)(runOnce(n))
      println(f"TIMER $n%-22s min=${ts.min}%6.3f " +
        f"raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
