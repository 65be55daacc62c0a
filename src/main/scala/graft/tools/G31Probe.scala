// Scratch probe (optimization round 16): attribute g31's wall time —
// inline kNN build vs wedge scoring vs the 3 AUC passes.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object G31Probe {
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
    import graft.operators.{GraphOps, Persists}
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up
    Persists.scoped { noop(graft.SparkEntry.queries("q01_scan_project")(spark, sfDir)) }
    for (i <- 1 to 2) {
      Persists.scoped {
        val t0 = System.nanoTime()
        val edges = GraphOps.mutualKnnEdgesOn(
          graft.operators.SimilarityOps.vecs(spark, sfDir))
          .localCheckpoint(true)
        val n = edges.count()
        val t1 = System.nanoTime()
        println(f"KNN n=$n t=${(t1 - t0) / 1e9}%.2f s")
        noop(GraphOps.linkPredAucOn(edges))
        val t2 = System.nanoTime()
        println(f"EVAL t=${(t2 - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
