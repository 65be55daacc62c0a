// IVF multi-probe sweep: measures the recall/latency trade the nprobe
// dial buys — IVF top-k vs brute-force ground truth for nprobe = 1..8.
// Results are committed as the recall table in SCALE_r6.md; s04 gates
// nprobe=2, s08 gates nprobe=4 (SimilarityOps.MultiProbe).
package graft.tools

import org.apache.spark.sql.SparkSession

object IvfProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Persists, SimilarityOps}

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      var out: Map[Long, Set[Long]] = Map.empty
      Persists.scoped {
        out = df.select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).view
          .mapValues(_.map(_.getLong(1)).toSet).toMap
      }
      out
    }
    val truth = topSets(SimilarityOps.bruteForceTopK(spark, sfDir))
    def sweep(probes: Seq[Int], run: Int => org.apache.spark.sql.DataFrame): Unit =
      probes.foreach { p =>
        def once(): (Double, Map[Long, Set[Long]]) = {
          val t0 = System.nanoTime()
          val s = topSets(run(p))
          ((System.nanoTime() - t0) / 1e9, s)
        }
        val (_, got) = once() // cold: codegen + planning, not reported
        val (sec, _) = once()
        val recall = truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
        }.sum / truth.size
        println(f"$p%6d  $recall%9.3f  $sec%10.3f")
      }

    println(f"nprobe  recall@10  steady_sec  (modular sample, corpus $sfDir)")
    sweep(1 to 8, p => SimilarityOps.ivfTopK(spark, sfDir, nprobe = p))

    // the round-7 trained model: train ONCE (serving never retrains),
    // sweep the probe dial over the fixed model
    import org.apache.spark.sql.functions.{col, expr}
    graft.functions.GraftFunctions.register(spark)
    val all = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
    val cached = Persists.barrier(all)
    val cents = SimilarityOps.trainCentroids(cached, cached.count(),
      SimilarityOps.TrainedCells, SimilarityOps.TrainedIters)
    println(f"nprobe  recall@10  steady_sec  " +
      f"(k-means C=${cents.size}, iters=${SimilarityOps.TrainedIters})")
    sweep(Seq(2, 4, 6, 8, 10, 12), p =>
      SimilarityOps.ivfSearch(spark, cached, 0L until cents.size.toLong,
        cents, 5, 10, p))
    spark.stop()
  }
}
