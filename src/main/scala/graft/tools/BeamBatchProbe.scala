// The r15 barrier-batching experiment (VERDICT r14 item 6): does
// expanding TWO hops per beam round (against a precomputed 1∪2-hop
// edge frame) halve the graph-beam family's superstep-latency cost
// without losing recall? Prints per-query recall@5 vs brute truth for
// the classic 6-step walk and the batched 3-round walk, plus min-of-N
// wall times for both.
//
// Usage: runMain graft.tools.BeamBatchProbe [sfDir [reps]]
package graft.tools

import org.apache.spark.sql.SparkSession

object BeamBatchProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Persists, SimilarityOps}

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    val truth = topSets(
      SimilarityOps.bruteForceTopK(spark, sf, nQueries = 5, k = 5))
    val classic = topSets(SimilarityOps.graphBeamAnnMulti(spark, sf))
    val batched = topSets(SimilarityOps.graphBeamAnnMultiBatched(spark, sf))
    (0L until 5L).foreach { q =>
      val t = truth.getOrElse(q, Set.empty)
      def rec(m: Map[Long, Set[Long]]) =
        if (t.isEmpty) 1.0
        else m.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      println(f"RECALL q=$q classic=${rec(classic)}%.2f " +
        f"batched=${rec(batched)}%.2f")
    }

    def time(label: String)(body: => Unit): Unit = {
      val ts = Seq.fill(reps) {
        val t0 = System.nanoTime()
        Persists.scoped(body)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMER $label%-16s min=${ts.min}%6.3f " +
        f"raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("classic6") {
      SimilarityOps.graphBeamAnnMulti(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    time("batched3") {
      SimilarityOps.graphBeamAnnMultiBatched(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
