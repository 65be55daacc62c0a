// s45's timing half: with BOTH base artifacts stored (1-hop edges +
// the 1∪2-hop frame), does batched serving win the s37 INGEST-BATCH
// path the way s38 won the static path? Each timed run pays the real
// per-batch work — delta insert (walk-and-link against the stored
// base graph) plus 2-hop delta maintenance (s45) or nothing extra
// (classic s37i) — then serves; the artifacts themselves are built
// before any timer starts.
//
// Usage: runMain graft.tools.BeamDeltaServeProbe [sfDir [reps]]
package graft.tools

import org.apache.spark.sql.SparkSession

object BeamDeltaServeProbe {
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

    println(s"ARTIFACT base1hop=${SimilarityOps.beamBaseEdgesPath(spark, sf)}")
    println(s"ARTIFACT base2hop=${SimilarityOps.beamBaseHop2Path(spark, sf)}")

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSets(
      SimilarityOps.bruteForceTopK(spark, sf, nQueries = 5, k = 5))
    val classic = topSets(SimilarityOps.graphBeamDeltaServed(spark, sf))
    val batched = topSets(SimilarityOps.graphBeamDeltaBatchedServed(spark, sf))
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
      println(f"TIMER $label%-18s min=${ts.min}%6.3f " +
        f"raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("classic_delta_srv") {
      SimilarityOps.graphBeamDeltaServed(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    time("batched_delta_srv") {
      SimilarityOps.graphBeamDeltaBatchedServed(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
