// The r16 follow-up to BeamBatchProbe (VERDICT r15 next #1): with the
// 1∪2-hop frame stored as an INGEST ARTIFACT (beamHop2EdgesPath), does
// the batched walk's halved superstep count finally win wall time at
// serve — the shape the r15 inline negative predicted? Both sides are
// SERVED forms (stored edges, no in-run index build); artifacts are
// prebuilt before any timer starts, so the measured delta is purely
// walk barriers + per-round scoring width.
//
// Usage: runMain graft.tools.BeamServeProbe [sfDir [reps]]
package graft.tools

import org.apache.spark.sql.SparkSession

object BeamServeProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{GraphOps, Persists, SimilarityOps}

    // ingest: both artifacts on disk BEFORE any timing
    val p1 = GraphOps.knnEdgesAllPath(spark, sf)
    val p2 = SimilarityOps.beamHop2EdgesPath(spark, sf)
    println(s"ARTIFACT 1hop=$p1")
    println(s"ARTIFACT 2hop=$p2")

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSets(
      SimilarityOps.bruteForceTopK(spark, sf, nQueries = 5, k = 5))
    val classic = topSets(SimilarityOps.graphBeamAnnMultiServed(spark, sf))
    val batched = topSets(SimilarityOps.graphBeamAnnBatchedServed(spark, sf))
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
    time("classic_served") {
      SimilarityOps.graphBeamAnnMultiServed(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    time("batched_served") {
      SimilarityOps.graphBeamAnnBatchedServed(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
