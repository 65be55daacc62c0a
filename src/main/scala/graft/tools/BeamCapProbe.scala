// Does degree-capped 2-hop maintenance (s50) repair the serve-latency
// loss BeamAmortizeProbe measured for the uncapped maintained frame
// (5.72 s for 3 rounds over 106k edges vs 4.74 s for 6 rounds over
// 13k)? For cap ∈ {4, 8, 16}: frame size, 3-round serve min-of-reps,
// and aggregate recall@5 vs the full brute truth — alongside the
// 1-hop classic serve and the uncapped frame as the two poles.
//
// Usage: runMain graft.tools.BeamCapProbe [sfDir [reps]]
package graft.tools

import org.apache.spark.sql.SparkSession

object BeamCapProbe {
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
    def aggRecall(m: Map[Long, Set[Long]]): Double =
      truth.keys.toSeq.map { q =>
        val t = truth(q)
        if (t.isEmpty) 1.0
        else m.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum

    def timeServe(label: String, frame: org.apache.spark.sql.DataFrame,
        rounds: Int): Unit = {
      val recall = aggRecall(topSets(
        SimilarityOps.serveWalkOver(spark, sf, frame, rounds)))
      val ts = Seq.fill(reps) {
        val t0 = System.nanoTime()
        Persists.scoped {
          SimilarityOps.serveWalkOver(spark, sf, frame, rounds)
            .write.format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SERVE $label%-14s edges=${frame.count()}%7d " +
        f"rounds=$rounds min=${ts.min}%6.3f recall=$recall%.1f/5 " +
        f"raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val storedE = Persists.barrier(
      spark.read.parquet(SimilarityOps.beamBaseEdgesPath(spark, sf))
        .select("src", "dst"))
    val delta = Persists.barrier(SimilarityOps.probeDeltaEdges(spark, sf))
    // optional 3rd arg: comma-separated subset of
    // classic,uncapped,cap4,cap8,cap16 — run order follows the arg, so
    // JVM-order effects (cache pileup, JIT warmth) can be isolated
    val wanted = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("classic", "uncapped", "cap4", "cap8", "cap16"))
    wanted.foreach {
      case "classic" =>
        val updated1 = Persists.barrier(storedE.unionAll(delta))
        updated1.count()
        timeServe("classic_1hop", updated1, rounds = 6)
      case "uncapped" =>
        val uncapped = Persists.barrier(
          SimilarityOps.deltaMaintainedHop2Frame(spark, sf))
        uncapped.count()
        timeServe("uncapped_2hop", uncapped, rounds = 3)
      case c if c.startsWith("cap") =>
        val cap = c.drop(3).toInt
        val capped = Persists.barrier(
          SimilarityOps.cappedMaintainedFrame(spark, sf, cap = cap))
        capped.count()
        timeServe(s"capped_$cap", capped, rounds = 3)
      case other => println(s"UNKNOWN serve '$other' skipped")
    }
    spark.stop()
  }
}
