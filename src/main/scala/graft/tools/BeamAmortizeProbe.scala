// The AMORTIZATION answer to BeamDeltaServeProbe's honest loss: s45's
// per-batch inline time lost to s37i (13.9 vs 10.9 s at sf0.1)
// because ONE serve was charged a whole batch's 2-hop maintenance.
// But maintenance is per-BATCH and the walk saving is per-SERVE, so
// the right economics are
//     classic:  M_shared          + Q * W_1hop   (6 rounds)
//     batched:  M_shared + t_hop2 + Q * W_2hop   (3 rounds)
// and the batched discipline wins for every batch that serves more
// than Q* = t_hop2 / (W_1hop - W_2hop) queries. This probe measures
// each phase separately over pre-cached frames (min of `reps`),
// prints Q*, then validates end-to-end by timing Q back-to-back
// serves per discipline at Q around the predicted crossover.
//
// Usage: runMain graft.tools.BeamAmortizeProbe [sfDir [reps]]
package graft.tools

import org.apache.spark.sql.SparkSession

object BeamAmortizeProbe {
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

    // stored artifacts + the shared delta edges, cached OUTSIDE every
    // timer (both disciplines read them; the probe prices the phases
    // on top)
    val storedE = Persists.barrier(
      spark.read.parquet(SimilarityOps.beamBaseEdgesPath(spark, sf))
        .select("src", "dst"))
    val storedH = Persists.barrier(
      spark.read.parquet(SimilarityOps.beamBaseHop2Path(spark, sf))
        .select("src", "dst"))
    println(s"ARTIFACT edges=${storedE.count()} hop2=${storedH.count()}")

    def timed(label: String)(body: => Unit): Double = {
      val ts = Seq.fill(reps) {
        val t0 = System.nanoTime()
        Persists.scoped(body)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMER $label%-16s min=${ts.min}%6.3f " +
        f"raw=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    // per-batch phase 1, SHARED: the delta edge frame (walk-and-link
    // inserts + delta-internal kNN) — both disciplines pay it
    val tDelta = timed("m_delta_shared") {
      SimilarityOps.probeDeltaEdges(spark, sf)
        .write.format("noop").mode("overwrite").save()
    }
    val delta = Persists.barrier(SimilarityOps.probeDeltaEdges(spark, sf))
    delta.count()

    // per-batch phase 2, BATCHED-ONLY: the 2-hop delta maintenance
    val tHop2 = timed("m_hop2_extra") {
      SimilarityOps.hop2DeltaUpdate(storedH, storedE, delta)
        .write.format("noop").mode("overwrite").save()
    }

    // per-serve phases over pre-cached frames
    val updated1 = Persists.barrier(storedE.unionAll(delta))
    val maintainedH = Persists.barrier(
      SimilarityOps.hop2DeltaUpdate(storedH, storedE, delta))
    println(s"FRAMES updated1hop=${updated1.count()} " +
      s"maintained2hop=${maintainedH.count()}")
    val w1 = timed("w_serve_1hop") {
      SimilarityOps.serveWalkOver(spark, sf, updated1, rounds = 6)
        .write.format("noop").mode("overwrite").save()
    }
    val w2 = timed("w_serve_2hop") {
      SimilarityOps.serveWalkOver(spark, sf, maintainedH, rounds = 3)
        .write.format("noop").mode("overwrite").save()
    }

    println(f"SHARED m_delta=$tDelta%.3f")
    if (w1 > w2) {
      val qStar = tHop2 / (w1 - w2)
      println(f"CROSSOVER t_hop2=$tHop2%.3f w1hop=$w1%.3f " +
        f"w2hop=$w2%.3f qstar=$qStar%.1f")
    } else
      // the per-serve walk itself lost: no number of serves amortizes
      // the maintenance, the batched discipline is recall-only here
      println(f"NO-CROSSOVER t_hop2=$tHop2%.3f w1hop=$w1%.3f " +
        f"w2hop=$w2%.3f (2-hop serve not faster)")

    // end-to-end validation: each discipline pays its full per-batch
    // maintenance once, then Q serves
    val qs = if (w1 > w2) {
      val qStar = math.max(1, math.ceil(tHop2 / (w1 - w2)).toInt)
      Seq(1, qStar, 4 * qStar)
    } else Seq(1, 4)
    qs.distinct.foreach { q =>
      val tc = timed(s"e2e_classic_q$q") {
        val u = Persists.barrier(storedE.unionAll(
          SimilarityOps.probeDeltaEdges(spark, sf)))
        (1 to q).foreach { _ =>
          SimilarityOps.serveWalkOver(spark, sf, u, rounds = 6)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val tb = timed(s"e2e_batched_q$q") {
        val d = Persists.barrier(SimilarityOps.probeDeltaEdges(spark, sf))
        val h = Persists.barrier(
          SimilarityOps.hop2DeltaUpdate(storedH, storedE, d))
        (1 to q).foreach { _ =>
          SimilarityOps.serveWalkOver(spark, sf, h, rounds = 3)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"E2E q=$q classic=$tc%.3f batched=$tb%.3f " +
        s"winner=${if (tb < tc) "batched" else "classic"}")
    }
    spark.stop()
  }
}
