package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Degree-capped 2-hop maintenance (s50): the 2-hop shortcuts are a
  * BUDGETED acceleration structure over the exact 1-hop graph. The
  * invariants that make it safe: the 1-hop substrate survives capping
  * untouched (reachability never drops below the classic walk's),
  * shortcuts respect the per-src budget, nothing outside the uncapped
  * fold is invented, and an unbounded cap degenerates to the uncapped
  * identity frame exactly. */
class CappedHop2Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capped frame: 1-hop substrate intact, shortcuts within budget, " +
      "all edges from the uncapped fold, denser-than-static repaired") {
    val cap = 4
    val capped = edgeSet(
      SimilarityOps.cappedMaintainedFrame(spark, sf, cap = cap))
    val uncapped = edgeSet(
      SimilarityOps.deltaMaintainedHop2Frame(spark, sf))
    // nothing invented: capped ⊆ uncapped (both contain the 1-hop set)
    assert(capped.subsetOf(uncapped),
      "capping invented an edge the uncapped fold does not contain")
    // substrate: every 1-hop edge of the updated graph survives
    val storedE = edgeSet(spark.read
      .parquet(SimilarityOps.beamBaseEdgesPath(spark, sf)))
    assert(storedE.subsetOf(capped),
      "capping dropped a base 1-hop edge — the substrate must be exact")
    // budget: per-src shortcut count (edges beyond 1-hop) ≤ cap needs
    // the updated 1-hop frame; recover it as capped ∩ nothing-to-do —
    // shortcuts are capped minus the FULL 1-hop (base ∪ delta) set,
    // which the uncapped fold also contains, so bound per-src totals:
    // every src's capped degree ≤ its 1-hop degree + cap
    val oneHop = uncapped.intersect(capped) // both hold 1-hop; bound below uses explicit recompute
    val deltaFrameSrcs = capped.groupBy(_._1).view.mapValues(_.size)
    val e1 = {
      // rebuild the exact updated 1-hop set the way the maintainer
      // does: stored base edges ∪ the batch's insert edges — reuse the
      // uncapped frame ∩ (cap=0 run), which is precisely that set
      edgeSet(SimilarityOps.cappedMaintainedFrame(spark, sf, cap = 0))
    }
    assert(e1.subsetOf(capped), "cap=0 run must be exactly the 1-hop set")
    val e1Deg = e1.groupBy(_._1).view.mapValues(_.size).toMap
    deltaFrameSrcs.foreach { case (src, deg) =>
      assert(deg <= e1Deg.getOrElse(src, 0) + cap,
        s"src $src holds ${deg - e1Deg.getOrElse(src, 0)} shortcuts " +
          s"> budget $cap")
    }
    val _ = oneHop
    // the repair: capped density strictly below uncapped
    assert(capped.size < uncapped.size,
      "capping did not reduce the maintained frame at these dials")
  }

  test("unbounded cap degenerates to the uncapped identity frame") {
    val huge = edgeSet(SimilarityOps.cappedMaintainedFrame(spark, sf,
      cap = Int.MaxValue))
    val uncapped = edgeSet(
      SimilarityOps.deltaMaintainedHop2Frame(spark, sf))
    assert(huge == uncapped,
      "with no binding budget the capped fold must equal hop2DeltaUpdate")
  }

  test("s50 serve: rows, contiguous ranks, no duplicates") {
    val out = SimilarityOps.graphBeamDeltaCappedServed(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks: $ranks")
      val nbrs = rs.map(_.getLong(2)).toSeq
      assert(nbrs.distinct.size == nbrs.size,
        s"query $q returned a duplicate neighbor")
    }
  }
}
