package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c34 Neyman allocation (budget respected, caps bind, allocation ∝
  * N·S) and d23 band planning (factorizations complete, S-curve
  * monotone, d02's (8, 4) wins at θ = 0.4). */
class NeymanBandSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

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

  test("c34: per-stratum counts equal the allocation, total ≤ budget") {
    val rows = CurationOps.neymanSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (_, members) =>
      val alloc = members.head.getLong(3)
      assert(members.map(_.getLong(3)).distinct.length == 1)
      assert(members.length == alloc,
        "selected rows per stratum must equal its allocation")
    }
    // floor allocation never exceeds the budget
    assert(bySrc.values.map(_.head.getLong(3)).sum <= 100)
    // selection is deterministic
    val again = CurationOps.neymanSample(spark, sf).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(again == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("d23: all factorizations of 32, monotone S-curve, (8,4) chosen") {
    val rows = DedupOps.bandPlanner(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 4L, 8L, 16L, 32L))
    rows.foreach { case (b, r) =>
      assert(b * r.getLong(1) == 32)
      // more jaccard, more collision probability
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9)
      assert(r.getDouble(4) <= r.getDouble(5) + 1e-9)
    }
    // thresholds: 1.0, .9576, .8409, .5946, .25, .0313 — the closest
    // to θ = 0.4 is b=16 (|0.25 − 0.4| = 0.15 < |0.5946 − 0.4|);
    // pinned so a silent θ/sigLen drift fails loudly
    val chosen = rows.values.filter(_.getBoolean(6)).toSeq
    assert(chosen.size == 1)
    val best = rows.values.minBy(r =>
      (math.abs(r.getDouble(2) - 0.4), r.getLong(0)))
    assert(chosen.head.getLong(0) == best.getLong(0))
    assert(chosen.head.getLong(0) == 16L && chosen.head.getLong(1) == 2L)
  }
}
