package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spark smoke over sf0.001: a handful of known-answer checks plus
  * structural invariants of the pipeline operators. The full oracle
  * cross-check against DuckDB runs via Verify + tools/check_oracle.py
  * (and the driver's own gate); this spec just keeps `sbt test`
  * self-contained and fast. */
class SparkQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() == 1)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("distinct flags are the known 3x2 domain") {
    val rows = run("q10_distinct").collect()
    assert(rows.length == 6)
  }

  test("planner queries all agree with the declarative flagship") {
    val expected = run("q03_flagship").collect().toSeq.map(_.toSeq)
    Seq("p01_planner_dpccp", "p02_planner_leftdeep",
        "p03_planner_greedy", "p04_planner_random").foreach { p =>
      assert(run(p).collect().toSeq.map(_.toSeq) == expected, s"$p diverged")
    }
  }

  test("minhash pairs are symmetric-free and above threshold") {
    val rows = run("d02_dedup_minhash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not ordered a<b")
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("simhash pairs within hamming bound") {
    val rows = run("d03_dedup_simhash").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(2) <= 3))
  }

  test("ann brute-force: 5 queries x 10 ranked neighbors, cosine sorted") {
    val rows = run("s01_ann_brute").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    assert(rows.length == 50)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to 10))
      val cos = byRank.map(_._3).toSeq
      assert(cos == cos.sorted.reverse, "cosine not descending with rank")
    }
  }

  test("lsh ann neighbors are a subset-of-brute-force sanity (per query)") {
    val brute = run("s01_ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = run("s02_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // LSH returns *some* overlap with the true top-k (recall sanity)
    val overlap = lsh.count(brute.contains)
    assert(overlap > 0, "LSH found zero true neighbors")
  }

  test("ivf ann: well-formed ranks and some overlap with brute force") {
    val rows = run("s04_ann_ivf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val ranks = g.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size), "ranks must be dense from 1")
    }
    val brute = run("s01_ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = rows.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains)
    assert(overlap > 0, "IVF found zero true neighbors")
  }

  test("events daily agg covers the full date range without nulls") {
    val rows = run("q26_events_daily").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.isNullAt(0)))
  }
}
