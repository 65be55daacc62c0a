package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The MERGE must (a) preserve untouched rows byte-for-byte, (b) let
  * the highest-seq op win per key — including a delete overriding an
  * earlier update, (c) upsert 'U' rows for keys absent from the base,
  * and (d) net out to base − deletes + inserts rows. All asserted on
  * the sf0.001 corpus plus a hand-built history where LWW is the only
  * thing separating right from wrong. */
class CdcOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  test("changeset (key, seq) is unique — the LWW determinism contract") {
    val dup = CdcOps.changeset(spark, sfDir)
      .groupBy("key", "seq").count().filter(col("count") > 1)
    assert(dup.isEmpty, "duplicate (key, seq) would make LWW ambiguous")
  }

  test("merge nets out to base - deletes + inserts, and LWW holds") {
    val sp = spark; import sp.implicits._
    val base = graft.sources.Tables.load(spark, sfDir, "orders")
    val merged = CdcOps.mergeOrders(spark, sfDir)
    val n = base.count()
    val deletes = base.filter(col("o_orderkey") % 10 === 0).count()
    val inserts = base.filter(col("o_orderkey") % 9 === 0).count()
    assert(merged.count() == n - deletes + inserts)

    val orig = base.select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
      .collect().toMap
    val got = merged.select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].collect().toMap

    // the operator's exact cent-grid restatement (see changesetSql doc)
    def restated(p: Double, mult: Int): Double = {
      val cents = math.round(p * 100)
      math.floor((cents * mult + 5) / 10.0) / 100.0
    }
    // %30 keys: seq-1 update then seq-2 delete — the delete must win
    assert(!got.keys.exists(k => k >= 0 && k % 30 == 0))
    // %15-not-%10 keys: two updates, the seq-2 ×1.2 restatement wins
    got.collect { case (k, p) if k >= 0 && k % 15 == 0 && k % 10 != 0 =>
      assert(math.abs(p - restated(orig(k), 12)) < 1e-9,
        s"key $k: expected the seq-2 price, got $p")
    }
    // %5-only keys: the single seq-1 ×1.1 update applies
    got.collect { case (k, p)
        if k >= 0 && k % 5 == 0 && k % 10 != 0 && k % 15 != 0 =>
      assert(math.abs(p - restated(orig(k), 11)) < 1e-9)
    }
    // untouched keys pass through with their original price
    got.collect { case (k, p) if k >= 0 && k % 5 != 0 =>
      assert(p == orig(k), s"untouched key $k was modified")
    }
    // inserted keys (negative mint) exist exactly when the source row
    // matched %9
    val inserted = got.keys.filter(_ < 0).map(k => -k - 1).toSet
    assert(inserted == orig.keys.filter(_ % 9 == 0).toSet)
    val statuses = merged.filter(col("o_orderkey") < 0)
      .select("o_orderstatus").distinct().as[String].collect().toSet
    assert(statuses == Set("N"))
  }

  test("incremental view refresh equals recompute over the merged snapshot") {
    val inc = CdcOps.incrementalView(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val direct = CdcOps.mergeOrders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(inc.keySet == direct.keySet)
    inc.foreach { case (status, (n, rev)) =>
      assert(n == direct(status)._1, s"$status count drifted")
      // the two sums associate differently; cents-level agreement is
      // what refresh-vs-recompute promises on doubles
      assert(math.abs(rev - direct(status)._2) < 0.05,
        s"$status revenue drifted: $rev vs ${direct(status)._2}")
    }
  }

  test("diff of identical snapshots is empty") {
    val base = graft.sources.Tables.load(spark, sfDir, "orders")
    assert(CdcOps.snapshotDiff(base, base, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice")).isEmpty)
  }

  test("diff counts match the changeset's effective changes") {
    val base = graft.sources.Tables.load(spark, sfDir, "orders")
    val byType = CdcOps.diffOrders(spark, sfDir)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("I") == base.filter(col("o_orderkey") % 9 === 0).count())
    assert(byType("D") == base.filter(col("o_orderkey") % 10 === 0).count())
    // every surviving update really moves the price (cent-grid ×1.1 or
    // ×1.2 of a nonzero price), so no U collapses to a no-op
    assert(byType("U") == base.filter(
      col("o_orderkey") % 5 === 0 && col("o_orderkey") % 10 =!= 0).count())
  }

  test("replaying the diff as a changeset reproduces the new snapshot") {
    val base = graft.sources.Tables.load(spark, sfDir, "orders")
    val asChanges = CdcOps.diffOrders(spark, sfDir)
      .withColumnRenamed("change_type", "op")
      .withColumn("seq", lit(1))
    val replayed = CdcOps.merge(base, asChanges, "o_orderkey",
      Seq("o_custkey" -> "o_custkey", "o_orderstatus" -> "o_orderstatus",
        "o_totalprice" -> "o_totalprice"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3))).toSet
    assert(rows(replayed) == rows(CdcOps.mergeOrders(spark, sfDir)))
  }

  test("a 'U' on a key absent from the base upserts") {
    val sp = spark; import sp.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((2L, 1, "U", "b2"), (9L, 1, "U", "new"))
      .toDF("key", "seq", "op", "v")
    val out = CdcOps.merge(base, changes, "k", Seq("v" -> "v"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 9L -> "new"))
  }
}
