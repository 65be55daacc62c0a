package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r14 item 2: the feedback dictionary and the profile/
  * synopsis caches must not serve STALE numbers after a table is
  * regenerated AT THE SAME PATH (the driver did exactly this to
  * testdata at round 9). Observation keys carry a listing-fingerprint
  * epoch ([[ExecutionFeedback.epochOf]]); profile memos key on the
  * same listing fingerprint — so an in-place overwrite invalidates
  * exactly that table's entries while untouched tables keep theirs. */
class FeedbackStalenessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "target/tmp/staleness_spec"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  override def afterAll(): Unit = {
    ExecutionFeedback.clear()
    if (spark != null) spark.stop()
  }

  private def writeTable(name: String, rows: Int): String = {
    val path = s"$dir/$name.parquet"
    val s = spark
    import s.implicits._
    (1 to rows).map(i => (i.toLong, s"v${i % 7}"))
      .toDF("k", "s").repartition(1)
      .write.mode("overwrite").parquet(path)
    path.stripSuffix(".parquet")
  }

  test("regenerating a table at the same path rotates its epoch; " +
      "untouched tables keep theirs") {
    val t = writeTable("alpha", 50)
    val u = writeTable("beta", 30)
    val epochT1 = ExecutionFeedback.epochOf(t)
    val epochU1 = ExecutionFeedback.epochOf(u)
    val key1 = ExecutionFeedback.leafKey(t, Seq.empty)
    ExecutionFeedback.record(key1, 50.0)

    writeTable("alpha", 200) // regenerate IN PLACE
    val epochT2 = ExecutionFeedback.epochOf(t)
    assert(epochT2 != epochT1, "overwrite must rotate the epoch")
    assert(ExecutionFeedback.epochOf(u) == epochU1,
      "an untouched table's epoch must survive")
    // the planning/harvest sides derive keys FRESH: the new key
    // cannot resolve the stale observation
    val key2 = ExecutionFeedback.leafKey(t, Seq.empty)
    assert(key2 != key1)
    assert(ExecutionFeedback.lookup(key2).isEmpty,
      "stale observation served after regeneration")
    assert(ExecutionFeedback.lookup(key1).contains(50.0),
      "the stale entry itself survives (it is just never consulted)")
  }

  test("profile memo re-profiles after an in-place overwrite") {
    writeTable("gamma", 40)
    val p1 = StatsEstimator.profileTable(spark, dir, "gamma")
    assert(p1.rows == 40.0)
    writeTable("gamma", 160)
    val p2 = StatsEstimator.profileTable(spark, dir, "gamma")
    assert(p2.rows == 160.0,
      s"stale profile served after regeneration: rows=${p2.rows}")
    // histogram bounds refresh on the same signal
    val h2 = StatsEstimator.profileTableHist(spark, dir, "gamma")
    assert(h2.rows == 160.0 && h2.bounds.contains("k"))
    assert(h2.bounds("k").last > 40.0,
      s"stale equi-depth bounds: ${h2.bounds("k")}")
  }

  test("the synopsis cache shares the signal (sampleRel re-collects)") {
    writeTable("delta", 25)
    val s1 = AutoEstimator.fullSynopsis(spark, dir, "delta")
    assert(s1.rows.size == 25)
    writeTable("delta", 75)
    val s2 = AutoEstimator.fullSynopsis(spark, dir, "delta")
    assert(s2.rows.size == 75,
      s"stale synopsis served after regeneration: ${s2.rows.size} rows")
  }

  test("superseded-epoch entries EVICT — repeated in-place " +
      "regeneration does not grow the memos (ADVICE r15)") {
    // unit semantics first: same identity prefix, different epoch →
    // the stale key goes; a different identity survives
    val m = new java.util.concurrent.ConcurrentHashMap[
      (String, String, String), String]()
    m.put(("d", "t", "epoch1"), "old")
    m.put(("d", "u", "epoch9"), "other")
    graft.sources.Tables.evictStaleEpochs(m, ("d", "t", "epoch2"))
    assert(!m.containsKey(("d", "t", "epoch1")), "stale epoch must evict")
    assert(m.containsKey(("d", "u", "epoch9")), "other identity survives")
    // integration: load/count/profile a table, then regenerate it in
    // place 3× re-deriving each time — every fp-keyed memo must hold
    // ONE entry per identity, not one per epoch
    writeTable("epsilon", 20)
    graft.sources.Tables.load(spark, dir, "epsilon")
    graft.sources.Tables.rowCount(spark, dir, "epsilon")
    StatsEstimator.profileTable(spark, dir, "epsilon")
    val t0 = graft.sources.Tables.cacheSizes
    val s0 = StatsEstimator.cacheSizes
    for (n <- Seq(21, 22, 23)) {
      writeTable("epsilon", n)
      graft.sources.Tables.load(spark, dir, "epsilon")
      graft.sources.Tables.rowCount(spark, dir, "epsilon")
      StatsEstimator.profileTable(spark, dir, "epsilon")
    }
    assert(graft.sources.Tables.cacheSizes == t0,
      s"Tables memos grew across regenerations: $t0 -> " +
        s"${graft.sources.Tables.cacheSizes}")
    assert(StatsEstimator.cacheSizes == s0,
      s"StatsEstimator memos grew: $s0 -> ${StatsEstimator.cacheSizes}")
  }
}
