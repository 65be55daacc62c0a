package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t14's correctness contract: every served estimate must carry the
  * count-min guarantee against the EXACT counts — never under, over by
  * at most ε·N — and the candidate half (rk, tok, cnt) must be t12's
  * oracle-checked rows verbatim. Also pins the tail: estimates for
  * tokens OUTSIDE the top-k candidates obey the same bound, i.e. the
  * sketch is a full-vocabulary surface, not just a head cache. */
class CmsServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private val eps = 0.001

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    Persists.releaseAll()
    if (spark != null) spark.stop()
  }

  test("served estimates obey the CMS bound over t12's exact counts") {
    val rows = TextOps.cmsServe(spark, sfDir).collect()
    assert(rows.length == 25)
    val n = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).count()
    val exact = TextOps.heavyHitters(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    rows.sortBy(_.getInt(0)).zip(exact.sortBy(_._1)).foreach {
      case (served, (rk, tok, cnt)) =>
        assert((served.getInt(0), served.getString(1), served.getLong(2)) ==
          ((rk, tok, cnt)), "candidate half must be t12's rows")
        val est = served.getLong(3)
        assert(est >= cnt, s"'$tok': CMS undercounted $est < $cnt")
        assert(est - cnt <= (eps * n).toLong + 1,
          s"'$tok': CMS overcounted $est vs $cnt (N=$n)")
    }
  }

  test("merged per-shard sketches serve identically to the single pass") {
    // CMS merge is exact: same eps/confidence/seed => the merged
    // counters are the element-wise sum, so t15 must reproduce t14's
    // estimates bit-for-bit, not just within the bound
    val incremental = TextOps.cmsIncremental(spark, sfDir)
      .orderBy("rk").collect().toSeq
    val singlePass = TextOps.cmsServe(spark, sfDir)
      .orderBy("rk").collect().toSeq
    assert(incremental == singlePass)
  }

  test("merging incompatible sketches fails loudly") {
    graft.functions.GraftFunctions.register(spark)
    val toks = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val a = toks.agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), " +
      "CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val b = toks.agg(expr("count_min_sketch(tok, CAST(0.01 AS DOUBLE), " +
      "CAST(0.99 AS DOUBLE), 7)").as("sk"))
    val ex = intercept[Exception] {
      a.unionByName(b).agg(expr("graft_cms_merge(sk)")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).flatMap(c => Option(c.getMessage)).exists(
        _.contains("incompatible sketches")),
      s"wanted the loud incompatible-merge error, got: $ex")
  }

  test("tail tokens served through the same sketch obey the bound") {
    graft.functions.GraftFunctions.register(spark)
    val tokens = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = tokens.agg(
      expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val n = tokens.count()
    // alphabetically-first vocabulary tokens (whole vocab if smaller):
    // counts outside the head candidates
    val tail = tokens.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy("tok").limit(50)
    val served = tail.crossJoin(broadcast(sketch))
      .select(col("tok"), col("cnt"),
        expr("graft_cms_query(sk, tok)").as("est"))
      .collect()
    assert(served.length > 25, "need probes beyond the head candidates")
    served.foreach { r =>
      val (tok, cnt, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= cnt, s"'$tok': undercount $est < $cnt")
      assert(est - cnt <= (eps * n).toLong + 1,
        s"'$tok': overcount $est vs $cnt (N=$n)")
    }
  }
}
