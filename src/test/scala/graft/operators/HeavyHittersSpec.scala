package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t12 exact heavy hitters vs an independent in-memory count, plus the
  * count-min-sketch contract: CMS estimates NEVER undercount and
  * overcount by at most eps·N — the property that makes CMS +
  * exact-candidate-rescoring a sound two-pass heavy-hitter plan when
  * even the vocabulary is memory-bound (streaming ingest, per-executor
  * sketch merge). */
class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def exactCounts: Map[String, Long] = {
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
  }

  test("exact top-k matches an independent in-memory count") {
    val want = exactCounts.toSeq
      .sortBy { case (tok, cnt) => (-cnt, tok) }.take(25)
      .zipWithIndex.map { case ((tok, cnt), i) => (i + 1, tok, cnt) }
    val got = TextOps.heavyHitters(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == want)
  }

  test("count-min sketch never undercounts and overcounts <= eps*N") {
    val eps = 0.001
    val toks = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toks.stat.countMinSketch("tok", eps, 0.99, 42)
    val exact = exactCounts
    val n = exact.values.sum
    // check the hitters AND a spread of tail tokens — undercount is
    // impossible by construction, the bound is what the seed must meet
    val probes = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(25) ++
      exact.toSeq.sortBy(_._1).take(50)
    probes.foreach { case (tok, cnt) =>
      val est = sketch.estimateCount(tok)
      assert(est >= cnt, s"'$tok': CMS undercounted $est < $cnt")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"'$tok': CMS overcounted $est vs $cnt (N=$n)")
    }
  }
}
