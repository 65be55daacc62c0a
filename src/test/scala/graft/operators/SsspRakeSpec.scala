package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** g35 weighted SSSP (cheaper long path wins; hop bound binds) and
  * t32 RAKE (hand-scored phrases, stopword splitting, tie order). */
class SsspRakeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("g35: two-hop detour beats the heavy direct edge; bound binds") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    def run(rounds: Int) =
      GraphOps.weightedSsspOn(e, seeds, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one round: only direct relaxations
    assert(run(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
    // two rounds: the 1→3→2 detour (cost 3) undercuts the direct 10
    assert(run(2) == Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
  }

  test("t32: hand-scored RAKE phrases with stopword splitting") {
    val s = spark
    import s.implicits._
    val rows = TextOps.rakeKeywordsOn(
      Seq((1L, "fast key the fast data")).toDF("doc_id", "text"), k = 3)
      .collect()
      .map(r => r.getInt(1) -> (r.getString(2), r.getDouble(3)))
      .toMap
    // phrases "fast key" / "fast data"; fast deg 4 freq 2 → 2.0;
    // key, data each deg 2 freq 1 → 2.0; both phrases score 4.0,
    // tie broken by phrase text ascending
    assert(rows == Map(1 -> ("fast data", 4.0), 2 -> ("fast key", 4.0)))
  }

  test("t32: a stopword-only doc yields no phrases; dup phrases dedup") {
    val s = spark
    import s.implicits._
    val out = TextOps.rakeKeywordsOn(Seq(
      (1L, "the of and in"),
      (2L, "big table the big table")).toDF("doc_id", "text"), k = 3)
      .collect()
    assert(!out.exists(_.getLong(0) == 1L))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(2) == "big table")
    // big: deg 4 freq 2 → 2.0… distinct phrases: only "big table":
    // big deg 2 freq 1 → 2.0, table 2.0 → phrase 4.0
    assert(d2.head.getDouble(3) == 4.0)
  }
}
