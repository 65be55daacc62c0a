package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the t16 Jensen-Shannon shard divergence: the
  * information-theoretic invariants (zero iff identical distributions,
  * symmetry in the shards, total bounded by ln 2) plus a hand-computed
  * two-token fixture. */
class ShardDivergenceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def jsd(rows: Seq[(Int, String)]): Map[String, Double] = {
    val s = spark
    import s.implicits._
    TextOps.shardDivergenceOn(rows.toDF("shard", "text")).collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Double]("jsd")).toMap
  }

  test("identical shard distributions diverge by exactly zero") {
    val got = jsd(Seq((0, "a a b"), (1, "a a b")))
    assert(got.keySet == Set("a", "b"))
    got.values.foreach(v => assert(v == 0.0))
  }

  test("hand fixture: disjoint vocabularies hit the ln2 ceiling") {
    // shard0 = all "x", shard1 = all "y": p/q disjoint, every token
    // contributes p * ln(2) / 2; total = ln 2 (the JSD maximum)
    val got = jsd(Seq((0, "x x"), (1, "y y y")))
    val half = math.log(2) / 2
    assert(math.abs(got("x") - half) < 1e-6)
    assert(math.abs(got("y") - half) < 1e-6)
    assert(math.abs(got.values.sum - math.log(2)) < 1e-6)
  }

  test("symmetry: swapping the shards leaves every contribution fixed") {
    val a = Seq((0, "a b b c"), (1, "a a c d"))
    val b = a.map { case (sh, t) => (1 - sh, t) }
    assert(jsd(a) == jsd(b))
  }

  test("total divergence is non-negative and bounded by ln 2") {
    val got = jsd(Seq((0, "a b c a"), (1, "b c d d d")))
    got.values.foreach(v => assert(v >= 0.0))
    val total = got.values.sum
    assert(total > 0.0 && total <= math.log(2) + 1e-9)
  }
}
