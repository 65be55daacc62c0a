package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s34 graph-beam ANN: monotone beam improvement in the step dial,
  * determinism, and navigation quality vs the brute ranking on the
  * entry's component. */
class GraphBeamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def best(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getDouble(3)).max).toMap

  test("deeper walks never lose similarity (incumbent-best beams)") {
    val s2 = best(SimilarityOps.graphBeamAnn(spark, sf, steps = 2))
    val s6 = best(SimilarityOps.graphBeamAnn(spark, sf, steps = 6))
    s2.keys.foreach { q =>
      assert(s6(q) >= s2(q) - 1e-9,
        s"query $q: 6-step best ${s6(q)} below 2-step best ${s2(q)}")
    }
  }

  test("deterministic across runs; ranks contiguous; self excluded") {
    val a = SimilarityOps.graphBeamAnn(spark, sf).collect()
    val b = SimilarityOps.graphBeamAnn(spark, sf).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet && a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getLong(2) != q))
    }
  }
}
