package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** g19/g20 strongly-connected components (coloring/peel kernel):
  * known condensations must come out exactly, direction must matter,
  * and on a symmetrized edge list the kernel must agree with the
  * undirected CC kernels (the g20 shared-oracle claim, locally). */
class SccSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def scc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.sccOn(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("condensation of cycles, chains and a one-way bridge") {
    // 1→2→3→1 (SCC {1,2,3}), 3→4, 4⇄5 (SCC {4,5}), 6→1 (singleton 6):
    // the bridge edges are one-way, so the cycles must NOT merge
    val got = scc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (6L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("direction matters: a directed chain is all singletons") {
    val got = scc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("two-phase peel: an SCC hidden behind a smaller-id DAG ancestor") {
    // 0 → 5, 5⇄6: in peel 1 the {5,6} cycle is colored 0 (its min
    // ancestor) but cannot reach 0, so only {0} peels; peel 2 then
    // finds {5,6}. Exercises the multi-round path explicitly.
    val s = spark
    import s.implicits._
    val (r, peels) = GraphOps.sccWithRounds(
      Seq((0L, 5L), (5L, 6L), (6L, 5L)).toDF("src", "dst"))
    val got = r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 5L -> 5L, 6L -> 5L))
    assert(peels === 2, s"expected 2 peel rounds, got $peels")
  }

  test("on a symmetrized edge list the kernel equals undirected components") {
    val s = spark
    import s.implicits._
    // two undirected components {1,2,3} (a path) and {7,8}
    val und = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.sccOn(sym)
      .select(col("node").as("doc_id"), col("scc_id").as("cluster_id"))
    val cc = DedupOps.connectedComponents(
      und.toDF("id_a", "id_b"))
    assert(got.orderBy("doc_id").collect().toSeq ===
      cc.orderBy("doc_id").collect().toSeq)
  }
}
