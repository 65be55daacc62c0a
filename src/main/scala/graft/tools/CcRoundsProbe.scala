// Star-contraction vs label-propagation contrast: both connected-
// component kernels (GraphOps.connectedComponentsStar, g12 /
// DedupOps.connectedComponents, g03+dedup family) on three topologies —
// a long PATH (diameter = n, label-prop's worst case), shallow 8-node
// CLUSTERS (the dedup corpus shape, label-prop's best case), and a
// sparse RANDOM graph. Reports rounds + wall-clock per kernel and
// require()s identical labelings. The measured version of the O(log n)
// vs O(diameter) claim in the g12 docstring (EXPERIMENT_r10.md).
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{DedupOps, GraphOps, Persists}

    def pathGraph(n: Long): DataFrame =
      spark.range(n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    def clusterGraph(n: Long): DataFrame =
      spark.range(n).selectExpr("id AS id_a", "id - id % 8 AS id_b")
        .where("id_a <> id_b")
    def randomGraph(n: Long): DataFrame =
      spark.range(n * 2).selectExpr(
        s"pmod(xxhash64(id), $n) AS id_a",
        s"pmod(xxhash64(id, 7), $n) AS id_b")
        .where("id_a <> id_b")

    val cases = Seq(
      ("path n=64 (diameter 63)", pathGraph(64)),
      ("path n=128 (diameter 127)", pathGraph(128)),
      ("clusters n=1024 (8-node, diameter 2)", clusterGraph(1024)),
      ("random n=512 2n edges", randomGraph(512)))

    println(f"${"topology"}%-38s ${"kernel"}%-10s ${"rounds"}%6s ${"t(s)"}%7s")
    cases.foreach { case (name, pairs) =>
      val p = pairs.localCheckpoint(true)
      def timed(f: => (DataFrame, Int)): (Map[Long, Long], Int, Double) = {
        val t0 = System.nanoTime()
        var out: Map[Long, Long] = null
        var r = 0
        Persists.scoped {
          val (df, rounds) = f
          out = df.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
          r = rounds
        }
        (out, r, (System.nanoTime() - t0) / 1e9)
      }
      val (lp, lpRounds, lpT) = timed(DedupOps.connectedComponentsCounted(p))
      val (st, stRounds, stT) = timed(GraphOps.connectedComponentsStarCounted(p))
      require(lp == st, s"$name: kernels disagree on the labeling")
      println(f"$name%-38s ${"labelprop"}%-10s $lpRounds%6d $lpT%7.2f")
      println(f"$name%-38s ${"star"}%-10s $stRounds%6d $stT%7.2f")
    }
    spark.stop()
  }
}
