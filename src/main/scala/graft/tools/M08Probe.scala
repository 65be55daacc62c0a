// Scratch probe (optimization round 16): where does m08's time go?
// Measures the hamming<=16 pair frame size, then times + counts rounds
// of the shared label-prop CC vs the star-contraction kernel on it.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object M08Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{DedupOps, GraphOps, MultimodalOps, Persists}
    Persists.scoped {
      val d = MultimodalOps.mediaTable(spark, sfDir)
        .select(col("media_id"), expr("decode(payload, 'utf-8')").as("txt"))
      val t0 = System.nanoTime()
      val pairs = MultimodalOps.ahashCandidatesOn(d)
        .filter(col("hamming") <= 16)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      println(f"PAIRS n=$nPairs built=${(t1 - t0) / 1e9}%.2f s")
      val (lab1, r1) = DedupOps.connectedComponentsCounted(pairs)
      val n1 = lab1.count()
      val t2 = System.nanoTime()
      println(f"LABELPROP rounds=$r1 nodes=$n1 t=${(t2 - t1) / 1e9}%.2f s")
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        .split("\n").filter(l => l.contains("graft") ||
          l.contains("TotalTime") || l.contains("EagerAgg") ||
          l.contains("SelfJoin") || l.contains("OuterJoinRemoval"))
        .mkString("\n"))
      val (lab2, r2) = GraphOps.connectedComponentsStarCounted(pairs)
      val n2 = lab2.count()
      val t3 = System.nanoTime()
      println(f"STAR rounds=$r2 nodes=$n2 t=${(t3 - t2) / 1e9}%.2f s")
      Seq("spark.graft.joinReorder.enabled",
        "spark.graft.outerJoinElim.enabled",
        "spark.graft.selfJoinElim.enabled",
        "spark.graft.eagerAgg.enabled").foreach(k =>
        spark.conf.set(k, "false"))
      val t4 = System.nanoTime()
      val (lab3, r3) = DedupOps.connectedComponentsCounted(pairs)
      val n3 = lab3.count()
      val t5 = System.nanoTime()
      println(f"LABELPROP-NORULES rounds=$r3 nodes=$n3 t=${(t5 - t4) / 1e9}%.2f s")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t6 = System.nanoTime()
      val (lab4, r4) = DedupOps.connectedComponentsCounted(pairs)
      val n4 = lab4.count()
      val t7 = System.nanoTime()
      println(f"LABELPROP-NORULES-NOAQE rounds=$r4 nodes=$n4 t=${(t7 - t6) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
