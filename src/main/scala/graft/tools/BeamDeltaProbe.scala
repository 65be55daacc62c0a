// Scratch diagnostics for s37: what the serving walk returns for each
// query on the delta-inserted graph vs the rebuilt one, and whether
// vertex 3's inserted edges cover its truth.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BeamDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SimilarityOps
    val truth = SimilarityOps.bruteForceTopK(spark, sf, nQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val delta = SimilarityOps.graphBeamDeltaInsert(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val rebuilt = SimilarityOps.graphBeamAnnMulti(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    (0L until 5L).foreach { q =>
      val t = truth.getOrElse(q, Array.empty).map(_._2).toSet
      val d = delta.getOrElse(q, Array.empty).map(_._2).toSet
      val rb = rebuilt.getOrElse(q, Array.empty).map(_._2).toSet
      println(s"q=$q truth=${t.toSeq.sorted} delta=${d.toSeq.sorted} " +
        s"rebuilt=${rb.toSeq.sorted} missedByDelta=${(t -- d).toSeq.sorted}")
    }
    spark.stop()
  }
}
