// Evidence for the s42 compaction threshold: the merge-on-read serve
// (s39 — deleted nodes route, never surface) is claimed to DECAY as
// the tombstone fraction grows, because live beam slots and edges are
// spent on nodes that can never be answers. This probe measures it:
// for a ladder of takedown fractions (vec_id % mod = 0), per-query
// recall@5 of the merge-on-read serve and the compacted serve against
// the SURVIVOR brute-force truth. Where the curves separate is where
// a threshold earns its value; if they never separate, the honest
// conclusion is that compaction at these dials is about storage/route
// hygiene, not recall.
//
// Usage: runMain graft.tools.TombstoneDecayProbe [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TombstoneDecayProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Persists, SimilarityOps}
    graft.functions.GraftFunctions.register(spark)

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

    // survivor brute truth per mod: exact top-5 over vectors the
    // takedown keeps (queries stay the external 0..4 set)
    def survivorTruth(mod: Int): Map[Long, Set[Long]] = {
      val all = Persists.barrier(SimilarityOps.vecs(spark, sf))
      val surv = all.filter(pmod(col("vec_id"), lit(mod)) =!= 0)
      val q = all.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      topSets(surv.select(col("vec_id").as("neighbor_id"), col("v"))
        .crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(expr("graft_cosine(qv, v)"), 4).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id")))
    }

    println("mod  frac   aggR@5(merge-on-read)  aggR@5(compacted)")
    Seq(41, 11, 7, 5, 3).foreach { mod =>
      val truth = survivorTruth(mod)
      def agg(m: Map[Long, Set[Long]]): Double =
        truth.keys.toSeq.map { q =>
          val t = truth(q)
          if (t.isEmpty) 1.0
          else m.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
        }.sum
      val mor = agg(topSets(
        SimilarityOps.graphBeamAnnTombstonedServed(spark, sf, mod = mod)))
      val comp = agg(topSets(
        SimilarityOps.graphBeamAnnCompactedServed(spark, sf, mod = mod)))
      println(f"$mod%3d  ${1.0 / mod}%.3f  $mor%8.2f / 5           $comp%8.2f / 5")
    }
    spark.stop()
  }
}
