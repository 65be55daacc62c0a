// λ sweep for the s13 MMR re-ranker: per λ, the mean relevance of the
// selected set (mean cosine to the query) and its mean redundancy
// (mean pairwise cosine among selected) — the measured trade-off curve
// the operator exists to navigate.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MmrSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val vecsByIdRows = graft.operators.SimilarityOps
      .vecs(spark, sfDir).collect()
    val vecsById = vecsByIdRows
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }

    // the retrieval stage is lambda-independent: fetch once, persist,
    // sweep only the re-rank
    val cands = graft.operators.SimilarityOps
      .mmrCandidates(spark, sfDir).persist()
    println(f"${"lambda"}%7s ${"meanRel"}%8s ${"meanRed"}%8s")
    for (lambda <- Seq(1.0, 0.9, 0.7, 0.5, 0.3)) {
      val sel = graft.operators.SimilarityOps
        .mmrRerankOn(cands, k = 10, lambda = lambda)
        .select("query_id", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      require(sel.nonEmpty, s"empty selection at lambda=$lambda")
      val byQ = sel.groupBy(_._1)
      val meanRel = sel.map(_._3).sum / sel.length
      val reds = byQ.values.flatMap { rows =>
        val ids = rows.map(_._2)
        for {
          i <- ids.indices; j <- (i + 1) until ids.length
        } yield cos(vecsById(ids(i)), vecsById(ids(j)))
      }
      require(reds.nonEmpty, s"no selected pairs at lambda=$lambda")
      val meanRed = reds.sum / reds.size
      println(f"$lambda%7.1f $meanRel%8.4f $meanRed%8.4f")
    }
    spark.stop()
  }
}
