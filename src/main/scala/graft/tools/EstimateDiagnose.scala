// Per-subset estimation diagnosis: for one corpus query, compare the
// measured-stats estimator (Selinger NDVs + equi-depth histograms)
// against the TRUE cardinality of every connected subset from the
// CardDump fixture, and print the worst q-errors with their relation
// sets. This is how estimator work stays measurement-first: the regret
// table says WHICH query hurts; this says WHICH subexpression, i.e.
// whether the residual is a marginal (fixable by single-column stats)
// or a join-correlation (it is not).
//
// Usage: runMain graft.tools.EstimateDiagnose [query [corpus [sfDir]]]
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans._

object EstimateDiagnose {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("tree9_sel")
    val corpusName = args.lift(1).getOrElse("job")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val corpus = corpusName match {
      case "core" => ExperimentCorpus.all
      case "job" => JobCorpus.all
      case "tail" => JobCorpus.tails
      case other => sys.error(s"unknown corpus '$other'")
    }
    val cq = corpus.find(_.name == qname)
      .getOrElse(sys.error(s"no query '$qname' in corpus $corpusName"))
    val fixture =
      if (corpusName == "job") "fixtures/cards_job_sf0.001.json"
      else if (corpusName == "tail") "fixtures/cards_tail_sf0.001.json"
      else "fixtures/cards_sf0.001.json"
    val dict = CardinalityStore.parseJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(fixture)))(qname)

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = cq.graph
    val profiles = g.relations.map(n =>
      AliasedRels.profile(spark, sfDir, n, hist = true)).toVector
    val estHist = StatsEstimator.cardinality(g, profiles, cq.filters)
    val estSample = SampleEstimator.cardinality(
      spark, sfDir, g, cq.filters, profiles)

    def relsOf(s: Long): String = {
      var rest = s; val b = Seq.newBuilder[String]
      while (rest != 0) {
        val i = java.lang.Long.numberOfTrailingZeros(rest)
        b += g.relations(i); rest &= rest - 1
      }
      b.result().mkString("+")
    }
    def qerr(e: Double, truth: Double): Double =
      math.max(e / math.max(truth, 1.0), truth / math.max(e, 1.0))
    val rows = (1L to g.full).filter(g.connected).flatMap { s =>
      val key = CardinalityStore.qualifiedKey(g, s, cq.filters)
      dict.get(key).orElse(dict.get(g.cardKey(s))).map { truth =>
        (qerr(estHist(s), truth), qerr(estSample(s), truth),
          estHist(s), estSample(s), truth, relsOf(s),
          java.lang.Long.bitCount(s))
      }
    }
    def geo(vs: Seq[Double]) = math.exp(vs.map(math.log).sum / vs.size)
    println(f"subsets=${rows.size} geomean-q: " +
      f"hist=${geo(rows.map(_._1))}%.2f sample=${geo(rows.map(_._2))}%.2f")
    println("worst 15 by hist q (qHist, qSample, estHist, estSample, true, relations):")
    rows.sortBy(-_._1).take(15).foreach {
      case (qh, qs, eh, es, t, rs, n) =>
        println(f"  qH=$qh%9.1f qS=$qs%7.1f estH=$eh%11.1f " +
          f"estS=$es%9.1f true=$t%9.0f [$n%2d] $rs")
    }
    // per-size profile: where along the join tree does error grow
    println("by subset size (geomean q, hist | sample):")
    rows.groupBy(_._7).toSeq.sortBy(_._1).foreach { case (n, rs) =>
      println(f"  size $n%2d: ${geo(rs.map(_._1))}%8.2f | " +
        f"${geo(rs.map(_._2))}%8.2f  over ${rs.size}%3d")
    }
    spark.stop()
  }
}
