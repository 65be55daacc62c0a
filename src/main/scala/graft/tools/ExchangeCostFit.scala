// Per-operator cost calibration with within-query EXCHANGE variation
// (VERDICT r15 next #5). C_out prices a join by its OUTPUT, so it is
// blind to the physical work Spark chooses per join — broadcast a tiny
// build side (no exchange on either input) vs shuffle both sides — and
// dcycle8's within-query ρ=−0.13 is that blindness measured. This tool
// fits the constants of a plan-time PHYSICAL model on the exch
// calibration corpus (three shapes run under a TIGHTENED broadcast
// gate, GRAFT_BROADCAST_ROWS=200000, so tree choice genuinely flips
// the broadcast/shuffle structure — under the default 1M-row gate
// every sf0.1 side broadcasts and the shuffle constant is
// unidentifiable; the tight gate is the regime a 100× SF hits
// naturally) and judges it on the HELD-OUT wide corpus: accept only
// if within-query ranking improves there — else the negative is the
// result, recorded like r15's hybrid rejection.
//
// The model prices a tree GIVEN the physical rule in force (the same
// row gate its execution ran under — JoinTreeExecutor.build):
//   per join: min side ≤ gate → broadcast: cB·build + cP·probe + cO·out
//             else both sides exchange:     cS·(|L|+|R|)     + cO·out
// All terms are plan-time computable from the estimate ladder; here
// they are evaluated under injected truth, the same regime the
// experiment's C_out records use.
//
// Usage: runMain graft.tools.ExchangeCostFit \
//   [calibJson [evalJson [calibCards [evalCards [calibGate [evalGate]]]]]]
package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._
import graft.plans._

object ExchangeCostFit {

  /** One recorded (query, tree) point with its physical features. */
  final case class Pt(query: String, order: String, runtimeMs: Double,
      outRows: Double, shufRows: Double, buildRows: Double,
      probeRows: Double, nShuffleJoins: Int, nBroadcastJoins: Int) {
    def couts: Double = outRows
  }

  /** Parse the reference-format join-order string
    * ("JOIN (A , B)" nested) back into a JoinTree over `g`. */
  def parseTree(s: String, g: QueryGraph): JoinTree = {
    val t = s.trim
    if (t.startsWith("JOIN")) {
      val inner = t.stripPrefix("JOIN").trim.stripPrefix("(").stripSuffix(")")
      var depth = 0
      var cut = -1
      var i = 0
      while (i < inner.length && cut < 0) {
        inner.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => cut = i
          case _ =>
        }
        i += 1
      }
      require(cut > 0, s"unparseable join order: $s")
      Node(parseTree(inner.substring(0, cut), g),
        parseTree(inner.substring(cut + 1), g))
    } else {
      val i = g.relations.indexOf(t)
      require(i >= 0, s"unknown relation '$t' in: $s")
      Leaf(i)
    }
  }

  /** (query, tree-order, min runtime) triples from an experiment
    * artifact's executed C_out records, deduped per distinct tree. */
  def loadRecords(path: String): Seq[(String, String, Double)] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val byKey = scala.collection.mutable.Map.empty[(String, String), Double]
    root.get("records").elements().asScala.foreach { r =>
      val runtimes = r.get("runtimesMs").elements().asScala
        .map(_.asDouble()).toSeq
      if (!r.get("cost").isNull && runtimes.nonEmpty &&
          r.get("costModel").asText() == "cout") {
        val key = (r.get("query").asText(), r.get("joinOrder").asText())
        val rt = runtimes.min
        byKey.get(key) match {
          case Some(old) if old <= rt =>
          case _ => byKey(key) = rt
        }
      }
    }
    byKey.toSeq.map { case ((q, o), rt) => (q, o, rt) }
  }

  /** Physical features of one tree under injected-truth cards and the
    * row gate its execution ran under. */
  def featurize(query: String, order: String, runtimeMs: Double,
      g: QueryGraph, card: Cardinality, gateRows: Double): Pt = {
    val tree = parseTree(order, g)
    var out = 0.0; var shuf = 0.0; var build = 0.0; var probe = 0.0
    var nS = 0; var nB = 0
    JoinTree.internalNodes(tree).foreach { n =>
      val cl = card(n.l.set); val cr = card(n.r.set)
      out += card(n.l.set | n.r.set)
      if (math.min(cl, cr) <= gateRows) {
        nB += 1
        build += math.min(cl, cr)
        probe += math.max(cl, cr)
      } else {
        nS += 1
        shuf += cl + cr
      }
    }
    Pt(query, order, runtimeMs, out, shuf, build, probe, nS, nB)
  }

  /** Plain least squares of y on 1+features (normal equations). */
  def lsq(xs: Seq[Seq[Double]], y: Seq[Double]): (Seq[Double], Double) = {
    val x = xs.map(1.0 +: _)
    val d = x.head.size
    val a = Array.ofDim[Double](d, d + 1)
    for (i <- 0 until d) {
      for (j <- 0 until d) a(i)(j) = x.map(r => r(i) * r(j)).sum
      a(i)(d) = x.zip(y).map { case (r, v) => r(i) * v }.sum
    }
    for (i <- 0 until d) {
      val piv = (i until d).maxBy(r => math.abs(a(r)(i)))
      val t = a(i); a(i) = a(piv); a(piv) = t
      for (r <- 0 until d if r != i && a(i)(i) != 0) {
        val f = a(r)(i) / a(i)(i)
        for (c <- 0 to d) a(r)(c) -= f * a(i)(c)
      }
    }
    val coef = (0 until d).map(i =>
      if (a(i)(i) == 0) 0.0 else a(i)(d) / a(i)(i))
    val pred = x.map(r => r.zip(coef).map { case (v, c) => v * c }.sum)
    val my = y.sum / y.size
    val ssTot = y.map(v => (v - my) * (v - my)).sum
    val ssRes = y.zip(pred).map { case (v, p) => (v - p) * (v - p) }.sum
    (coef, if (ssTot == 0) 0.0 else 1.0 - ssRes / ssTot)
  }

  /** Build feature points for every record of `artifact`, resolving
    * each query against `corpus` and the truth fixture at `cards`. */
  def pointsOf(artifact: String, cards: String,
      corpus: Seq[ExperimentCorpus.CorpusQuery],
      gateRows: Double): Seq[Pt] = {
    val byName = corpus.map(cq => cq.name -> cq).toMap
    val dict = CardinalityStore.parseJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(cards)))
    loadRecords(artifact).flatMap { case (q, order, rt) =>
      byName.get(q).flatMap { cq =>
        dict.get(q).map { m =>
          val base = cq.graph.relations.indices.map { i =>
            val k = CardinalityStore.qualifiedKey(cq.graph, 1L << i, cq.filters)
            m.getOrElse(k, 1.0)
          }.toArray
          val store = new CardinalityStore(cq.graph, m,
            HeuristicCardinality.uniform(cq.graph, base), cq.filters)
          featurize(q, order, rt, cq.graph, store, gateRows)
        }
      }
    }
  }

  def perQueryRho(pts: Seq[Pt], score: Pt => Double): Map[String, Double] =
    pts.groupBy(_.query).filter(_._2.size >= 3).map { case (q, ts) =>
      q -> CostModelValidation.spearman(ts.map(score), ts.map(_.runtimeMs))
    }

  def main(args: Array[String]): Unit = {
    val calib = args.lift(0).getOrElse(
      "fixtures/experiment_exch_sf01_r16.json")
    val eval = args.lift(1).getOrElse(
      "fixtures/experiment_wide_sf01_r15.json")
    val calibCards = args.lift(2).getOrElse("fixtures/cards_exch_sf0.1.json")
    val evalCards = args.lift(3).getOrElse("fixtures/cards_wide_sf0.1.json")
    val calGate = args.lift(4).map(_.toDouble).getOrElse(200000.0)
    val evalGate = args.lift(5).map(_.toDouble).getOrElse(1000000.0)

    val cal = pointsOf(calib, calibCards, ExperimentCorpus.exch, calGate)
    val ev = pointsOf(eval, evalCards, ExperimentCorpus.wide, evalGate)

    println(s"calibration points=${cal.size} (gate=$calGate rows) " +
      s"eval points=${ev.size} (gate=$evalGate rows)")
    (cal.groupBy(_.query).toSeq ++ ev.groupBy(_.query).toSeq)
      .sortBy(_._1).foreach { case (q, ts) =>
        val nbs = ts.map(_.nBroadcastJoins)
        val nss = ts.map(_.nShuffleJoins)
        println(s"  $q trees=${ts.size} broadcastJoins=[${nbs.min}..${nbs.max}]" +
          s" shuffleJoins=[${nss.min}..${nss.max}] runtimeSpread=" +
          f"${ts.map(_.runtimeMs).max / ts.map(_.runtimeMs).min}%.1fx")
      }

    // fit runtime (seconds) on Mrow-scaled volume features
    def feats(p: Pt) = Seq(p.shufRows / 1e6, p.buildRows / 1e6,
      p.probeRows / 1e6, p.outRows / 1e6)
    val (coef, r2) = lsq(cal.map(feats), cal.map(_.runtimeMs / 1000.0))
    println(f"fit: rt_sec ~ ${coef(0)}%.3f + ${coef(1)}%.3f*shufM + " +
      f"${coef(2)}%.3f*buildM + ${coef(3)}%.3f*probeM + " +
      f"${coef(4)}%.3f*outM   R2=$r2%.3f")
    val signsOk = coef.drop(1).forall(_ >= 0)
    println(s"signs: ${if (signsOk) "all volume coefficients >= 0"
      else "NEGATIVE volume coefficient - structural rejection"}")

    def exchScore(p: Pt): Double =
      coef(1) * p.shufRows / 1e6 + coef(2) * p.buildRows / 1e6 +
        coef(3) * p.probeRows / 1e6 + coef(4) * p.outRows / 1e6

    val rhoCout = perQueryRho(ev, _.couts)
    val rhoExch = perQueryRho(ev, exchScore)
    println("held-out wide corpus, within-query Spearman (cout vs exch):")
    rhoCout.keys.toSeq.sorted.foreach { q =>
      println(f"  $q%-9s cout=${rhoCout(q)}%+.3f  exch=${rhoExch(q)}%+.3f")
    }
    val mC = rhoCout.values.sum / rhoCout.size
    val mE = rhoExch.values.sum / rhoExch.size
    println(f"mean rho: cout=$mC%+.3f exch=$mE%+.3f  " +
      f"dcycle8: cout=${rhoCout.getOrElse("dcycle8", Double.NaN)}%+.3f " +
      f"exch=${rhoExch.getOrElse("dcycle8", Double.NaN)}%+.3f")
    val accept = signsOk && mE > mC &&
      rhoExch.getOrElse("dcycle8", -1.0) >
        rhoCout.getOrElse("dcycle8", 1.0)
    println(s"verdict: ${if (accept) "ACCEPT - exchange model improves " +
      "held-out within-query ranking" else "REJECT - record the negative"}")
  }
}
