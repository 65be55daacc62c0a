package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col}

/** One base relation of a planned query: a DataFrame plus its local
  * predicate. Filters are attached to the leaf BEFORE joining so Catalyst
  * sees `scan → filter → join` and pushes the predicate into the parquet
  * scan (the reference gets the same via FilterJoinRule.FILTER_ON_JOIN in
  * every rule set, QueryOptExperiment.java:83-104). */
final case class RelInput(name: String, df: DataFrame, filter: Option[Column] = None) {
  def filtered: DataFrame = filter.map(df.filter).getOrElse(df)
}

/** Materializes a [[JoinTree]] chosen by an enumerator as a DataFrame
  * join tree in EXACTLY that shape. Spark-first: we don't fight Catalyst
  * with a custom physical operator — we hand it the logical order and
  * let it pick hash/merge/broadcast physically. The reference likewise
  * only fixes the logical order and lets Postgres execute
  * (SURVEY.md §4.3).
  *
  * Scale notes (100 TB):
  *  - sides whose planned cardinality is below `broadcastRows` get an
  *    explicit `broadcast()` hint — dimension tables never shuffle;
  *  - everything else shuffles on the join keys once, and AQE can still
  *    re-plan skew at runtime;
  *  - column names in the testdata are globally unique, so equi-conds
  *    resolve unambiguously on the joined frame.
  */
object JoinTreeExecutor {

  def build(
      tree: JoinTree,
      g: QueryGraph,
      rels: Vector[RelInput],
      card: Cardinality,
      broadcastRows: Long = 1000000L,
      semiJoins: Map[Int, Seq[JoinEdge]] = Map.empty): DataFrame = {

    def mk(t: JoinTree): DataFrame = t match {
      case Leaf(i) =>
        // chosen semijoins ([[SemiJoinSelection]]): pre-filter the fact
        // scan by each filtered dimension's join keys — LEFT SEMI against
        // the broadcast dim, result-neutral for the inner-join class
        semiJoins.getOrElse(i, Nil).foldLeft(rels(i).filtered) { (df, e) =>
          val dimIdx = if (e.a == i) e.b else e.a
          val cond = e.conds.map { case (ca, cb) =>
            val (fc, dc) = if (e.a == i) (ca, cb) else (cb, ca)
            col(fc) === col(dc)
          }.reduce(_ && _)
          // same cardinality gate as the Node case below: a large or
          // weakly-filtered dimension must NOT be force-broadcast (driver
          // OOM at scale) — it still pre-filters via a shuffled semi join
          val dim = rels(dimIdx).filtered
          val hinted =
            if (card(1L << dimIdx) <= broadcastRows.toDouble) broadcast(dim)
            else dim
          df.join(hinted, cond, "left_semi")
        }
      case Node(l, r) =>
        val lf = mk(l); val rf = mk(r)
        val conds: Seq[Column] = g.crossEdges(l.set, r.set)
          .flatMap(_.conds)
          .map { case (a, b) => col(a) === col(b) }
        require(conds.nonEmpty, "join without condition (cross product)")
        val cond = conds.reduce(_ && _)
        val rhs = if (card(r.set) <= broadcastRows.toDouble) broadcast(rf) else rf
        val lhs = if (card(l.set) <= broadcastRows.toDouble) broadcast(lf) else lf
        lhs.join(rhs, cond, "inner")
    }
    mk(tree)
  }
}
