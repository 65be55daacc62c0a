package graft.plans

import ExperimentCorpus.CorpusQuery

/** The JOB-SCALE planner corpus — 21 queries at 8-14 relations over
  * the testdata schema (chains, stars, trees/snowflakes, cycles, one
  * clique), the reference's actual workload regime: its loop runs
  * 100+ JOB queries up to ~17 relations (`runtime_test.sh:5-6`,
  * `README.md:6-9`), repeating tables under aliases. Aliased
  * relations use [[AliasedRels]]' `table@k` naming with suffixed
  * columns, so [[JoinTreeExecutor]]'s unique-column-name resolution
  * holds at any multiplicity.
  *
  * The corpus deliberately straddles the 12-edge exact-search
  * boundary (`ExhaustiveJoinOrderRule.java:107-109`, kept in
  * [[Enumerators.BranchAndBound]]/[[Enumerators.Auto]]): chain12 /
  * star12 / tree11 sit just under it (Auto → DPccp), tree13 /
  * deep14 / cycle12 / clique6 sit at or past it (Auto → IKKBZ,
  * BranchAndBound refuses). `_sel` twins rerun a shape under
  * adversarial selectivities — filters at the graph's far ends,
  * where a greedy/left-deep order pays most.
  *
  * Filter shapes stay inside [[StatsEstimator.selectivityOf]]'s
  * recognized grammar (col='lit', col>num, col<num) so the
  * measured-stats regret leg prices every predicate. Join fan-outs
  * are chosen so the largest intermediate stays ≈|lineitem| under
  * filters (PK-direction lookups wherever a fan would compound). */
object JobCorpus {

  /** One relation of a query under construction: its (possibly
    * aliased) name, local filter, and equi-joins to EARLIER relations
    * as (earlierIndex, Seq(earlierCol -> thisCol)). */
  private final case class R(
      rel: String,
      filter: Option[String] = None,
      joins: Seq[(Int, Seq[(String, String)])] = Nil)

  private def q(name: String, rs: R*): CorpusQuery = {
    val edges = rs.zipWithIndex.flatMap { case (r, j) =>
      r.joins.map { case (i, conds) =>
        require(i < j, s"$name: joins must reference earlier relations")
        JoinEdge(i, j, conds)
      }
    }.toVector
    CorpusQuery(name, QueryGraph(rs.map(_.rel).toVector, edges),
      rs.map(_.filter).toVector)
  }

  // ------------------------------------------------------------ chains
  /** chain8: embeddings–documents–part–lineitem–orders–customer–
    * nation–region — every distinct PK path the schema has, 7 edges. */
  val chain8: CorpusQuery = q("chain8",
    R("embeddings"),
    R("documents", joins = Seq(0 -> Seq("vec_id" -> "doc_id"))),
    R("part", joins = Seq(1 -> Seq("doc_id" -> "p_partkey"))),
    R("lineitem", Some("l_quantity > 30"),
      Seq(2 -> Seq("p_partkey" -> "l_partkey"))),
    R("orders", Some("o_orderstatus = 'F'"),
      Seq(3 -> Seq("l_orderkey" -> "o_orderkey"))),
    R("customer", joins = Seq(4 -> Seq("o_custkey" -> "c_custkey"))),
    R("nation", joins = Seq(5 -> Seq("c_nationkey" -> "n_nationkey"))),
    R("region", joins = Seq(6 -> Seq("n_regionkey" -> "r_regionkey"))))

  /** chain8 under far-end selectivities: both terminals filtered. */
  val chain8Sel: CorpusQuery = q("chain8_sel",
    R("embeddings", Some("label = 3")),
    R("documents", joins = Seq(0 -> Seq("vec_id" -> "doc_id"))),
    R("part", Some("p_type = 'PROMO'"),
      Seq(1 -> Seq("doc_id" -> "p_partkey"))),
    R("lineitem", joins = Seq(2 -> Seq("p_partkey" -> "l_partkey"))),
    R("orders", joins = Seq(3 -> Seq("l_orderkey" -> "o_orderkey"))),
    R("customer", joins = Seq(4 -> Seq("o_custkey" -> "c_custkey"))),
    R("nation", joins = Seq(5 -> Seq("c_nationkey" -> "n_nationkey"))),
    R("region", Some("r_name = 'ASIA'"),
      Seq(6 -> Seq("n_regionkey" -> "r_regionkey"))))

  private def chain10Rels: Seq[R] = Seq(
    R("embeddings"),
    R("documents", joins = Seq(0 -> Seq("vec_id" -> "doc_id"))),
    R("part", joins = Seq(1 -> Seq("doc_id" -> "p_partkey"))),
    R("lineitem", Some("l_quantity > 30"),
      Seq(2 -> Seq("p_partkey" -> "l_partkey"))),
    R("orders", Some("o_orderstatus = 'F'"),
      Seq(3 -> Seq("l_orderkey" -> "o_orderkey"))),
    R("customer", joins = Seq(4 -> Seq("o_custkey" -> "c_custkey"))),
    R("nation", joins = Seq(5 -> Seq("c_nationkey" -> "n_nationkey"))),
    R("supplier", joins = Seq(6 -> Seq("n_nationkey" -> "s_nationkey"))),
    // the one deliberate fan (supplier → its lineitems), immediately
    // cut by a tight quantity band so the intermediate stays bounded
    R("lineitem@2", Some("l_quantity_a2 > 48"),
      Seq(7 -> Seq("s_suppkey" -> "l_suppkey_a2"))),
    R("orders@2", Some("o_orderstatus_a2 = 'F'"),
      Seq(8 -> Seq("l_orderkey_a2" -> "o_orderkey_a2"))))

  /** chain10: chain8's spine re-entered through supplier into a second
    * lineitem/orders pass — 9 edges. */
  val chain10: CorpusQuery = q("chain10", chain10Rels: _*)

  private def chain12Rels: Seq[R] = chain10Rels ++ Seq(
    R("customer@2", joins = Seq(9 -> Seq("o_custkey_a2" -> "c_custkey_a2"))),
    R("nation@2", joins = Seq(10 -> Seq("c_nationkey_a2" -> "n_nationkey_a2"))))

  /** chain12: 11 edges — the LAST size Auto still routes to exact DP. */
  val chain12: CorpusQuery = q("chain12", chain12Rels: _*)

  /** chain12 with the selective filters moved deep into the second
    * pass — the estimator must see through 10 joins to place them. */
  val chain12Sel: CorpusQuery = q("chain12_sel",
    (chain10Rels.take(3) ++ Seq(
      chain10Rels(3).copy(filter = None),
      chain10Rels(4).copy(filter = None)) ++
      chain10Rels.drop(5).take(3) ++ Seq(
      R("lineitem@2", Some("l_quantity_a2 > 45"),
        Seq(7 -> Seq("s_suppkey" -> "l_suppkey_a2"))),
      R("orders@2", Some("o_totalprice_a2 > 450000"),
        Seq(8 -> Seq("l_orderkey_a2" -> "o_orderkey_a2"))),
      R("customer@2", joins = Seq(9 -> Seq("o_custkey_a2" -> "c_custkey_a2"))),
      R("nation@2", Some("n_name_a2 = 'NATION_3'"),
        Seq(10 -> Seq("c_nationkey_a2" -> "n_nationkey_a2"))))): _*)

  /** deep14: chain12 + region@2 + events off the second customer —
    * 13 edges, PAST the exact boundary (Auto → IKKBZ, BnB refuses). */
  val deep14: CorpusQuery = q("deep14",
    (chain12Rels ++ Seq(
      R("region@2", joins = Seq(11 -> Seq("n_regionkey_a2" -> "r_regionkey_a2"))),
      R("events", Some("event_type = 'purchase'"),
        Seq(10 -> Seq("c_custkey_a2" -> "user_id"))))): _*)

  // ------------------------------------------------------------- stars
  private def starRels(spokes: Seq[(String, Option[String], (String, String))])
      : Seq[R] =
    R("lineitem", Some("l_quantity > 30")) +: spokes.map {
      case (rel, f, (lc, rc)) => R(rel, f, Seq(0 -> Seq(lc -> rc)))
    }

  private val starBase = Seq(
    ("orders", Some("o_orderstatus = 'F'"), "l_orderkey" -> "o_orderkey"),
    ("part", Some("p_type = 'PROMO'"), "l_partkey" -> "p_partkey"),
    ("supplier", None, "l_suppkey" -> "s_suppkey"),
    ("orders@2", None, "l_orderkey" -> "o_orderkey_a2"),
    ("part@2", None, "l_partkey" -> "p_partkey_a2"),
    ("supplier@2", None, "l_suppkey" -> "s_suppkey_a2"),
    ("orders@3", None, "l_orderkey" -> "o_orderkey_a3"),
    ("part@3", None, "l_partkey" -> "p_partkey_a3"),
    ("supplier@3", None, "l_suppkey" -> "s_suppkey_a3"),
    ("orders@4", None, "l_orderkey" -> "o_orderkey_a4"),
    ("part@4", None, "l_partkey" -> "p_partkey_a4"))

  /** star8/10/12: lineitem hub, 7/9/11 PK-lookup spokes (every join
    * is a dimension fetch — the pure star JOB shape). */
  val star8: CorpusQuery = q("star8", starRels(starBase.take(7)): _*)
  val star10: CorpusQuery = q("star10", starRels(starBase.take(9)): _*)
  val star12: CorpusQuery = q("star12", starRels(starBase.take(11)): _*)

  /** star10 with two ANTI-correlated spokes on the same key (a price
    * band its own copy excludes) — the adversarial case where
    * independence-assuming estimators misprice spoke order. */
  val star10Sel: CorpusQuery = q("star10_sel",
    starRels(starBase.take(9).map {
      case ("orders", _, e) => ("orders", Some("o_totalprice > 450000"), e)
      case ("orders@2", _, e) =>
        ("orders@2", Some("o_totalprice_a2 < 50000"), e)
      case other => other
    }): _*)

  // ----------------------------------------------------- trees / snowflakes
  private def tree9Rels: Seq[R] = Seq(
    R("lineitem", Some("l_quantity > 30")),
    R("orders", Some("o_orderstatus = 'F'"),
      Seq(0 -> Seq("l_orderkey" -> "o_orderkey"))),
    R("customer", joins = Seq(1 -> Seq("o_custkey" -> "c_custkey"))),
    R("nation", joins = Seq(2 -> Seq("c_nationkey" -> "n_nationkey"))),
    R("region", joins = Seq(3 -> Seq("n_regionkey" -> "r_regionkey"))),
    R("part", joins = Seq(0 -> Seq("l_partkey" -> "p_partkey"))),
    R("documents", joins = Seq(5 -> Seq("p_partkey" -> "doc_id"))),
    R("supplier", joins = Seq(0 -> Seq("l_suppkey" -> "s_suppkey"))),
    R("events", Some("event_type = 'purchase'"),
      Seq(2 -> Seq("c_custkey" -> "user_id"))))

  /** tree9: the full snowflake off lineitem — orders→customer→nation→
    * region, part→documents, supplier, events off customer. */
  val tree9: CorpusQuery = q("tree9", tree9Rels: _*)

  /** tree9 under rare-branch selectivities. */
  val tree9Sel: CorpusQuery = q("tree9_sel",
    tree9Rels.map { r =>
      r.rel match {
        case "events" => r.copy(filter = Some("event_type = 'error'"))
        case "nation" => r.copy(filter = Some("n_name = 'NATION_3'"))
        case "lineitem" => r.copy(filter = None)
        case _ => r
      }
    }: _*)

  private def tree11Rels: Seq[R] = tree9Rels ++ Seq(
    R("embeddings", joins = Seq(6 -> Seq("doc_id" -> "vec_id"))),
    R("nation@2", joins = Seq(7 -> Seq("s_nationkey" -> "n_nationkey_a2"))))

  /** tree11: tree9 + embeddings leaf + the supplier's own nation —
    * 10 edges, the ≥10-relation EXACT-route gate shape (p15). */
  val tree11: CorpusQuery = q("tree11", tree11Rels: _*)

  /** tree12: tree11 + a second documents leaf — 11 edges, the
    * largest tree Auto still routes to exact DP. */
  val tree12: CorpusQuery = q("tree12",
    (tree11Rels :+ R("documents@2", Some("lang_a2 = 'en'"),
      Seq(5 -> Seq("p_partkey" -> "doc_id_a2")))): _*)

  /** tree13: tree11 + region@2 + a second documents leaf — 12 edges,
    * AT the boundary: Auto routes IKKBZ, BnB refuses (p16). */
  val tree13: CorpusQuery = q("tree13",
    (tree11Rels ++ Seq(
      R("region@2", joins = Seq(10 -> Seq("n_regionkey_a2" -> "r_regionkey_a2"))),
      R("documents@2", Some("lang_a2 = 'en'"),
        Seq(5 -> Seq("p_partkey" -> "doc_id_a2"))))): _*)

  /** tree17: the reference's WIDTH CEILING — JOB's largest queries
    * join ~17 relations (README.md:6-9, runtime_test.sh:5-6), and the
    * reference's exact-search refusal triggers at ≥12 edges
    * (ExhaustiveJoinOrderRule.java:107-109). tree13 + supplier@2 and
    * events@2 re-entering through nation@2/customer, part@2 off
    * lineitem, embeddings@2 off documents@2 — 17 relations, 16 edges,
    * 1,737 connected subgraphs (tree-shaped, so DPccp's csg-cmp walk
    * stays thousands, not 2^17). BnB refuses it, Auto routes IKKBZ,
    * DPccp plans it exactly (p28). */
  val tree17: CorpusQuery = q("tree17",
    (tree11Rels ++ Seq(
      R("region@2", joins = Seq(10 -> Seq("n_regionkey_a2" -> "r_regionkey_a2"))),
      R("documents@2", Some("lang_a2 = 'en'"),
        Seq(5 -> Seq("p_partkey" -> "doc_id_a2"))),
      R("supplier@2", joins = Seq(10 -> Seq("n_nationkey_a2" -> "s_nationkey_a2"))),
      R("events@2", Some("event_type_a2 = 'error'"),
        Seq(2 -> Seq("c_custkey" -> "user_id_a2"))),
      R("part@2", joins = Seq(0 -> Seq("l_partkey" -> "p_partkey_a2"))),
      R("embeddings@2", joins = Seq(12 -> Seq("doc_id_a2" -> "vec_id_a2"))))): _*)

  /** The width-ceiling mini-corpus (own truth fixture, like [[tails]]
    * — the frozen 21-query [[all]] and its fixture stay untouched). */
  val ceiling: Seq[CorpusQuery] = Seq(tree17)

  // ------------------------------------------------------------ cycles
  /** cycle8: nation–customer–orders–lineitem–supplier–nation@2–
    * supplier@2–lineitem@2, closed back into orders — 8 edges. */
  val cycle8: CorpusQuery = q("cycle8",
    R("nation"),
    R("customer", joins = Seq(0 -> Seq("n_nationkey" -> "c_nationkey"))),
    R("orders", Some("o_orderstatus = 'F'"),
      Seq(1 -> Seq("c_custkey" -> "o_custkey"))),
    R("lineitem", Some("l_quantity > 40"),
      Seq(2 -> Seq("o_orderkey" -> "l_orderkey"))),
    R("supplier", joins = Seq(3 -> Seq("l_suppkey" -> "s_suppkey"))),
    R("nation@2", joins = Seq(4 -> Seq("s_nationkey" -> "n_nationkey_a2"))),
    R("supplier@2", joins = Seq(5 -> Seq("n_nationkey_a2" -> "s_nationkey_a2"))),
    R("lineitem@2", Some("l_quantity_a2 > 48"), Seq(
      6 -> Seq("s_suppkey_a2" -> "l_suppkey_a2"),
      2 -> Seq("o_orderkey" -> "l_orderkey_a2")))) // the closing edge

  private def cycle10Rels(
      ordFilter: Option[String], ord2Filter: Option[String],
      li2Filter: Option[String]): Seq[R] = Seq(
    R("nation"),
    R("customer", joins = Seq(0 -> Seq("n_nationkey" -> "c_nationkey"))),
    R("orders", ordFilter, Seq(1 -> Seq("c_custkey" -> "o_custkey"))),
    R("lineitem", Some("l_quantity > 40"),
      Seq(2 -> Seq("o_orderkey" -> "l_orderkey"))),
    R("supplier", joins = Seq(3 -> Seq("l_suppkey" -> "s_suppkey"))),
    R("nation@2", joins = Seq(4 -> Seq("s_nationkey" -> "n_nationkey_a2"))),
    R("customer@2", joins = Seq(5 -> Seq("n_nationkey_a2" -> "c_nationkey_a2"))),
    R("orders@2", ord2Filter,
      Seq(6 -> Seq("c_custkey_a2" -> "o_custkey_a2"))),
    R("lineitem@2", li2Filter,
      Seq(7 -> Seq("o_orderkey_a2" -> "l_orderkey_a2"))),
    R("supplier@2", joins = Seq(
      8 -> Seq("l_suppkey_a2" -> "s_suppkey_a2"),
      0 -> Seq("n_nationkey" -> "s_nationkey_a2")))) // the closing edge

  /** cycle10: two customer→orders→lineitem→supplier passes closed
    * over the shared nation — a genuine 10-edge cycle. */
  val cycle10: CorpusQuery = q("cycle10",
    cycle10Rels(Some("o_orderstatus = 'F'"), None,
      Some("l_quantity_a2 > 48")): _*)

  /** cycle10 under both-pass selectivities. */
  val cycle10Sel: CorpusQuery = q("cycle10_sel",
    cycle10Rels(Some("o_totalprice > 400000"),
      Some("o_orderstatus_a2 = 'F'"), Some("l_quantity_a2 > 45")): _*)

  /** cycle12: cycle10 extended one more nation→customer hop before
    * closing into the FIRST pass's orders — 12 edges: BnB refuses,
    * Auto routes IKKBZ, DPccp still enumerates the cyclic csg-cmp. */
  val cycle12: CorpusQuery = q("cycle12",
    R("nation"),
    R("customer", joins = Seq(0 -> Seq("n_nationkey" -> "c_nationkey"))),
    R("orders", Some("o_orderstatus = 'F'"),
      Seq(1 -> Seq("c_custkey" -> "o_custkey"))),
    R("lineitem", Some("l_quantity > 40"),
      Seq(2 -> Seq("o_orderkey" -> "l_orderkey"))),
    R("supplier", joins = Seq(3 -> Seq("l_suppkey" -> "s_suppkey"))),
    R("nation@2", joins = Seq(4 -> Seq("s_nationkey" -> "n_nationkey_a2"))),
    R("customer@2", joins = Seq(5 -> Seq("n_nationkey_a2" -> "c_nationkey_a2"))),
    R("orders@2", joins = Seq(6 -> Seq("c_custkey_a2" -> "o_custkey_a2"))),
    R("lineitem@2", Some("l_quantity_a2 > 48"),
      Seq(7 -> Seq("o_orderkey_a2" -> "l_orderkey_a2"))),
    R("supplier@2", joins = Seq(8 -> Seq("l_suppkey_a2" -> "s_suppkey_a2"))),
    R("nation@3", joins = Seq(9 -> Seq("s_nationkey_a2" -> "n_nationkey_a3"))),
    R("customer@3", joins = Seq(
      10 -> Seq("n_nationkey_a3" -> "c_nationkey_a3"),
      2 -> Seq("o_custkey" -> "c_custkey_a3")))) // the closing edge

  /** kite10: cycle8 with a part→documents tail off the first
    * lineitem — cycle-plus-tail at 10 edges. */
  val kite10: CorpusQuery = q("kite10",
    R("nation"),
    R("customer", joins = Seq(0 -> Seq("n_nationkey" -> "c_nationkey"))),
    R("orders", Some("o_orderstatus = 'F'"),
      Seq(1 -> Seq("c_custkey" -> "o_custkey"))),
    R("lineitem", Some("l_quantity > 40"),
      Seq(2 -> Seq("o_orderkey" -> "l_orderkey"))),
    R("supplier", joins = Seq(3 -> Seq("l_suppkey" -> "s_suppkey"))),
    R("nation@2", joins = Seq(4 -> Seq("s_nationkey" -> "n_nationkey_a2"))),
    R("supplier@2", joins = Seq(5 -> Seq("n_nationkey_a2" -> "s_nationkey_a2"))),
    R("lineitem@2", Some("l_quantity_a2 > 48"), Seq(
      6 -> Seq("s_suppkey_a2" -> "l_suppkey_a2"),
      2 -> Seq("o_orderkey" -> "l_orderkey_a2"))),
    R("part", Some("p_type = 'PROMO'"),
      Seq(3 -> Seq("l_partkey" -> "p_partkey"))),
    R("documents", joins = Seq(8 -> Seq("p_partkey" -> "doc_id"))))

  // ------------------------------------------------------------ clique
  /** clique6: six lineitem copies pairwise joined on the shared order
    * key — 15 edges, the densest shape (every planner's worst case;
    * BnB refuses, Auto routes IKKBZ). Quantity bands keep the 6-way
    * self-join's fan-out at ~2 rows per order per copy. */
  val clique6: CorpusQuery = {
    val rels = R("lineitem", Some("l_quantity > 25")) +: (2 to 6).map { k =>
      R(s"lineitem@$k", Some(s"l_quantity_a$k > 25"),
        (0 until k - 1).map { i =>
          val lc = if (i == 0) "l_orderkey" else s"l_orderkey_a${i + 1}"
          i -> Seq(lc -> s"l_orderkey_a$k")
        })
    }
    q("clique6", rels: _*)
  }

  val all: Seq[CorpusQuery] = Seq(
    chain8, chain8Sel, chain10, chain12, chain12Sel, deep14,
    star8, star10, star10Sel, star12,
    tree9, tree9Sel, tree11, tree12, tree13,
    cycle8, cycle10, cycle10Sel, cycle12, kite10,
    clique6)

  // -------------------------------------------- skew-tail twin corpus
  /** tree9 with the events branch filtered on the SKEWED `value` tail:
    * `value > 294` keeps ~0.1% of events while uniform min-max span
    * interpolation estimates ~10% — a 100× leaf misestimate that only
    * the equi-depth histogram tier sees through (events.value is the
    * one genuinely non-uniform numeric column in the testdata; every
    * other range filter in [[all]] sits on near-uniform columns where
    * span is already right). Kept OUT of [[all]] so the 21-query
    * corpus, its truth fixture, and everything gated on them stay
    * frozen; ExperimentMain runs it as corpus "tail" against
    * fixtures/cards_tail_sf0.001.json. */
  val tree9Tail: CorpusQuery = q("tree9_tail",
    tree9Rels.map { r =>
      r.rel match {
        case "events" => r.copy(filter = Some("value > 294.0"))
        case _ => r
      }
    }: _*)

  /** tree9 with the part branch filtered by a LIKE pattern
    * (`p_name LIKE 'large%'` keeps ~12% where the string-path default
    * prices 1/3 — a 2.7× leaf misestimate): the regret row for JOB's
    * LIKE predicate language (the reference string-parses LIKE,
    * MyUtils.java:152-180). The string-path hist tier is LIKE-blind
    * by construction (no synopsis access); the sample tier pushes the
    * filter into its synopsis SQL and the auto tier's driver grammar
    * evaluates it (AutoEstimator.parsePred) — so this row measures
    * exactly the plan-quality cost the in-optimizer synopsis pricing
    * (p25, GraftJoinReorder.conjSel) avoids. */
  val tree9Like: CorpusQuery = q("tree9_like",
    tree9Rels.map { r =>
      r.rel match {
        case "part" => r.copy(filter = Some("p_name LIKE 'large%'"))
        case _ => r
      }
    }: _*)

  /** tree9 with the part branch filtered by a 2-brand IN-list
    * (`p_brand IN ('Brand#4','Brand#19')` keeps ~8.5% where the
    * string-path default prices 1/3 — a 3.9× leaf misestimate): the
    * regret row for JOB's IN predicates (the reference string-parses
    * IN and BETWEEN alongside LIKE, MyUtils.java:152-180). The hist
    * tier is IN-blind by construction; the sample tier pushes the
    * filter into its synopsis SQL; the histlike leg prices it from
    * the amortized synopsis (AutoEstimator.clauseSelectivity) — the
    * measured twin of the in-optimizer p27 routing. */
  val tree9In: CorpusQuery = q("tree9_in",
    tree9Rels.map { r =>
      r.rel match {
        case "part" =>
          r.copy(filter = Some("p_brand IN ('Brand#4','Brand#19')"))
        case _ => r
      }
    }: _*)

  val tails: Seq[CorpusQuery] = Seq(tree9Tail, tree9Like, tree9In)
}
