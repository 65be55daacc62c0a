package graft.plans

/** Cardinality of a relation subset (bitmask) — the planner's only
  * statistics interface. The reference never consults engine stats: row
  * counts come from an injected per-query dictionary
  * (reference: MyMetadataQuery.java:81-162). */
trait Cardinality {
  def apply(s: Long): Double

  /** NDV of the join-key columns `cols` on base relation `vertex` — the
    * reference's `getDistinctRowCount` surface, which the greedy
    * heuristic's tie-break consults (MyLoptOptimizeJoinRule.java:638,
    * :848-863). Default: the relation's cardinality (every key distinct
    * — the PK assumption); override with measured NDVs. */
  def ndv(vertex: Int, cols: Seq[String]): Double = apply(1L << vertex)
}

/** Injected-cardinality dictionary with the reference's JSON format:
  * `{ queryName: { "sorted table names": rows, ... }, ... }`, key =
  * sorted space-joined base-table names (MyMetadataQuery.java:107-114;
  * format doc in FIXTURES.md §2).
  *
  * Lookup order mirrors the reference exactly
  * (MyMetadataQuery.java:119-146): plain sorted-table key first, then
  * the FILTER-QUALIFIED key — each filtered table's name with its
  * predicate literal appended (the reference string-parses the literal
  * out of the RexNode, MyUtils.getTableNameWithFilter:143-192; we
  * extract it from the declared filter string the same way:
  * [[CardinalityStore.filterLiteral]]).
  *
  * On a double miss the reference hard-exits
  * (MyMetadataQuery.java:148-152); we fall back to an estimator instead
  * so planning always completes — the miss is still observable via
  * [[misses]] and surfaced by ExperimentMain.
  */
final class CardinalityStore(
    graph: QueryGraph,
    byKey: Map[String, Double],
    fallback: Cardinality,
    filterLiterals: Vector[Option[String]] = Vector.empty) extends Cardinality {
  private var missed = List.empty[String]
  def misses: List[String] = missed.distinct.reverse

  private def filteredKey(s: Long): String =
    CardinalityStore.qualifiedKey(graph, s, filterLiterals)

  def apply(s: Long): Double = {
    val k = graph.cardKey(s)
    byKey.get(k).orElse(byKey.get(filteredKey(s))) match {
      case Some(v) => v
      case None =>
        missed ::= k
        fallback(s)
    }
  }
  override def ndv(vertex: Int, cols: Seq[String]): Double =
    fallback.ndv(vertex, cols)
}

object CardinalityStore {

  /** The predicate literal appended to a table name in the fallback key:
    * the first quoted string's content if the filter has one, else the
    * last whitespace-separated token ("r_name = 'ASIA'" → "ASIA",
    * "l_quantity > 5" → "5") — behaviorally the reference's substring
    * extraction from the Rex string `=($1,'ASIA')`
    * (MyUtils.java:155-180). */
  def filterLiteral(cond: String): String = {
    val first = cond.indexOf('\'')
    val last = cond.lastIndexOf('\'')
    if (first >= 0 && last > first) cond.substring(first + 1, last)
    else cond.trim.split("\\s+").last
  }

  /** The filter-qualified subset key: each table name with its predicate
    * literal appended when the table carries a filter, sorted and
    * space-joined — the exact key shape the reference's Python client
    * writes into pg.json and MyMetadataQuery.java:119-146 looks up.
    * Shared by the lookup ([[CardinalityStore]]) and the dump
    * (tools/CardDump) so the two can never drift apart. */
  def qualifiedKey(
      graph: QueryGraph, s: Long, filters: Vector[Option[String]]): String = {
    var rest = s
    val b = Seq.newBuilder[String]
    while (rest != 0) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      val lit = filters.lift(i).flatten.map(filterLiteral).getOrElse("")
      b += graph.relations(i) + lit
      rest &= rest - 1
    }
    b.result().sorted.mkString(" ")
  }
  /** Parse the reference's pg.json format. Uses jackson (shipped in
    * Spark's classpath) — no extra dependency. */
  def parseJson(json: String): Map[String, Map[String, Double]] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(json)
    val out = Map.newBuilder[String, Map[String, Double]]
    root.properties().forEach { qe =>
      val inner = Map.newBuilder[String, Double]
      qe.getValue.properties().forEach { te =>
        inner += te.getKey -> te.getValue.asDouble()
      }
      out += qe.getKey -> inner.result()
    }
    out.result()
  }
}

/** Textbook independence-assumption estimator:
  * |S| = Π base(i) · Π_{edges inside S} sel(e), with equi-join
  * selectivity 1 / max(|A|, |B|) (PK–FK assumption). Deterministic and
  * cheap; used both as the store's fallback and as the "estimated
  * cardinalities" side of the est-vs-true regret experiment
  * (reference: QueryOptExperiment.startTestCardinalities:437-505). */
final class HeuristicCardinality(
    graph: QueryGraph,
    base: Array[Double],
    filterSel: Array[Double],
    ndvByCol: Map[(Int, String), Double] = Map.empty) extends Cardinality {
  def apply(s: Long): Double = {
    var rows = 1.0
    var rest = s
    while (rest != 0) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      rows *= math.max(base(i) * filterSel(i), 1.0)
      rest &= rest - 1
    }
    graph.edges.foreach { e =>
      if ((e.mask & s) == e.mask)
        rows /= math.max(math.max(base(e.a), base(e.b)), 1.0)
    }
    math.max(rows, 1.0)
  }

  /** Measured (countDistinct-derived) NDVs when supplied; composite keys
    * take the per-column product capped at the relation's row count, PK
    * fallback otherwise. */
  override def ndv(vertex: Int, cols: Seq[String]): Double =
    if (cols.isEmpty || cols.exists(c => !ndvByCol.contains((vertex, c))))
      base(vertex)
    else
      math.min(cols.map(c => ndvByCol((vertex, c))).product, base(vertex))
}

object HeuristicCardinality {
  def uniform(graph: QueryGraph, base: Array[Double]): HeuristicCardinality =
    new HeuristicCardinality(graph, base, Array.fill(graph.n)(1.0))
}
