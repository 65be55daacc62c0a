package graft.plans

import org.apache.spark.sql.SparkSession

/** stats=auto — the estimator LADDER as a per-query ROUTING decision.
  *
  * The round-12 measurements say: equi-depth histograms are the cheap
  * default (geomean regret 1.09× on the skew tail, one collection pass
  * per table), and join-sample synopses are the correlation insurance
  * (tree9_sel's true-zero intersection 23.2× → 1.00) at the price of a
  * per-(table, filter) collection scan per query. Nothing chose
  * between them — `stats=hist|sample` was a manual knob.
  *
  * The trigger here detects the correlation case cheaply: ONE
  * unfiltered, full-width synopsis per table (amortized across the
  * whole workload — at 100 TB it rides the same ANALYZE scan that
  * collects profiles and histogram bounds, and stays `cap × rowWidth`
  * bytes on the driver). Query filters are evaluated DRIVER-SIDE on
  * those synopsis rows (the simple predicate grammar the planner
  * prices; anything unevaluable falls back to its histogram
  * selectivity as a residual multiplier), and every connected subset
  * of size ≤ 4 is estimated both ways. A subset where the sample
  * estimate and the independence estimate disagree by ≥ `cut` (10×)
  * — or where the sampled intersection is empty while independence
  * predicts ≥ `cut` rows — flags the query, and planning escalates to
  * the full per-(table, filter) sample tier. Unflagged queries plan
  * from histograms and never pay a sample-collection scan.
  *
  * Why ≤ 4: tree9_sel's trap is invisible at size 2 (every PAIR is
  * near-exact — EstimateDiagnose), born at the first correlated
  * 3-subset (NATION_3 customers × 'error' events through the shared
  * customer — measured ratio 7.7×, under the cut), and past the 10×
  * cut one join later (the error compounds monotonically). ≤ C(n,4)
  * driver-side subset joins ≈ a millisecond-scale check at JOB sizes.
  */
object AutoEstimator {

  /** One driver-evaluable conjunct: col op literal. `op` ∈
    * {=, <>, >, <, >=, <=, like, notlike}; ranges are numeric-only;
    * like/notlike carry the SQL pattern in `str`. */
  final case class Pred(col: String, op: String,
      str: Option[String], num: Option[Double])

  /** SQL LIKE pattern → anchored regex (% → .*, _ → ., everything
    * else literal). Compiled patterns are memoized — synopsis eval
    * touches each pattern thousands of times. */
  private val likeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  def likeRegex(pattern: String): java.util.regex.Pattern =
    likeCache.computeIfAbsent(pattern, _ => {
      val sb = new StringBuilder("^")
      pattern.foreach {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      java.util.regex.Pattern.compile(sb.append('$').toString,
        java.util.regex.Pattern.DOTALL)
    })

  /** A vertex's filter split into driver-evaluable predicates and the
    * residual selectivity of everything that isn't (estimated from the
    * histogram profile — those conjuncts keep the independence
    * assumption; the trigger just can't see correlation through
    * them). */
  final case class VertexFilter(preds: Seq[Pred], residualSel: Double)

  private val PredRe =
    """^\s*\(*\s*(\w+)\s*(=|<>|>=|<=|>|<)\s*(?:'([^']*)'|([-+]?[0-9.]+(?:[eE][-+]?[0-9]+)?))\s*\)*\s*$""".r
  private val LikeRe =
    """(?i)^\s*\(*\s*(\w+)\s+(NOT\s+)?LIKE\s+'([^']*)'\s*\)*\s*$""".r

  /** Parse one conjunct of the string grammar; None = unevaluable. */
  def parsePred(s: String): Option[Pred] = s match {
    case PredRe(c, op, str, num) =>
      if (str != null) {
        if (op == "=" || op == "<>") Some(Pred(c, op, Some(str), None))
        else None // string ranges: leave to the residual
      } else Some(Pred(c, op, None, Some(num.toDouble)))
    case LikeRe(c, not, pat) =>
      Some(Pred(c, if (not == null) "like" else "notlike", Some(pat), None))
    case _ => None
  }

  /** Split a harness filter string (the corpus grammar: conjuncts
    * joined by " AND ") into evaluable preds + residual selectivity. */
  def parseFilter(filter: Option[String],
      profile: StatsEstimator.Profile): VertexFilter =
    filter match {
      case None => VertexFilter(Nil, 1.0)
      case Some(f) =>
        val conjuncts = f.split("(?i) AND ").toSeq.map(_.trim)
        val (ok, rest) = conjuncts.map(c => c -> parsePred(c)).partition(_._2.isDefined)
        VertexFilter(ok.flatMap(_._2),
          rest.map(r => StatsEstimator.selectivityOf(profile)(r._1)).product)
    }

  /** [[parseFilter]]'s Catalyst twin: convert each analyzed conjunct
    * directly (the same shapes [[StatsEstimator.selectivityOfCatalyst]]
    * prices); IsNotNull is a pushdown artifact (always-true here —
    * synopsis rows with null keys never match anyway). */
  def fromCatalyst(
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      profile: StatsEstimator.Profile): VertexFilter = {
    import org.apache.spark.sql.catalyst.expressions._
    def attrOf(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case c: Cast => attrOf(c.child)
      case _ => None
    }
    def litNum(l: Literal): Option[Double] = l.value match {
      case n: java.lang.Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    def litStr(l: Literal): Option[String] = l.value match {
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case _ => None
    }
    def conv(e: Expression): Option[Option[Pred]] = e match {
      case IsNotNull(_) => Some(None) // evaluable, always true
      case EqualTo(l, r: Literal) if attrOf(l).isDefined =>
        litStr(r).map(v => Some(Pred(attrOf(l).get, "=", Some(v), None)))
          .orElse(litNum(r).map(v => Some(Pred(attrOf(l).get, "=", None, Some(v)))))
      case EqualTo(l: Literal, r) if attrOf(r).isDefined =>
        conv(EqualTo(r, l))
      case GreaterThan(l, r: Literal) if attrOf(l).isDefined =>
        litNum(r).map(v => Some(Pred(attrOf(l).get, ">", None, Some(v))))
      case GreaterThanOrEqual(l, r: Literal) if attrOf(l).isDefined =>
        litNum(r).map(v => Some(Pred(attrOf(l).get, ">=", None, Some(v))))
      case LessThan(l, r: Literal) if attrOf(l).isDefined =>
        litNum(r).map(v => Some(Pred(attrOf(l).get, "<", None, Some(v))))
      case LessThanOrEqual(l, r: Literal) if attrOf(l).isDefined =>
        litNum(r).map(v => Some(Pred(attrOf(l).get, "<=", None, Some(v))))
      case GreaterThan(l: Literal, r) if attrOf(r).isDefined =>
        litNum(l).map(v => Some(Pred(attrOf(r).get, "<", None, Some(v))))
      case LessThan(l: Literal, r) if attrOf(r).isDefined =>
        litNum(l).map(v => Some(Pred(attrOf(r).get, ">", None, Some(v))))
      case _ =>
        likeShape(e).map { case (c, pat, neg) =>
          Some(Pred(c, if (neg) "notlike" else "like", Some(pat), None))
        }
    }
    val converted = conjuncts.map(c => c -> conv(c))
    val preds = converted.collect { case (_, Some(Some(p))) => p }
    val residual = converted.collect { case (c, None) =>
      StatsEstimator.selectivityOfCatalyst(profile)(c) }.product
    VertexFilter(preds, residual)
  }

  /** Evaluate one predicate against a synopsis row (numerics were
    * normalized to Double at collection). Nulls never match. */
  def eval(row: Map[String, Any], p: Pred): Boolean =
    row.get(p.col) match {
      case None | Some(null) => false
      case Some(v) =>
        (p.str, p.num) match {
          case (Some(s), _) => v match {
            case vs: String => p.op match {
              case "=" => vs == s
              case "<>" => vs != s
              case "like" => likeRegex(s).matcher(vs).matches()
              case "notlike" => !likeRegex(s).matcher(vs).matches()
              case _ => false
            }
            case _ => false
          }
          case (_, Some(n)) => v match {
            case d: java.lang.Number =>
              val x = d.doubleValue()
              p.op match {
                case "=" => x == n
                case "<>" => x != n
                case ">" => x > n
                case ">=" => x >= n
                case "<" => x < n
                case "<=" => x <= n
              }
            case _ => false
          }
          case _ => false
        }
    }

  /** A Catalyst conjunct that is LIKE-shaped: `Like` itself, or the
    * StartsWith/EndsWith/Contains forms LikeSimplification rewrites
    * anchored patterns into (an injected rule sees conjuncts AFTER
    * that rewrite inside the same fixpoint), plus their negations.
    * Returns (column, SQL LIKE pattern, negated). The reference's JOB
    * predicate language includes LIKE (Query.java:56,
    * MyUtils.java:152-180); this is what lets the estimator ladder
    * price it instead of falling to the 1/3 default. */
  def likeShape(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[(String, String, Boolean)] = {
    import org.apache.spark.sql.catalyst.expressions._
    def attrOf(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case c: Cast => attrOf(c.child)
      case _ => None
    }
    def litStr(x: Expression): Option[String] = x match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(s.toString)
      case _ => None
    }
    // NOTE: a literal '%'/'_' inside a StartsWith/EndsWith/Contains
    // literal would read as a wildcard in the reconstructed pattern —
    // an estimate-fidelity nit only (estimates never change answers)
    e match {
      case l: Like =>
        for (c <- attrOf(l.left); p <- litStr(l.right)) yield (c, p, false)
      case Not(l: Like) =>
        for (c <- attrOf(l.left); p <- litStr(l.right)) yield (c, p, true)
      case StartsWith(a, lit) =>
        for (c <- attrOf(a); p <- litStr(lit)) yield (c, p + "%", false)
      case Not(StartsWith(a, lit)) =>
        for (c <- attrOf(a); p <- litStr(lit)) yield (c, p + "%", true)
      case EndsWith(a, lit) =>
        for (c <- attrOf(a); p <- litStr(lit)) yield (c, "%" + p, false)
      case Not(EndsWith(a, lit)) =>
        for (c <- attrOf(a); p <- litStr(lit)) yield (c, "%" + p, true)
      case Contains(a, lit) =>
        for (c <- attrOf(a); p <- litStr(lit)) yield (c, "%" + p + "%", false)
      case Not(Contains(a, lit)) =>
        for (c <- attrOf(a); p <- litStr(lit)) yield (c, "%" + p + "%", true)
      case _ => None
    }
  }

  /** LIKE selectivity at SAMPLE FIDELITY, for free: evaluate the
    * anchored regex over the table's amortized full-width synopsis
    * rows (the same cached rows the escalation trigger filters — no
    * extra scan). Zero matches floor at half a row's mass rather than
    * 0 — the planner divides by these. None when the synopsis is
    * empty or the column isn't sampled (caller falls back to the
    * residual default). */
  def likeSelectivity(spark: SparkSession, sfDir: String, rel: String,
      col: String, pattern: String, negate: Boolean,
      cap: Int = 2000): Option[Double] = {
    val syn = fullSynopsis(spark, sfDir, rel, cap)
    if (syn.rows.isEmpty || !syn.rows.head.contains(col)) None
    else {
      val re = likeRegex(pattern)
      val n = syn.rows.count(r => r.get(col) match {
        case Some(vs: String) => re.matcher(vs).matches() != negate
        case _ => false // nulls match neither LIKE nor NOT LIKE
      })
      Some(math.max(n.toDouble, 0.5) / syn.rows.size)
    }
  }

  /** String-path filter selectivity with LIKE conjuncts priced from
    * the amortized full synopsis — the HARNESS twin of the in-optimizer
    * [[graft.plans.GraftJoinReorder]] conjSel routing (p25), so the
    * regret loop can measure what synopsis-priced LIKE buys at
    * histogram-tier cost (no per-query sample scan). Non-LIKE
    * conjuncts keep [[StatsEstimator.selectivityOf]]'s ladder. */
  def likeAwareSel(spark: SparkSession, sfDir: String, rel: String,
      filter: Option[String], profile: StatsEstimator.Profile): Double =
    filter match {
      case None => 1.0
      case Some(f) => f.split("(?i) AND ").toSeq.map(_.trim).map { c =>
        parsePred(c) match {
          case Some(Pred(col, op, Some(pat), _))
              if op == "like" || op == "notlike" =>
            (try likeSelectivity(spark, sfDir, rel, col, pat,
              op == "notlike")
             catch { case scala.util.control.NonFatal(_) => None })
              .getOrElse(StatsEstimator.selectivityOf(profile)(c))
          case _ => StatsEstimator.selectivityOf(profile)(c)
        }
      }.product
    }

  /** Columns a full-width synopsis keeps: atomic numerics, strings,
    * booleans — what the predicate grammar can touch. Arrays/structs/
    * binaries (embeddings, media payloads) are excluded: the synopsis
    * must stay `cap × modest-row` bytes on the driver. */
  private def atomicCols(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.types._
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] ||
        f.dataType == StringType || f.dataType == BooleanType => f.name
    }.toSeq
  }

  /** One UNFILTERED full-width synopsis per table — cached by
    * [[SampleEstimator.sampleRel]] (file-listing fingerprint included),
    * amortized across every query that plans against the table. */
  def fullSynopsis(spark: SparkSession, sfDir: String, rel: String,
      cap: Int = 2000): SampleEstimator.RelSample = {
    val cols = atomicCols(AliasedRels.load(spark, sfDir, rel))
    SampleEstimator.sampleRel(spark, sfDir, rel, None, cols, cap)
  }

  /** One flagged subset: its mask, the synopsis estimate, and the
    * independence (histogram-tier) estimate it contradicts. */
  final case class Flag(mask: Long, sampleEst: Double, indepEst: Double)

  /** The escalation decision for one query: evaluate every connected
    * subset of size ≤ 3 on driver-filtered full synopses vs the
    * histogram estimate; flag on ≥ `cut` disagreement. Returns the
    * flags (empty = plan from histograms). */
  def escalationFlags(spark: SparkSession, sfDir: String, g: QueryGraph,
      vf: Vector[VertexFilter], histCard: Cardinality,
      cut: Double = 10.0, cap: Int = 2000): Vector[Flag] = {
    val filtered = Vector.tabulate(g.n) { i =>
      val full = fullSynopsis(spark, sfDir, g.relations(i), cap)
      val keep = full.rows.indices.filter(r =>
        vf(i).preds.forall(eval(full.rows(r), _)))
      SampleEstimator.RelSample(
        keep.map(full.rows).toVector, full.p,
        keep.map(full.hashes).toVector, keep.map(full.ids).toVector)
    }
    val est = SampleEstimator.subsetEstimator(g, filtered, vf.map(_.residualSel))
    val subsets = (2 to 4).iterator
      .flatMap(sz => (0 until g.n).combinations(sz))
      .map(_.foldLeft(0L)((m, i) => m | (1L << i)))
      .filter(g.connected)
    subsets.flatMap { s =>
      val sample = est(s)
      val indep = histCard(s)
      val ratio = math.max(sample / indep, indep / sample)
      if (ratio >= cut) Some(Flag(s, sample, indep)) else None
    }.toVector
  }

  /** The auto tier for the harness/experiment path: histogram
    * estimates by default, escalated to the full per-(table, filter)
    * sample tier when [[escalationFlags]] fires. Returns the chosen
    * estimator and whether it escalated (the experiment records the
    * rate; only escalated queries pay sample-collection scans). */
  def cardinality(spark: SparkSession, sfDir: String, g: QueryGraph,
      filters: Vector[Option[String]],
      histProfiles: Vector[StatsEstimator.Profile],
      cap: Int = 2000): (Cardinality, Boolean) = {
    val hist = StatsEstimator.cardinality(g, histProfiles, filters)
    val vf = Vector.tabulate(g.n)(i =>
      parseFilter(filters.lift(i).flatten, histProfiles(i)))
    val flags = escalationFlags(spark, sfDir, g, vf, hist, cap = cap)
    if (flags.isEmpty) (hist, false)
    else (SampleEstimator.cardinality(spark, sfDir, g, filters, histProfiles,
      cap), true)
  }
}
