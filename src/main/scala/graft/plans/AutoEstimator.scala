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
  *
  * PREDICATE GRAMMAR (r15): the driver-evaluable grammar now covers
  * the reference's FULL JOB predicate language (the reference
  * string-parses =, <>, ranges, LIKE, IN, BETWEEN, and OR-disjunctions
  * — MyUtils.java:152-180): a filter is a conjunction of [[Clause]]s,
  * each clause a DISJUNCTION of atomic [[Pred]]s (a 1-alt clause is a
  * plain conjunct). BETWEEN is rewritten to its two range conjuncts at
  * tokenization ([[splitConjuncts]]); IN carries its literal set.
  * LIKE, IN, and OR-clauses are priced at SAMPLE FIDELITY from the
  * amortized full-width synopsis ([[clauseSelectivity]]) — row-wise
  * evaluation sees within-clause correlation a clamped-union formula
  * would miss; equality and ranges keep the histogram ladder.
  */
object AutoEstimator {

  /** One driver-evaluable atomic predicate: col op literal(s). `op` ∈
    * {=, <>, >, <, >=, <=, like, notlike, in, notin}; ranges are
    * numeric-only; like/notlike carry the SQL pattern in `str` (in
    * CANONICAL backslash-escape form — [[likeShape]] normalizes);
    * in/notin carry the literal list in `strs`/`nums` (one of the two,
    * matching the column's type side). */
  final case class Pred(col: String, op: String,
      str: Option[String], num: Option[Double],
      strs: Seq[String] = Nil, nums: Seq[Double] = Nil)

  /** A disjunction of atomic predicates — one conjunct of a filter.
    * Most clauses have a single alternative (a plain `a = 'x'`
    * conjunct); an OR-conjunct carries every disjunct. */
  final case class Clause(alts: Seq[Pred])

  /** SQL LIKE pattern → anchored regex (% → .*, _ → ., `escape`-
    * prefixed chars literal, everything else literal). Compiled
    * patterns are memoized — synopsis eval touches each pattern
    * thousands of times — and the memo is BOUNDED (a long-lived
    * session issuing generated patterns must not grow it without
    * bound; recompiling is cheap). */
  private val likeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Char), java.util.regex.Pattern]()
  private val likeCacheCap = 4096

  def likeRegex(pattern: String, escape: Char = '\\'): java.util.regex.Pattern = {
    if (likeCache.size > likeCacheCap) likeCache.clear()
    likeCache.computeIfAbsent((pattern, escape), _ => {
      val sb = new StringBuilder("^")
      var i = 0
      while (i < pattern.length) {
        val c = pattern.charAt(i)
        if (c == escape && i + 1 < pattern.length) {
          // SQL LIKE escape: the next char is literal (covers \%, \_,
          // and the escape char escaping itself) — ADVICE r14
          sb.append(java.util.regex.Pattern.quote(
            pattern.charAt(i + 1).toString))
          i += 2
        } else {
          c match {
            case '%' => sb.append(".*")
            case '_' => sb.append('.')
            case o => sb.append(java.util.regex.Pattern.quote(o.toString))
          }
          i += 1
        }
      }
      java.util.regex.Pattern.compile(sb.append('$').toString,
        java.util.regex.Pattern.DOTALL)
    })
  }

  /** Re-escape a LIKE pattern written under `escape` into the CANONICAL
    * backslash-escape form every downstream consumer (Pred.str,
    * [[likeRegex]]'s default) assumes — identity when `escape` is
    * already backslash. */
  private[plans] def canonLike(pattern: String, escape: Char): String =
    if (escape == '\\') pattern
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < pattern.length) {
        val c = pattern.charAt(i)
        if (c == escape && i + 1 < pattern.length) {
          sb.append('\\').append(pattern.charAt(i + 1)); i += 2
        } else {
          if (c == '\\') sb.append('\\')
          sb.append(c); i += 1
        }
      }
      sb.toString
    }

  /** Escape a plain string literal so it reads as LITERAL text inside
    * a LIKE pattern (the StartsWith/EndsWith/Contains reconstructions
    * — a literal '%'/'_'/'\' in the fragment must not become a
    * wildcard, ADVICE r14). */
  private def escapeLikeLiteral(s: String): String =
    s.flatMap {
      case c @ ('%' | '_' | '\\') => "\\" + c
      case c => c.toString
    }

  /** A vertex's filter split into driver-evaluable clauses and the
    * residual selectivity of everything that isn't (estimated from the
    * histogram profile — those conjuncts keep the independence
    * assumption; the trigger just can't see correlation through
    * them). */
  final case class VertexFilter(clauses: Seq[Clause], residualSel: Double) {
    /** Flattened single-alt predicates (compat accessor). */
    def preds: Seq[Pred] = clauses.collect { case Clause(Seq(p)) => p }
  }

  private val PredRe =
    """^\s*\(*\s*(\w+)\s*(=|<>|>=|<=|>|<)\s*(?:'([^']*)'|([-+]?[0-9.]+(?:[eE][-+]?[0-9]+)?))\s*\)*\s*$""".r
  private val LikeRe =
    """(?i)^\s*\(*\s*(\w+)\s+(NOT\s+)?LIKE\s+'([^']*)'\s*\)*\s*$""".r
  private val InRe =
    """(?i)^\s*\(*\s*(\w+)\s+(NOT\s+)?IN\s*\(([^)]*)\)\s*\)*\s*$""".r
  private val BetweenRe =
    """(?i)^\s*\(*\s*(\w+)\s+BETWEEN\s+([-+]?[0-9.]+(?:[eE][-+]?[0-9]+)?)\s+AND\s+([-+]?[0-9.]+(?:[eE][-+]?[0-9]+)?)\s*\)*\s*$""".r

  /** Parse one atomic predicate of the string grammar; None =
    * unevaluable. IN-lists accept all-string ('a','b') or all-numeric
    * (1, 2.5) literal lists. */
  def parsePred(s: String): Option[Pred] = s match {
    case PredRe(c, op, str, num) =>
      if (str != null) {
        if (op == "=" || op == "<>") Some(Pred(c, op, Some(str), None))
        else None // string ranges: leave to the residual
      } else Some(Pred(c, op, None, Some(num.toDouble)))
    case LikeRe(c, not, pat) =>
      Some(Pred(c, if (not == null) "like" else "notlike", Some(pat), None))
    case InRe(c, not, list) =>
      val items = list.split(",").map(_.trim).toSeq
      val op = if (not == null) "in" else "notin"
      if (items.isEmpty || items.exists(_.isEmpty)) None
      else if (items.forall(i => i.startsWith("'") && i.endsWith("'") &&
          i.length >= 2))
        Some(Pred(c, op, None, None,
          strs = items.map(i => i.substring(1, i.length - 1))))
      else
        scala.util.Try(items.map(_.toDouble)).toOption
          .map(ns => Pred(c, op, None, None, nums = ns))
    case _ => None
  }

  /** Split `s` on top-level ` kw ` separators (case-insensitive),
    * skipping matches inside single-quoted SQL literals — a LIKE
    * pattern of `'%black and white%'` must not be torn at its
    * embedded " and " (ADVICE r15). `''` escaping toggles the
    * in-quote flag twice, which is correct as long as the separator
    * never falls exactly between the doubled quotes (it cannot: the
    * separator requires surrounding spaces). Parenthesis depth is not
    * tracked — the corpus grammar is flat. */
  private[plans] def splitOutsideQuotes(s: String, kw: String): Seq[String] = {
    val pat = " " + kw.toLowerCase + " "
    val lower = s.toLowerCase
    val parts = Vector.newBuilder[String]
    var inQ = false
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') { inQ = !inQ; i += 1 }
      else if (!inQ && lower.startsWith(pat, i)) {
        parts += s.substring(start, i)
        i += pat.length
        start = i
      } else i += 1
    }
    parts += s.substring(start)
    parts.result().map(_.trim)
  }

  /** Split a filter string into conjuncts: " AND " is the separator
    * (outside quoted literals), EXCEPT the AND inside
    * `col BETWEEN lo AND hi`, which is rewritten to its two range
    * conjuncts (the grammar's only non-conjunctive AND — the
    * reference's parser special-cases it the same way,
    * MyUtils.java:152-180). A BETWEEN entangled with an
    * OR-disjunction on either side (`a BETWEEN 1 AND 2 OR b = 3`)
    * is NOT stitched — the distribution over OR is not two clean
    * range clauses, so the torn halves are re-joined into one
    * conjunct that prices as residual (ADVICE r15: the old stitch
    * dropped the `OR b = 3` disjunct from the first half, an
    * over-tight estimate). */
  def splitConjuncts(f: String): Seq[String] = {
    val parts = splitOutsideQuotes(f, "and")
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < parts.size) {
      val p = parts(i)
      val between = "(?i)^(.*\\S)\\s+BETWEEN\\s+(\\S+)$".r
      def hasOr(x: String) = splitOutsideQuotes(x, "or").size > 1
      p match {
        case between(col, lo)
            if i + 1 < parts.size && !hasOr(p) && !hasOr(parts(i + 1)) =>
          out += s"$col >= $lo"
          out += s"$col <= ${parts(i + 1)}"
          i += 2
        case between(_, _) if i + 1 < parts.size =>
          out += s"$p AND ${parts(i + 1)}"
          i += 2
        case _ =>
          out += p
          i += 1
      }
    }
    out.result()
  }

  /** Parse one conjunct into a [[Clause]]: a disjunction of atomic
    * predicates split on " OR " (1-alt = a plain predicate; a BETWEEN
    * arriving whole, e.g. inside parens, parses as its two-sided
    * range only at the [[splitConjuncts]] level — here it is atomic
    * via [[BetweenRe]] only when it stands alone). None = any
    * disjunct unevaluable (the whole conjunct falls to the
    * residual). */
  def parseClause(s: String): Option[Clause] = {
    val trimmed = s.trim
    // a standalone BETWEEN conjunct is a CONJUNCTION of two ranges —
    // representable only as two clauses, so the caller must have run
    // splitConjuncts first; accept it here as unevaluable-as-clause
    // unless it is the whole conjunct (then expand to >=, <= is
    // impossible in one disjunction — reject).
    val alts = splitOutsideQuotes(trimmed, "or")
    if (alts.size == 1) {
      trimmed match {
        case BetweenRe(_, _, _) => None // needs splitConjuncts
        case _ => parsePred(trimmed).map(p => Clause(Seq(p)))
      }
    } else {
      val parsed = alts.map(a => parsePred(
        a.stripPrefix("(").stripSuffix(")").trim))
      if (parsed.forall(_.isDefined)) Some(Clause(parsed.map(_.get)))
      else None
    }
  }

  /** Split a harness filter string (the corpus grammar: conjuncts
    * joined by " AND ", each conjunct optionally an OR-disjunction or
    * a BETWEEN) into evaluable clauses + residual selectivity. */
  def parseFilter(filter: Option[String],
      profile: StatsEstimator.Profile): VertexFilter =
    filter match {
      case None => VertexFilter(Nil, 1.0)
      case Some(f) =>
        val conjuncts = splitConjuncts(f)
        val (ok, rest) = conjuncts.map(c => c -> parseClause(c))
          .partition(_._2.isDefined)
        VertexFilter(ok.flatMap(_._2),
          rest.map(r => StatsEstimator.selectivityOf(profile)(r._1)).product)
    }

  /** [[parseFilter]]'s Catalyst twin: convert each analyzed conjunct
    * directly (the same shapes [[StatsEstimator.selectivityOfCatalyst]]
    * prices, plus In/InSet and Or-of-atomics); IsNotNull is a pushdown
    * artifact (always-true here — synopsis rows with null keys never
    * match anyway). */
  def fromCatalyst(
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      profile: StatsEstimator.Profile): VertexFilter = {
    import org.apache.spark.sql.catalyst.expressions._
    val converted = conjuncts.map(c => c -> convClause(c))
    val clauses = converted.collect { case (_, Some(Some(cl))) => cl }
    val residual = converted.collect { case (c, None) =>
      StatsEstimator.selectivityOfCatalyst(profile)(c) }.product
    VertexFilter(clauses, residual)
  }

  /** One Catalyst conjunct → a [[Clause]]: Some(None) = evaluable and
    * always true (IsNotNull), Some(Some(clause)) = evaluable, None =
    * unevaluable (caller prices it as residual). Or-trees flatten;
    * every disjunct must convert atomically. */
  private[plans] def convClause(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[Option[Clause]] = {
    import org.apache.spark.sql.catalyst.expressions.Or
    e match {
      case Or(_, _) =>
        def disjuncts(x: org.apache.spark.sql.catalyst.expressions.Expression):
            Seq[org.apache.spark.sql.catalyst.expressions.Expression] = x match {
          case Or(l, r) => disjuncts(l) ++ disjuncts(r)
          case other => Seq(other)
        }
        val alts = disjuncts(e).map(convAtom)
        if (alts.forall(a => a.exists(_.isDefined)))
          Some(Some(Clause(alts.map(_.get.get))))
        else None
      case _ => convAtom(e).map(_.map(p => Clause(Seq(p))))
    }
  }

  /** One ATOMIC Catalyst predicate → a [[Pred]] (same contract as
    * [[convClause]] minus disjunctions). */
  private def convAtom(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[Option[Pred]] = {
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
    def anyToIn(col: String, op: String, vals: Seq[Any]): Option[Pred] = {
      val strs = vals.collect {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      }
      val nums = vals.collect {
        case n: java.lang.Number => n.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
      }
      if (strs.size == vals.size) Some(Pred(col, op, None, None, strs = strs))
      else if (nums.size == vals.size)
        Some(Pred(col, op, None, None, nums = nums))
      else None
    }
    e match {
      case IsNotNull(_) => Some(None) // evaluable, always true
      case EqualTo(l, r: Literal) if attrOf(l).isDefined =>
        litStr(r).map(v => Some(Pred(attrOf(l).get, "=", Some(v), None)))
          .orElse(litNum(r).map(v => Some(Pred(attrOf(l).get, "=", None, Some(v)))))
      case EqualTo(l: Literal, r) if attrOf(r).isDefined =>
        convAtom(EqualTo(r, l))
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
      case in @ In(v, list) if attrOf(v).isDefined &&
          list.forall(_.isInstanceOf[Literal]) =>
        anyToIn(attrOf(v).get, "in",
          list.map(_.asInstanceOf[Literal].value)).map(Some(_))
      case Not(In(v, list)) if attrOf(v).isDefined &&
          list.forall(_.isInstanceOf[Literal]) =>
        anyToIn(attrOf(v).get, "notin",
          list.map(_.asInstanceOf[Literal].value)).map(Some(_))
      case is: InSet if attrOf(is.child).isDefined =>
        anyToIn(attrOf(is.child).get, "in", is.hset.toSeq).map(Some(_))
      case Not(is: InSet) if attrOf(is.child).isDefined =>
        anyToIn(attrOf(is.child).get, "notin", is.hset.toSeq).map(Some(_))
      case _ =>
        likeShape(e).map { case (c, pat, neg) =>
          Some(Pred(c, if (neg) "notlike" else "like", Some(pat), None))
        }
    }
  }

  /** Evaluate one atomic predicate against a synopsis row (numerics
    * were normalized to Double at collection). Nulls never match. */
  def eval(row: Map[String, Any], p: Pred): Boolean =
    row.get(p.col) match {
      case None | Some(null) => false
      case Some(v) =>
        if (p.op == "in" || p.op == "notin") {
          val member = v match {
            case vs: String => p.strs.contains(vs)
            case d: java.lang.Number =>
              val x = d.doubleValue(); p.nums.exists(_ == x)
            case _ => false
          }
          if (p.op == "in") member
          else v match { // NOT IN over a wrong-typed column: no match
            case _: String => p.strs.nonEmpty && !member
            case _: java.lang.Number => p.nums.nonEmpty && !member
            case _ => false
          }
        } else (p.str, p.num) match {
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

  /** Evaluate one clause (disjunction) against a synopsis row. */
  def eval(row: Map[String, Any], c: Clause): Boolean =
    c.alts.exists(eval(row, _))

  /** A Catalyst conjunct that is LIKE-shaped: `Like` itself (its
    * escapeChar normalized to the canonical backslash form), or the
    * StartsWith/EndsWith/Contains forms LikeSimplification rewrites
    * anchored patterns into (an injected rule sees conjuncts AFTER
    * that rewrite inside the same fixpoint) — their literal fragments
    * ESCAPED so a literal '%'/'_' cannot read back as a wildcard —
    * plus their negations. Returns (column, canonical SQL LIKE
    * pattern, negated). The reference's JOB predicate language
    * includes LIKE (Query.java:56, MyUtils.java:152-180); this is
    * what lets the estimator ladder price it instead of falling to
    * the 1/3 default. */
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
    e match {
      case l: Like =>
        for (c <- attrOf(l.left); p <- litStr(l.right))
          yield (c, canonLike(p, l.escapeChar), false)
      case Not(l: Like) =>
        for (c <- attrOf(l.left); p <- litStr(l.right))
          yield (c, canonLike(p, l.escapeChar), true)
      case StartsWith(a, lit) =>
        for (c <- attrOf(a); p <- litStr(lit))
          yield (c, escapeLikeLiteral(p) + "%", false)
      case Not(StartsWith(a, lit)) =>
        for (c <- attrOf(a); p <- litStr(lit))
          yield (c, escapeLikeLiteral(p) + "%", true)
      case EndsWith(a, lit) =>
        for (c <- attrOf(a); p <- litStr(lit))
          yield (c, "%" + escapeLikeLiteral(p), false)
      case Not(EndsWith(a, lit)) =>
        for (c <- attrOf(a); p <- litStr(lit))
          yield (c, "%" + escapeLikeLiteral(p), true)
      case Contains(a, lit) =>
        for (c <- attrOf(a); p <- litStr(lit))
          yield (c, "%" + escapeLikeLiteral(p) + "%", false)
      case Not(Contains(a, lit)) =>
        for (c <- attrOf(a); p <- litStr(lit))
          yield (c, "%" + escapeLikeLiteral(p) + "%", true)
      case _ => None
    }
  }

  /** Clause selectivity at SAMPLE FIDELITY, for free: evaluate the
    * disjunction row-wise over the table's amortized full-width
    * synopsis rows (the same cached rows the escalation trigger
    * filters — no extra scan). Row-wise evaluation prices
    * within-clause correlation exactly, where a clamped-union formula
    * over per-alt selectivities would assume independence. Zero
    * matches floor at half a row's mass rather than 0 — the planner
    * divides by these. None when the synopsis is empty or a touched
    * column isn't sampled (caller falls back to the ladder). */
  def clauseSelectivity(spark: SparkSession, sfDir: String, rel: String,
      clause: Clause, cap: Int = 2000): Option[Double] = {
    val syn = fullSynopsis(spark, sfDir, rel, cap)
    if (syn.rows.isEmpty ||
        !clause.alts.forall(p => syn.rows.head.contains(p.col))) None
    else {
      val n = syn.rows.count(eval(_, clause))
      Some(math.max(n.toDouble, 0.5) / syn.rows.size)
    }
  }

  /** LIKE selectivity from the synopsis — the p25 entry point, now a
    * 1-alt [[clauseSelectivity]]. */
  def likeSelectivity(spark: SparkSession, sfDir: String, rel: String,
      col: String, pattern: String, negate: Boolean,
      cap: Int = 2000): Option[Double] =
    clauseSelectivity(spark, sfDir, rel,
      Clause(Seq(Pred(col, if (negate) "notlike" else "like",
        Some(pattern), None))), cap)

  /** The SHAPES the synopsis prices better than the histogram ladder:
    * LIKE/NOT LIKE (no per-column stat sees a pattern), IN/NOT IN
    * (the ladder has no set-membership estimate), and any OR-clause
    * (the ladder prices disjunctions at the 1/3 default). Equality
    * and ranges stay on the ladder — histograms already price them,
    * and rerouting them would change every plan rather than complete
    * the predicate language. */
  def synopsisPriced(c: Clause): Boolean =
    c.alts.size > 1 || c.alts.exists(p =>
      p.op == "like" || p.op == "notlike" || p.op == "in" || p.op == "notin")

  /** String-path filter selectivity with the synopsis-priced shapes
    * (LIKE / IN / OR / BETWEEN-split ranges — [[synopsisPriced]])
    * evaluated over the amortized full synopsis — the HARNESS twin of
    * the in-optimizer [[graft.plans.GraftJoinReorder]] conjSel routing
    * (p25 LIKE, p27 IN/OR), so the regret loop can measure what
    * synopsis pricing buys at histogram-tier cost (no per-query sample
    * scan). Everything else keeps [[StatsEstimator.selectivityOf]]'s
    * ladder. */
  def likeAwareSel(spark: SparkSession, sfDir: String, rel: String,
      filter: Option[String], profile: StatsEstimator.Profile): Double =
    filter match {
      case None => 1.0
      case Some(f) => splitConjuncts(f).map { c =>
        parseClause(c) match {
          case Some(clause) if synopsisPriced(clause) =>
            (try clauseSelectivity(spark, sfDir, rel, clause)
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
    * subset of size ≤ 4 on driver-filtered full synopses vs the
    * histogram estimate; flag on ≥ `cut` disagreement. Returns the
    * flags (empty = plan from histograms). */
  def escalationFlags(spark: SparkSession, sfDir: String, g: QueryGraph,
      vf: Vector[VertexFilter], histCard: Cardinality,
      cut: Double = 10.0, cap: Int = 2000): Vector[Flag] = {
    val filtered = Vector.tabulate(g.n) { i =>
      val full = fullSynopsis(spark, sfDir, g.relations(i), cap)
      val keep = full.rows.indices.filter(r =>
        vf(i).clauses.forall(eval(full.rows(r), _)))
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
