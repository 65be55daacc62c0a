package graft.plans

import org.apache.spark.sql.SparkSession

/** Measured-statistics cardinality estimation — the System-R /
  * Selinger model fed by [[TableStats]] profiles: equality predicates
  * cost 1/NDV, range predicates interpolate the min/max span, join
  * cardinality divides by the larger key-side NDV, independence across
  * conjuncts. This is the estimator a deployed engine actually plans
  * with; the reference *injects* these numbers per query to study what
  * happens when they're wrong (MyMetadataQuery.java:81-162,
  * README: cardinality-sensitivity experiment). p10 plans the flagship
  * query end-to-end with estimates derived ONLY from measured profiles
  * — no injected truth anywhere — and must still produce the
  * hash-identical result (plan choice can never change answers; cost
  * regret vs true cardinalities is ExperimentMain's measurement).
  */
object StatsEstimator {

  final case class ColStats(
      ndv: Double, minN: Option[Double], maxN: Option[Double])

  /** `bounds`: optional equi-depth histogram cut points per column
    * (B-1 interior boundaries → B equal-mass buckets between the
    * column's min/max). Empty map = no histograms = the classic
    * Selinger profile; range selectivity then falls back to uniform
    * min-max span interpolation. */
  final case class Profile(rows: Double, cols: Map[String, ColStats],
      bounds: Map[String, Vector[Double]] = Map.empty)

  // both memo keys carry the table's file-LISTING fingerprint (the
  // same staleness signal the synopsis cache and the feedback epoch
  // use): a table regenerated at the same path re-profiles instead of
  // serving stale NDVs/bounds in a long-lived session (VERDICT r14 —
  // the driver has regenerated testdata in place before)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Boolean, String), Profile]()
  private val histCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, String), Map[String, Vector[Double]]]()

  /** Profile `table` for planning; memoized per (sfDir, table, approx)
    * — ANALYZE is run once, plans are made many times. The DEPLOYED
    * default is the approx collection pass (`approx_count_distinct`:
    * HLL, one non-Expand scan — at 100 TB the exact multi-distinct's
    * 7× Expand makes ANALYZE the dominant cost of measured-stats
    * planning, SCALE_r7.md §4). A planner consumes NDVs only through
    * ratios, so HLL's ~2% error is noise against Selinger's
    * independence assumptions; StatsEstimatorSpec pins that the
    * flagship q-error bound AND the chosen join order survive the
    * switch. `approx = false` is the offline-exact form q80's oracle
    * hash-checks. */
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Test visibility: (profile, histogram) memo sizes — the eviction
    * spec pins that epoch rotation replaces rather than accumulates. */
  private[graft] def cacheSizes: (Int, Int) = (cache.size, histCache.size)

  def profileTable(
      spark: SparkSession, sfDir: String, table: String,
      approx: Boolean = true): Profile = {
    val key = (sfDir, table, approx, SampleEstimator.listingFp(sfDir, table))
    graft.sources.Tables.evictStaleEpochs(cache, key)
    cache.computeIfAbsent(key, _ => {
      // make the NDV source attributable: a surprising join order at a
      // larger SF should be traceable to which ANALYZE mode fed it
      log.info(s"graft ANALYZE $table ($sfDir) mode=" +
        (if (approx) "approx(HLL)" else "exact"))
      val rows =
        (if (approx) TableStats.profileApprox(spark, sfDir, table)
         else TableStats.profile(spark, sfDir, table)).collect()
      Profile(
        rows = if (rows.isEmpty) 0.0 else rows.head.getLong(1).toDouble,
        cols = rows.map { r =>
          r.getString(0) -> ColStats(
            ndv = r.getLong(3).toDouble,
            minN = Option(r.get(4)).map(_.asInstanceOf[Double]),
            maxN = Option(r.get(5)).map(_.asInstanceOf[Double]))
        }.toMap)
    })
  }

  /** [[profileTable]] plus equi-depth histogram bounds on every
    * numeric column — the HISTOGRAM estimator's input. Kept a separate
    * (memoized) collection so plain Selinger planning never pays the
    * percentile pass; both pieces are deployed-approx (HLL NDVs, KLL
    * percentiles) — one scan each. */
  def profileTableHist(
      spark: SparkSession, sfDir: String, table: String,
      buckets: Int = 32, approx: Boolean = true): Profile = {
    val p = profileTable(spark, sfDir, table, approx)
    val hkey = (sfDir, table, buckets, SampleEstimator.listingFp(sfDir, table))
    graft.sources.Tables.evictStaleEpochs(histCache, hkey)
    val b = histCache.computeIfAbsent(hkey, _ => {
      log.info(s"graft HISTOGRAM $table ($sfDir) buckets=$buckets")
      TableStats.equiDepthBounds(spark, sfDir, table, buckets)
    })
    p.copy(bounds = b)
  }

  /** Fraction of a column's rows with value ≤ v under the equi-depth
    * histogram (cuts = B-1 interior boundaries, min/max from the
    * profile): whole buckets below v count 1/B each, the bucket
    * containing v contributes linear interpolation WITHIN the bucket —
    * uniformity is assumed only inside one bucket's 1/B mass, which is
    * what makes skewed tails estimable. */
  private[plans] def histFracBelow(
      mn: Double, mx: Double, cuts: Vector[Double], v: Double): Double = {
    val bounds = mn +: cuts :+ mx
    val b = bounds.size - 1
    if (v <= bounds.head) 0.0
    else if (v >= bounds.last) 1.0
    else {
      val k = math.min(math.max(bounds.lastIndexWhere(_ <= v), 0), b - 1)
      val lo = bounds(k); val hi = bounds(k + 1)
      val frac = if (hi > lo) (v - lo) / (hi - lo) else 1.0
      (k + frac) / b
    }
  }

  private val EqStr = """^\s*(\w+)\s*=\s*'([^']*)'\s*$""".r
  private val EqNum = """^\s*(\w+)\s*=\s*([0-9.+-]+)\s*$""".r
  private val GtNum = """^\s*(\w+)\s*>\s*([0-9.+-]+)\s*$""".r
  private val LtNum = """^\s*(\w+)\s*<\s*([0-9.+-]+)\s*$""".r

  private def clamp(x: Double): Double = math.min(math.max(x, 0.0), 1.0)

  /** Range selectivity for `col (<|>) v`: equi-depth histogram when
    * the profile carries bounds for the column ([[histFracBelow]]),
    * uniform min-max span interpolation otherwise — ONE definition
    * shared by the string and Catalyst predicate paths, so adding
    * histograms upgraded both at once. */
  private def rangeSel(
      p: Profile, c: String, v: Double, greater: Boolean): Option[Double] =
    for { s <- p.cols.get(c); mn <- s.minN; mx <- s.maxN if mx > mn } yield {
      val below = p.bounds.get(c).filter(_.nonEmpty)
        .map(cuts => histFracBelow(mn, mx, cuts, v))
        .getOrElse(clamp((v - mn) / (mx - mn)))
      clamp(if (greater) 1.0 - below else below)
    }

  /** Selectivity of one conjunct-free predicate string against a
    * profile. Selinger's defaults: 1/NDV for equality, histogram or
    * min-max span interpolation for ranges ([[rangeSel]]), 1/3 when
    * the shape is unrecognized. */
  def selectivityOf(p: Profile)(pred: String): Double = {
    def eq(c: String): Double =
      p.cols.get(c).map(s => 1.0 / math.max(s.ndv, 1.0)).getOrElse(1.0 / 3)
    pred match {
      case EqStr(c, _) => eq(c)
      case EqNum(c, _) => eq(c)
      case GtNum(c, v) => rangeSel(p, c, v.toDouble, greater = true)
        .getOrElse(1.0 / 3)
      case LtNum(c, v) => rangeSel(p, c, v.toDouble, greater = false)
        .getOrElse(1.0 / 3)
      case _ => 1.0 / 3
    }
  }

  /** [[selectivityOf]]'s in-optimizer twin: the same Selinger defaults
    * over a CATALYST conjunct instead of a predicate string — what
    * [[GraftJoinReorder]] estimates from when the leaf filters arrive
    * as analyzed expressions rather than harness-declared strings.
    * `IsNotNull` is a pushdown artifact, not a user predicate:
    * selectivity 1 (counting it 1/3 would penalize every filtered
    * leaf Spark instrumented). Casts are looked through; unrecognized
    * shapes get the same 1/3 default as the string form. */
  def selectivityOfCatalyst(p: Profile)(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Double = {
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
    def eq(c: String): Double =
      p.cols.get(c).map(s => 1.0 / math.max(s.ndv, 1.0)).getOrElse(1.0 / 3)
    def rng(c: String, l: Literal, greater: Boolean): Double =
      litNum(l).flatMap(v => rangeSel(p, c, v, greater)).getOrElse(1.0 / 3)
    e match {
      case IsNotNull(_) => 1.0
      case EqualTo(l, r: Literal) if attrOf(l).isDefined =>
        eq(attrOf(l).get)
      case EqualTo(l: Literal, r) if attrOf(r).isDefined =>
        eq(attrOf(r).get)
      case GreaterThan(l, r: Literal) if attrOf(l).isDefined =>
        rng(attrOf(l).get, r, greater = true)
      case GreaterThanOrEqual(l, r: Literal) if attrOf(l).isDefined =>
        rng(attrOf(l).get, r, greater = true)
      case LessThan(l, r: Literal) if attrOf(l).isDefined =>
        rng(attrOf(l).get, r, greater = false)
      case LessThanOrEqual(l, r: Literal) if attrOf(l).isDefined =>
        rng(attrOf(l).get, r, greater = false)
      case GreaterThan(l: Literal, r) if attrOf(r).isDefined =>
        rng(attrOf(r).get, l, greater = false)
      case LessThan(l: Literal, r) if attrOf(r).isDefined =>
        rng(attrOf(r).get, l, greater = true)
      case _ => 1.0 / 3
    }
  }

  /** The estimator as the planners' [[Cardinality]]: per-relation rows
    * = measured rows × estimated filter selectivity; every join edge
    * inside the subset divides by max(NDV(left key), NDV(right key))
    * (containment assumption — each left key value finds its match
    * group of size rows/NDV on the right); composite keys multiply
    * per-column NDVs capped at the relation's rows. */
  def cardinality(
      g: QueryGraph, profiles: Vector[Profile],
      filters: Vector[Option[String]]): Cardinality =
    cardinalityWithSel(g, profiles, Vector.tabulate(g.n)(i =>
      filters(i).map(selectivityOf(profiles(i))).getOrElse(1.0)))

  /** [[cardinality]] with PRE-COMPUTED per-relation selectivities —
    * the shared formula for both predicate sources (string-declared
    * via [[selectivityOf]], Catalyst-derived via
    * [[selectivityOfCatalyst]]), one definition so the two paths can
    * never drift on the estimation model itself. */
  def cardinalityWithSel(
      g: QueryGraph, profiles: Vector[Profile],
      selIn: Vector[Double]): Cardinality = {
    val base = Array.tabulate(g.n)(i => profiles(i).rows)
    val sel = Array.tabulate(g.n)(i => selIn(i))
    def keyNdv(v: Int, cols: Seq[String]): Double = {
      val p = profiles(v)
      val per = cols.map(c => p.cols.get(c).map(_.ndv).getOrElse(p.rows))
      math.min(per.product, math.max(p.rows, 1.0))
    }
    new Cardinality {
      def apply(s: Long): Double = {
        var rows = 1.0
        var rest = s
        while (rest != 0) {
          val i = java.lang.Long.numberOfTrailingZeros(rest)
          rows *= math.max(base(i) * sel(i), 1.0)
          rest &= rest - 1
        }
        g.edges.foreach { e =>
          if ((e.mask & s) == e.mask)
            rows /= math.max(
              math.max(keyNdv(e.a, e.conds.map(_._1)),
                keyNdv(e.b, e.conds.map(_._2))), 1.0)
        }
        math.max(rows, 1.0)
      }
      override def ndv(vertex: Int, cols: Seq[String]): Double =
        keyNdv(vertex, cols)
    }
  }
}
