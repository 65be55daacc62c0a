package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The FOURTH estimator tier: join-sample synopses. Per-column
  * statistics — NDVs, min/max spans, equi-depth histograms — are all
  * structurally blind to CROSS-RELATION correlation: tree9_sel's
  * residual 23× regret is an EMPTY intersection (NATION_3 customers ×
  * 'error' events; true cardinality 0 while every marginal is
  * near-exact, tools/EstimateDiagnose), and star10_sel's
  * anti-correlated price bands are the same trap. The textbook answer
  * (join synopses: Acharya et al., SIGMOD 1999; sampling-based
  * estimation surveys since) is to keep a bounded uniform row sample
  * per table and ESTIMATE a subexpression by executing it on the
  * samples: independent Bernoulli samples make the scaled join count
  * unbiased — E[|Sᴬ ⋈ Sᴮ| / (pᴬ pᴮ)] = |A ⋈ B| — and an empty
  * intersection stays empty in any sample.
  *
  * Deployment shape: the sample is collected ONCE per (table, filter)
  * at ANALYZE time with a deterministic hash predicate
  * (`xxhash64(struct(*)) mod D < pD` — no RNG state, same rows at
  * every executor count), capped at `cap` rows per table, COLUMN-
  * PRUNED to the join keys the query graph touches, and held on the
  * driver — at 100 TB the synopsis stays `cap × keyWidth` bytes per
  * table while subset estimation is a microsecond-scale in-memory
  * hash join, not a cluster job. Variance, not bias, is the cost of
  * small `p`; the estimator floors at 1 row (a sampled zero proves
  * little for genuinely rare non-empty joins — documented, measured
  * in EXPERIMENT_r12 §2c).
  *
  * The reference never estimates join cardinalities at all — it
  * INJECTS truth per query (MyMetadataQuery.java:81-162) precisely
  * because estimation is the hard open problem its experiments study;
  * this tier is the engine-side answer those experiments motivate.
  */
object SampleEstimator {

  /** Driver-held sample of one (aliased, filtered) relation: join-key
    * tuples of the sampled rows, plus the exact sampling rate.
    * `hashes` (parallel to `rows`) carries each row's sampling-hash
    * bucket so the synopsis can be MAINTAINED incrementally
    * ([[refresh]]): threshold sampling has the subset property — the
    * sample at a smaller rate is exactly a filter of the sample at a
    * larger one, so an append never forces a full-table rescan. */
  final case class RelSample(rows: Vector[Map[String, Any]], p: Double,
      hashes: Vector[Long] = Vector.empty)

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, String, Int), RelSample]()

  private val D = 10000L

  private def thresholdOf(total: Double, cap: Int): Long =
    math.max(1L, math.ceil(math.min(1.0, cap / math.max(total, 1.0)) * D).toLong)

  /** Generic collector: deterministic threshold hash sample of `df`
    * (already filtered), rate derived from `total` (the UNfiltered
    * base count) and `cap`; pruned to `keyCols`, numeric keys
    * normalized to Double so cross-width equi-keys (int vs bigint)
    * compare equal driver-side. Each row's hash bucket rides along
    * for incremental [[refresh]]. */
  def sampleOf(df: org.apache.spark.sql.DataFrame, total: Double,
      keyCols: Seq[String], cap: Int): RelSample = {
    val k = thresholdOf(total, cap)
    val dataCols = df.columns.toSeq
    val bucket = pmod(xxhash64(struct(dataCols.map(col): _*)), lit(D))
    val sampled =
      if (k >= D) df.withColumn("__graft_bucket", bucket)
      else df.withColumn("__graft_bucket", bucket)
        .where(col("__graft_bucket") < lit(k))
    val numeric = df.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    ).toMap
    val proj = keyCols.map(c =>
      (if (numeric(c)) col(c).cast("double") else col(c)).as(c)) :+
      col("__graft_bucket")
    val collected = sampled.select(proj: _*).collect().toVector
    val rows = collected.map(r =>
      keyCols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    val hashes = collected.map(_.getLong(keyCols.size))
    RelSample(rows, if (k >= D) 1.0 else k.toDouble / D, hashes)
  }

  /** INCREMENTAL synopsis maintenance: the sample after `delta`
    * arrives, built WITHOUT rescanning the base table. Threshold
    * sampling is monotone — the new (smaller) threshold's sample is a
    * strict subset of the old one — so the old synopsis is
    * re-thresholded driver-side and only the delta is scanned. The
    * result is SET-EQUAL to a full rebuild over base ∪ delta by
    * construction (same deterministic hash, same threshold), which is
    * what makes the d12/q96/s35 incremental discipline apply to
    * planner synopses too: at 100 TB an ingest batch refreshes every
    * table's synopsis at delta-scan cost. `delta` must carry the same
    * relation filter as the original sample. */
  def refresh(prev: RelSample, delta: org.apache.spark.sql.DataFrame,
      newTotal: Double, keyCols: Seq[String], cap: Int): RelSample = {
    require(prev.hashes.size == prev.rows.size,
      "refresh needs a synopsis collected with hash buckets")
    val k = thresholdOf(newTotal, cap)
    val kept = prev.rows.zip(prev.hashes).filter(_._2 < k)
    // same rate inputs → same threshold: the predicate is pushed into
    // the DELTA scan; the base is never touched
    val deltaSample = sampleOf(delta, newTotal, keyCols, cap)
    val all = kept ++ deltaSample.rows.zip(deltaSample.hashes)
    RelSample(all.map(_._1), if (k >= D) 1.0 else k.toDouble / D,
      all.map(_._2))
  }

  /** Deterministic hash sample of `rel` (filter applied first — the
    * two commute for a row-wise hash predicate); see [[sampleOf]]. */
  def sampleRel(spark: SparkSession, sfDir: String, rel: String,
      filter: Option[String], keyCols: Seq[String], cap: Int): RelSample =
    cache.computeIfAbsent(
      (sfDir, rel, filter.getOrElse(""), keyCols.sorted.mkString(","), cap), _ => {
        val base = AliasedRels.load(spark, sfDir, rel)
        val total = AliasedRels.rowCount(spark, sfDir, rel).toDouble
        val filtered = filter.map(f => base.where(expr(f))).getOrElse(base)
        sampleOf(filtered, total, keyCols, cap)
      })

  /** Join-key columns of each relation, as the query graph uses them. */
  private def keyColsOf(g: QueryGraph): Vector[Seq[String]] =
    Vector.tabulate(g.n) { i =>
      g.edges.flatMap {
        case e if e.a == i => e.conds.map(_._1)
        case e if e.b == i => e.conds.map(_._2)
        case _ => Nil
      }.distinct
    }

  /** The sample-synopsis [[Cardinality]]: subset rows = the subset's
    * join executed over the driver-held samples, scaled by Π 1/pᵢ,
    * floored at 1; per-subset results memoized (DP enumerators ask for
    * each connected subset many times). NDVs delegate to the measured
    * profiles — sampling estimates cardinality, not key distinctness. */
  def cardinality(spark: SparkSession, sfDir: String, g: QueryGraph,
      filters: Vector[Option[String]], profiles: Vector[StatsEstimator.Profile],
      cap: Int = 2000): Cardinality = {
    val keyCols = keyColsOf(g)
    val samples = Vector.tabulate(g.n)(i =>
      sampleRel(spark, sfDir, g.relations(i), filters.lift(i).flatten,
        keyCols(i), cap))
    val memo = new java.util.concurrent.ConcurrentHashMap[Long, Double]()

    def estimate(s: Long): Double = {
      val first = java.lang.Long.numberOfTrailingZeros(s)
      var inSet = 1L << first
      var cur = samples(first).rows
      val used = scala.collection.mutable.BitSet.empty
      var changed = true
      while (changed) {
        changed = false
        g.edges.zipWithIndex.foreach { case (e, idx) =>
          if (!used(idx) && (e.mask & s) == e.mask && cur.nonEmpty) {
            val aIn = (inSet & (1L << e.a)) != 0
            val bIn = (inSet & (1L << e.b)) != 0
            if (aIn && bIn) { // closing edge of a cycle: post-filter
              cur = cur.filter(r => e.conds.forall { case (ca, cb) =>
                val va = r(ca); val vb = r(cb)
                va != null && va == vb
              })
              used += idx; changed = true
            } else if (aIn || bIn) { // grow the joined set by one relation
              val (next, curCols, nextCols) =
                if (aIn) (e.b, e.conds.map(_._1), e.conds.map(_._2))
                else (e.a, e.conds.map(_._2), e.conds.map(_._1))
              val index = samples(next).rows
                .filter(r => nextCols.forall(r(_) != null))
                .groupBy(r => nextCols.map(r(_)))
              cur = cur.flatMap { r =>
                val key = curCols.map(r(_))
                if (key.exists(_ == null)) Vector.empty
                else index.getOrElse(key, Vector.empty).map(o => r ++ o)
              }
              inSet |= 1L << next; used += idx; changed = true
            }
          }
        }
      }
      var scale = 1.0
      var rest = s
      while (rest != 0) {
        val i = java.lang.Long.numberOfTrailingZeros(rest)
        scale /= samples(i).p
        rest &= rest - 1
      }
      math.max(cur.size * scale, 1.0)
    }

    new Cardinality {
      def apply(s: Long): Double =
        memo.computeIfAbsent(s, estimate(_))
      override def ndv(vertex: Int, cols: Seq[String]): Double = {
        val p = profiles(vertex)
        val per = cols.map(c => p.cols.get(c).map(_.ndv).getOrElse(p.rows))
        math.min(per.product, math.max(p.rows, 1.0))
      }
    }
  }
}
