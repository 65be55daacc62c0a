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
  * REPEATED TABLES (JOB's defining feature — the reference's
  * cardinality keys qualify repeats by filter,
  * MyMetadataQuery.java:134-146): estimation keys every sample value
  * by (vertex, column), so two vertices of the same base table — or
  * two different tables sharing a column name — can never collide in
  * the synopsis join. Because the sampling predicate is the SAME
  * deterministic row hash for every vertex of one base table, a row's
  * inclusion is ONE event across all of them, so the unbiased scale
  * for a joined tuple is Π 1/p over the tuple's DISTINCT base rows —
  * a self-join pair (r, r) survives with probability p, not p²; the
  * naive Π 1/pᵢ over vertices would overestimate self-joins by
  * ~|A|·(1/p − 1). Each sampled row carries its full 64-bit row hash
  * as identity ([[RelSample.ids]]), shared across aliases because the
  * hash is over VALUES, not column names.
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
    * larger one, so an append never forces a full-table rescan.
    * `ids` (also parallel) carries the full 64-bit row hash as a
    * cross-alias row IDENTITY — two vertices sampling the same base
    * table see the same id for the same physical row, which is what
    * the self-join-aware distinct-row scaling keys on. */
  final case class RelSample(rows: Vector[Map[String, Any]], p: Double,
      hashes: Vector[Long] = Vector.empty, ids: Vector[Long] = Vector.empty)

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, String, Int, String), RelSample]()

  private val D = 10000L

  private def thresholdOf(total: Double, cap: Int): Long =
    math.max(1L, math.ceil(math.min(1.0, cap / math.max(total, 1.0)) * D).toLong)

  /** Cheap table fingerprint for synopsis-cache invalidation: the
    * backing parquet file listing's (name, size, mtime) — a driver
    * metadata op, no scan — so an ingest commit (new/rewritten files)
    * drops the cached synopsis instead of planning from stale samples
    * in a long-lived session. */
  private[plans] def listingFp(sfDir: String, rel: String): String =
    graft.sources.Tables.listingFp(new java.io.File(
      sfDir.stripPrefix("file:"), AliasedRels.baseOf(rel) + ".parquet"))

  /** Generic collector: deterministic threshold hash sample of `df`
    * (already filtered), rate derived from `total` (the UNfiltered
    * base count) and `cap`; pruned to `keyCols`, numeric keys
    * normalized to Double so cross-width equi-keys (int vs bigint)
    * compare equal driver-side. Each row's hash bucket rides along
    * for incremental [[refresh]]; the full row hash rides along as
    * the cross-alias row identity. */
  def sampleOf(df: org.apache.spark.sql.DataFrame, total: Double,
      keyCols: Seq[String], cap: Int): RelSample = {
    val k = thresholdOf(total, cap)
    val dataCols = df.columns.toSeq
    val rowHash = xxhash64(struct(dataCols.map(col): _*))
    val sampled =
      if (k >= D) df.withColumn("__graft_rowhash", rowHash)
      else df.withColumn("__graft_rowhash", rowHash)
        .where(pmod(col("__graft_rowhash"), lit(D)) < lit(k))
    val numeric = df.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    ).toMap
    val proj = keyCols.map(c =>
      (if (numeric(c)) col(c).cast("double") else col(c)).as(c)) :+
      col("__graft_rowhash")
    val collected = sampled.select(proj: _*).collect().toVector
    val rows = collected.map(r =>
      keyCols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    val ids = collected.map(_.getLong(keyCols.size))
    RelSample(rows, if (k >= D) 1.0 else k.toDouble / D,
      ids.map(h => java.lang.Math.floorMod(h, D)), ids)
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
    val prevIds =
      if (prev.ids.size == prev.rows.size) prev.ids
      else prev.hashes // pre-ids synopsis: buckets are the best identity
    val kept = prev.rows.lazyZip(prev.hashes).lazyZip(prevIds).toVector
      .filter(_._2 < k)
    // same rate inputs → same threshold: the predicate is pushed into
    // the DELTA scan; the base is never touched
    val deltaSample = sampleOf(delta, newTotal, keyCols, cap)
    val all = kept ++
      deltaSample.rows.lazyZip(deltaSample.hashes).lazyZip(deltaSample.ids)
        .toVector
    RelSample(all.map(_._1), if (k >= D) 1.0 else k.toDouble / D,
      all.map(_._2), all.map(_._3))
  }

  /** Deterministic hash sample of `rel` (filter applied first — the
    * two commute for a row-wise hash predicate); see [[sampleOf]].
    * Memoized per (dir, rel, filter, keys, cap, FILE LISTING) — the
    * listing fingerprint is what lets an ingest commit invalidate the
    * synopsis without anyone wiring an explicit hook. */
  def sampleRel(spark: SparkSession, sfDir: String, rel: String,
      filter: Option[String], keyCols: Seq[String], cap: Int): RelSample = {
    val key =
      (sfDir, rel, filter.getOrElse(""), keyCols.sorted.mkString(","), cap,
        listingFp(sfDir, rel))
    graft.sources.Tables.evictStaleEpochs(cache, key)
    cache.computeIfAbsent(key, _ => {
        val base = AliasedRels.load(spark, sfDir, rel)
        val total = AliasedRels.rowCount(spark, sfDir, rel).toDouble
        val filtered = filter.map(f => base.where(expr(f))).getOrElse(base)
        sampleOf(filtered, total, keyCols, cap)
      })
  }

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
    * join executed over the driver-held samples, each joined tuple
    * weighted by Π 1/p over its DISTINCT base rows (self-join-aware —
    * see the object doc), floored at 1; per-subset results memoized
    * (DP enumerators ask for each connected subset many times). NDVs
    * delegate to the measured profiles — sampling estimates
    * cardinality, not key distinctness. Sample values are keyed by
    * (vertex, column) driver-side, so repeated tables and shared
    * column names across relations are safe by construction. */
  def cardinality(spark: SparkSession, sfDir: String, g: QueryGraph,
      filters: Vector[Option[String]], profiles: Vector[StatsEstimator.Profile],
      cap: Int = 2000): Cardinality = {
    val keyCols = keyColsOf(g)
    val samples = Vector.tabulate(g.n)(i =>
      sampleRel(spark, sfDir, g.relations(i), filters.lift(i).flatten,
        keyCols(i), cap))
    val est = subsetEstimator(g, samples, Vector.fill(g.n)(1.0))
    new Cardinality {
      def apply(s: Long): Double = est(s)
      override def ndv(vertex: Int, cols: Seq[String]): Double = {
        val p = profiles(vertex)
        val per = cols.map(c => p.cols.get(c).map(_.ndv).getOrElse(p.rows))
        math.min(per.product, math.max(p.rows, 1.0))
      }
    }
  }

  /** The core subset-join estimator over ALREADY-COLLECTED synopses
    * (memoized per mask): execute the subset's join driver-side,
    * weight each tuple by Π 1/p over its distinct base rows, multiply
    * by each member's `extraSel` (a residual selectivity for filter
    * conjuncts applied OUTSIDE the synopsis — 1.0 when the synopsis
    * rows are already fully filtered), floor at 1. Shared by
    * [[cardinality]] and [[AutoEstimator]]'s escalation trigger. */
  private[plans] def subsetEstimator(g: QueryGraph, samples: Vector[RelSample],
      extraSel: Vector[Double]): Long => Double = {
    // population index: vertices of the same BASE table sample the
    // same rows under the same hash threshold, so a shared row id is
    // one inclusion event, not two
    val popNames = g.relations.map(AliasedRels.baseOf).distinct
    val popOf = Array.tabulate(g.n)(i =>
      popNames.indexOf(AliasedRels.baseOf(g.relations(i))))
    val memo = new java.util.concurrent.ConcurrentHashMap[Long, Double]()

    // one in-flight tuple of the sampled join: values keyed by
    // (vertex, column); the distinct (population, rowId) set that
    // prices it
    final case class Tup(vals: Map[(Int, String), Any], rows: Set[(Int, Long)])

    def estimate(s: Long): Double = {
      val first = java.lang.Long.numberOfTrailingZeros(s)
      var inSet = 1L << first
      def tuplesOf(v: Int): Vector[Tup] = {
        val sm = samples(v)
        sm.rows.lazyZip(
          if (sm.ids.size == sm.rows.size) sm.ids
          else Vector.tabulate(sm.rows.size)(_.toLong)).toVector.map {
          case (r, id) =>
            Tup(r.map { case (c, x) => (v, c) -> x }, Set(popOf(v) -> id))
        }
      }
      var cur = tuplesOf(first)
      val used = scala.collection.mutable.BitSet.empty
      var changed = true
      while (changed) {
        changed = false
        g.edges.zipWithIndex.foreach { case (e, idx) =>
          if (!used(idx) && (e.mask & s) == e.mask && cur.nonEmpty) {
            val aIn = (inSet & (1L << e.a)) != 0
            val bIn = (inSet & (1L << e.b)) != 0
            if (aIn && bIn) { // closing edge of a cycle: post-filter
              cur = cur.filter(t => e.conds.forall { case (ca, cb) =>
                val va = t.vals((e.a, ca)); val vb = t.vals((e.b, cb))
                va != null && va == vb
              })
              used += idx; changed = true
            } else if (aIn || bIn) { // grow the joined set by one relation
              val (next, curKey, nextCols) =
                if (aIn) (e.b, e.conds.map(c => (e.a, c._1)), e.conds.map(_._2))
                else (e.a, e.conds.map(c => (e.b, c._2)), e.conds.map(_._1))
              val index = tuplesOf(next)
                .filter(t => nextCols.forall(c => t.vals((next, c)) != null))
                .groupBy(t => nextCols.map(c => t.vals((next, c))))
              cur = cur.flatMap { t =>
                val key = curKey.map(t.vals(_))
                if (key.exists(_ == null)) Vector.empty
                else index.getOrElse(key, Vector.empty).map(o =>
                  Tup(t.vals ++ o.vals, t.rows ++ o.rows))
              }
              inSet |= 1L << next; used += idx; changed = true
            }
          }
        }
      }
      // Π over vertices of 1/p, deduplicated to distinct base rows:
      // within one population every vertex's p is identical (same
      // total, same cap ⇒ same threshold), so each distinct row
      // contributes that population's 1/p exactly once
      val popP = Array.tabulate(popNames.size) { pi =>
        (0 until g.n).find(v => popOf(v) == pi && ((s >> v) & 1L) == 1L)
          .map(samples(_).p).getOrElse(1.0)
      }
      val total = cur.iterator.map { t =>
        t.rows.iterator.map { case (pop, _) => 1.0 / popP(pop) }.product
      }.sum
      var sel = 1.0
      var rest2 = s
      while (rest2 != 0) {
        sel *= extraSel(java.lang.Long.numberOfTrailingZeros(rest2))
        rest2 &= rest2 - 1
      }
      math.max(total * sel, 1.0)
    }

    (s: Long) => memo.computeIfAbsent(s, estimate(_))
  }
}
