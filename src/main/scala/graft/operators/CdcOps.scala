package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Change-data-capture MERGE: apply a sequenced changeset of
  * insert/update/delete operations to a base snapshot, last writer (=
  * highest sequence number) wins per key — the Debezium/Delta-`MERGE
  * INTO` shape, and THE operation a 100 TB table lives by: the nightly
  * snapshot is never rewritten from scratch, deltas are folded in.
  *
  * The reference has no mutation surface at all (its tables are a
  * read-only Postgres mount, pg-schema.json:1-16); this is an engine
  * addition in the same beyond-parity category as the curation ops.
  *
  * Scale shape: the changeset is collapsed to one row per key by a
  * map-side-combinable `max_by` aggregation (one shuffle of the DELTA,
  * never the base), and the base is touched by a single left-anti
  * join — the 100 TB snapshot is scanned once, shuffled never. The
  * anti join carries an explicit broadcast hint by default (the
  * ingest-delta shape: deltas are small by nature); for a delta too
  * big to broadcast, pass `broadcastDelta = false` and the join
  * degrades to a key-partitioned anti join — co-located for free when
  * the snapshot is bucketed by key (q57's layout). The hint is
  * caller-controlled because Spark honors an explicit broadcast()
  * regardless of size thresholds: defaulting it on and LETTING it be
  * turned off is the honest version of "degrades".
  */
object CdcOps {

  /** Deterministic sequenced changeset derived from `orders` itself,
    * as ONE engine-neutral SQL string shared verbatim by the Spark
    * operator and the DuckDB oracle (the c05 fixture pattern — the
    * corpus has no real change feed, and deriving one from the table
    * keeps both engines byte-identical).
    *
    * Three op families, exercising every merge path:
    *  - seq 1 'U': keys %5=0, price restated ×1.1;
    *  - seq 1 'I': fresh keys for source rows %9=0, at half price —
    *    minted as NEGATIVE keys (−(src+1)), disjoint from the base key
    *    space at EVERY scale factor (a fixed offset would collide with
    *    real keys once the table outgrows it, silently breaking the
    *    uniqueness contract below — the q76 SF-independence rule);
    *  - seq 2 'D'/'U': deletes at %10=0, a SECOND update ×1.2 at %15=0
    *    (CASE gives %30=0 rows the delete) — every seq-2 key also has a
    *    seq-1 row, so last-writer-wins is actually load-bearing.
    *
    * Price restatements are computed on an exact integer CENT grid
    * (half-up in integer arithmetic via floor((cents·n + 5) / 10)) —
    * `round(price * 1.1, 2)` on doubles lands on the `.xx5` decimal
    * tie whenever the engines' rounding disagrees (Spark rounds the
    * shortest decimal repr half-up, DuckDB rounds the binary value),
    * and ÷2 of an odd-cent price hits that tie EVERY time. Money math
    * belongs on the cent grid; that it is also float-tie-free across
    * engines is the gate-visible consequence.
    *
    * (key, seq) is unique by construction — required for the
    * row_number/max_by forms to agree; CdcOpsSpec asserts it. */
  private val cents = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
  val changesetSql: String =
    s"""SELECT o_orderkey AS key, 1 AS seq, 'U' AS op,
              o_custkey AS custkey, o_orderstatus AS status,
              CAST(floor(($cents * 11 + 5) / 10.0) / 100.0 AS DOUBLE) AS price
       FROM orders WHERE o_orderkey % 5 = 0
       UNION ALL
       SELECT -(o_orderkey + 1) AS key, 1 AS seq, 'I' AS op,
              o_custkey AS custkey, 'N' AS status,
              CAST(floor(($cents + 1) / 2.0) / 100.0 AS DOUBLE) AS price
       FROM orders WHERE o_orderkey % 9 = 0
       UNION ALL
       SELECT o_orderkey AS key, 2 AS seq,
              CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
              o_custkey AS custkey, o_orderstatus AS status,
              CAST(floor(($cents * 12 + 5) / 10.0) / 100.0 AS DOUBLE) AS price
       FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 15 = 0"""

  def changeset(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(changesetSql)
  }

  /** Collapse a (key, seq, op, payload…) changeset to its final state
    * per key. `max_by` over seq is a declarative aggregate — partial
    * (map-side) combine applies, so hot keys with deep histories fold
    * locally before the delta's one shuffle. Requires seq unique per
    * key (ties would be nondeterministic — same contract as the
    * oracle's `ORDER BY seq DESC` row_number). */
  def latestPerKey(changes: DataFrame): DataFrame = {
    val payload = changes.columns.filter(c => c != "key" && c != "seq")
    changes
      .groupBy(col("key"))
      .agg(max_by(struct(payload.map(col).toIndexedSeq: _*), col("seq"))
        .as("p"))
      .select(col("key") +: payload.map(c => col(s"p.$c").as(c)): _*)
  }

  /** MERGE: base rows whose key is untouched pass through; touched keys
    * are replaced by their final changeset state unless that state is a
    * delete. An 'U' on a key absent from the base inserts (upsert
    * semantics) — so 'I' and 'U' need no distinction at apply time, the
    * op column only matters for 'D'. */
  def merge(base: DataFrame, changes: DataFrame, baseKey: String,
      colMap: Seq[(String, String)], broadcastDelta: Boolean = true): DataFrame =
    applyLatest(base, latestPerKey(changes), baseKey, colMap, broadcastDelta)

  /** The publish half of the merge, over an ALREADY-collapsed
    * latest-state frame — shared by the batch merge and the streaming
    * CDC materialization (q75), whose state store hands it exactly
    * this frame. */
  def applyLatest(base: DataFrame, latest: DataFrame, baseKey: String,
      colMap: Seq[(String, String)],
      broadcastDelta: Boolean = true): DataFrame = {
    // latest feeds two consumers (anti-join keys + surviving states);
    // the barrier stops each from re-deriving the whole delta fold
    val l = Persists.barrier(latest)
    val keys = l.select("key")
    val untouched = base
      .select(baseKey, colMap.map(_._2).filter(_ != baseKey): _*)
      .join(if (broadcastDelta) broadcast(keys) else keys,
        col(baseKey) === col("key"), "left_anti")
    val applied = l.filter(col("op") =!= "D")
      .select(col("key").as(baseKey) +:
        colMap.collect { case (c, b) if b != baseKey => col(c).as(b) }: _*)
    untouched.unionByName(applied)
  }

  /** q74: the orders snapshot after the [[changesetSql]] delta. */
  def mergeOrders(spark: SparkSession, sfDir: String): DataFrame =
    merge(
      Tables.load(spark, sfDir, "orders"),
      changeset(spark, sfDir),
      baseKey = "o_orderkey",
      colMap = Seq("custkey" -> "o_custkey", "status" -> "o_orderstatus",
        "price" -> "o_totalprice"))

  /** q88: [[mergeOrders]]'s DEGRADED path proven exchange-free on the
    * base — `broadcastDelta = false` against the KEY-BUCKETED snapshot
    * (q57's layout, reused verbatim: same catalog table). The anti
    * join plans as a sort-merge LEFT ANTI whose base side reads the
    * bucket files' hash assignment directly — the 100 TB snapshot is
    * scanned once and NEVER shuffled even when the delta is too big to
    * broadcast; only the (small) delta side pays an exchange into the
    * bucket partitioning. CdcMergeBucketedSpec asserts the plan
    * property (zero shuffles under the anti join's base side, bucketed
    * scan on); the gate holds the result to q74's oracle VERBATIM —
    * layout and join strategy may never change the answer. */
  def mergeOrdersBucketed(spark: SparkSession, sfDir: String): DataFrame =
    merge(
      spark.table(graft.sources.Bucketing.writeBucketed(
        spark, sfDir, "orders", "o_orderkey", "g_orders_b")),
      changeset(spark, sfDir),
      baseKey = "o_orderkey",
      colMap = Seq("custkey" -> "o_custkey", "status" -> "o_orderstatus",
        "price" -> "o_totalprice"),
      broadcastDelta = false)

  /** q77: INCREMENTAL view maintenance — refresh `orders-by-status
    * (count, revenue)` under the [[changesetSql]] delta WITHOUT
    * touching the merged snapshot: every change row contributes signed
    * deltas (−old for updates/deletes on existing keys, +new for
    * upserts/inserts), folded into the stored view by one
    * group-sized aggregation. This is the differential-dataflow /
    * materialized-view-refresh shape: at 100 TB the nightly view
    * refresh costs O(delta + groups), not a snapshot re-scan.
    *
    * The old values for touched keys come from one broadcast join of
    * the delta UNDER the base scan that maintains the view anyway (a
    * production refresh reads them from the previous snapshot's
    * key-bucketed files — q57's layout — or a key-value lookaside).
    * `viewOf` stands for the STORED view artifact; the oracle
    * recomputes the view directly over the merged snapshot, so the
    * gate asserts increment ≡ recompute. */
  def incrementalView(spark: SparkSession, sfDir: String,
      broadcastDelta: Boolean = true): DataFrame = {
    val base = Tables.load(spark, sfDir, "orders")
    val stored = base.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
    // two consumers (minus keys + plus states) — barrier as in applyLatest
    val latest = Persists.barrier(latestPerKey(changeset(spark, sfDir)))
    // −(old state) for every touched key that exists in the base:
    // an update moves its row across groups, a delete removes it
    val minus = base
      .select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      .join(locally { val k = latest.select("key")
        if (broadcastDelta) broadcast(k) else k }, Seq("key"))
      .select(col("status"), lit(-1L).as("dn"), (-col("price")).as("drev"))
    // +(new state) for every non-delete final state
    val plus = latest.filter(col("op") =!= "D")
      .select(col("status"), lit(1L).as("dn"), col("price").as("drev"))
    stored.select(col("status"), col("n").as("dn"), col("rev").as("drev"))
      .unionByName(minus).unionByName(plus)
      .groupBy("status")
      .agg(sum("dn").as("orders"), round(sum("drev"), 2).as("revenue"))
      .filter(col("orders") > 0)
  }

  /** Snapshot DIFF — derive the change feed FROM two snapshots: the
    * inverse of [[merge]], and how CDC is bootstrapped when the
    * upstream emits full snapshots instead of deltas (the downstream
    * incremental consumers — q77's view refresh, d12's ingest dedup —
    * need deltas either way). One full-outer join on the key
    * classifies every row: right-only → 'I', left-only → 'D', both
    * sides differing on any payload column → 'U'; identical rows drop
    * out. Null-safe comparisons (`<=>`), so NULL payloads diff
    * correctly.
    *
    * Scale shape: the one shuffle is the key-partitioned full-outer
    * join of the two snapshots — unavoidable for a diff, and FREE of
    * exchanges when both snapshots live key-bucketed (q57's layout),
    * which is exactly how consecutive snapshots of the same table are
    * stored. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    val o = oldSnap.select((key +: payload).map(col): _*)
      .toDF((key +: payload).map("old_" + _): _*)
    val n = newSnap.select((key +: payload).map(col): _*)
      .toDF((key +: payload).map("new_" + _): _*)
    val changed = payload
      .map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduce(_ || _)
    o.join(n, col(s"old_$key") === col(s"new_$key"), "full_outer")
      .filter(col(s"old_$key").isNull || col(s"new_$key").isNull || changed)
      .select(
        coalesce(col(s"new_$key"), col(s"old_$key")).as("key") +:
          when(col(s"old_$key").isNull, "I")
            .when(col(s"new_$key").isNull, "D")
            .otherwise("U").as("change_type") +:
          payload.map(c => col("new_" + c).as(c)): _*)
  }

  /** q79: the diff orders → q74-merged must reproduce the changeset's
    * EFFECTIVE changes (no-op updates excluded — a diff can only see
    * state, not intent). */
  def diffOrders(spark: SparkSession, sfDir: String): DataFrame =
    snapshotDiff(
      Tables.load(spark, sfDir, "orders"),
      mergeOrders(spark, sfDir),
      key = "o_orderkey",
      payload = Seq("o_custkey", "o_orderstatus", "o_totalprice"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_cdc_merge" -> (mergeOrders _),
    "q77_incremental_view" ->
      ((s: SparkSession, d: String) => incrementalView(s, d)),
    "q79_snapshot_diff" -> (diffOrders _),
    "q88_cdc_merge_bucketed" -> (mergeOrdersBucketed _)
  )

  /** The oracle replays the same merge in plain SQL: row_number picks
    * the last writer, NOT IN drops touched keys from the base, UNION
    * ALL appends the surviving final states. */
  def oracleSql: Map[String, String] = Map(
    "q74_cdc_merge" ->
      s"""WITH ch AS ($changesetSql),
          latest AS (
            SELECT key, op, custkey, status, price FROM (
              SELECT ch.*, row_number() OVER (
                       PARTITION BY key ORDER BY seq DESC) AS rn
              FROM ch) WHERE rn = 1)
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey NOT IN (SELECT key FROM latest)
          UNION ALL
          SELECT key AS o_orderkey, custkey AS o_custkey,
                 status AS o_orderstatus, price AS o_totalprice
          FROM latest WHERE op <> 'D'""",
    // q88 reads the bucketed COPY of orders and must land on the same
    // bytes — layout may never change the answer, so q74's oracle is
    // reused verbatim
    "q88_cdc_merge_bucketed" ->
      s"""WITH ch AS ($changesetSql),
          latest AS (
            SELECT key, op, custkey, status, price FROM (
              SELECT ch.*, row_number() OVER (
                       PARTITION BY key ORDER BY seq DESC) AS rn
              FROM ch) WHERE rn = 1)
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey NOT IN (SELECT key FROM latest)
          UNION ALL
          SELECT key AS o_orderkey, custkey AS o_custkey,
                 status AS o_orderstatus, price AS o_totalprice
          FROM latest WHERE op <> 'D'""",
    // increment ≡ recompute: the oracle aggregates the merged snapshot
    // directly — the one thing the incremental path never builds
    "q77_incremental_view" ->
      s"""WITH ch AS ($changesetSql),
          latest AS (
            SELECT key, op, custkey, status, price FROM (
              SELECT ch.*, row_number() OVER (
                       PARTITION BY key ORDER BY seq DESC) AS rn
              FROM ch) WHERE rn = 1),
          merged AS (
            SELECT o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey NOT IN (SELECT key FROM latest)
            UNION ALL
            SELECT status AS o_orderstatus, price AS o_totalprice
            FROM latest WHERE op <> 'D')
          SELECT o_orderstatus AS status, count(*) AS orders,
                 round(sum(o_totalprice), 2) AS revenue
          FROM merged GROUP BY o_orderstatus""",
    // the same diff as a full-outer join in plain SQL; IS DISTINCT
    // FROM = Spark's <=> negated
    "q79_snapshot_diff" ->
      s"""WITH ch AS ($changesetSql),
          latest AS (
            SELECT key, op, custkey, status, price FROM (
              SELECT ch.*, row_number() OVER (
                       PARTITION BY key ORDER BY seq DESC) AS rn
              FROM ch) WHERE rn = 1),
          merged AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey NOT IN (SELECT key FROM latest)
            UNION ALL
            SELECT key, custkey, status, price
            FROM latest WHERE op <> 'D')
          SELECT COALESCE(m.o_orderkey, o.o_orderkey) AS key,
                 CASE WHEN o.o_orderkey IS NULL THEN 'I'
                      WHEN m.o_orderkey IS NULL THEN 'D'
                      ELSE 'U' END AS change_type,
                 m.o_custkey, m.o_orderstatus, m.o_totalprice
          FROM orders o FULL OUTER JOIN merged m
            ON o.o_orderkey = m.o_orderkey
          WHERE o.o_orderkey IS NULL OR m.o_orderkey IS NULL
             OR o.o_custkey IS DISTINCT FROM m.o_custkey
             OR o.o_orderstatus IS DISTINCT FROM m.o_orderstatus
             OR o.o_totalprice IS DISTINCT FROM m.o_totalprice"""
  )
}
