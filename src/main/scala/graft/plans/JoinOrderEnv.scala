package graft.plans

import scala.collection.immutable.BitSet

/** Global attribute registry: every column of every table mapped to a
  * stable global offset — the featurization space of the "DQ" one-hot
  * encoding (reference: DbInfo.java:19-73 `attrCount` /
  * `tableFeaturesOffsetMap` / `getDQFeatures`).
  *
  * `selBuckets > 0` appends, per base table, that many SELECTIVITY
  * BUCKET slots after the schema attributes. DQ proper scales a
  * filtered attribute's one-hot entry by the predicate's selectivity
  * (arXiv:1808.03196 §4.1); this is the discretized variant of the
  * same signal that stays inside the BitSet feature space — an env
  * given `selOf` sets the bucket bit matching each leaf's filtered
  * fraction, so a policy can learn "join the heavily-filtered table
  * early" in a way that TRANSFERS across queries. Default 0: features
  * are byte-identical to the historical encoding. */
final class AttributeRegistry(tables: Seq[(String, Seq[String])],
    val selBuckets: Int = 0) {
  private val offsets: Map[String, Int] = {
    var off = 0
    val b = Map.newBuilder[String, Int]
    tables.sortBy(_._1).foreach { case (t, cols) =>
      cols.foreach { c => b += s"$t.$c" -> off; off += 1 }
    }
    b.result()
  }
  private val bucketBase: Map[String, Int] = {
    var off = offsets.size
    tables.map(_._1).sorted.map { t =>
      val e = t -> off; off += selBuckets; e
    }.toMap
  }
  val attrCount: Int = offsets.size + bucketBase.size * selBuckets

  /** Offset of base table `table`'s selectivity-bucket slot `bucket`. */
  def selBucketOffset(table: String, bucket: Int): Int = {
    require(bucket >= 0 && bucket < selBuckets, s"bucket $bucket")
    bucketBase(AliasedRels.baseOf(table)) + bucket
  }

  def offset(table: String, column: String): Int =
    offsets(s"${AliasedRels.baseOf(table)}.$column")

  /** All attributes of a table, as a global-offset bitset. An ALIASED
    * relation ("orders@2") resolves to its base table's attributes —
    * DQ features are SCHEMA attributes, and an alias has the same
    * schema; sharing the features is what lets a policy trained on
    * one query transfer to another that repeats the table. */
  def tableAttrs(table: String): BitSet = {
    val base = AliasedRels.baseOf(table)
    BitSet.fromSpecific(offsets.collect {
      case (k, v) if k.startsWith(base + ".") => v
    })
  }
}

object AttributeRegistry {
  /** Registry over the driver testdata schema (the engine analog of the
    * reference's JDBC metadata walk at startup, DbInfo.init). */
  def fromSpark(spark: org.apache.spark.sql.SparkSession, sfDir: String): AttributeRegistry =
    new AttributeRegistry(graft.sources.Tables.names.map { t =>
      t -> graft.sources.Tables.load(spark, sfDir, t).schema.fieldNames.toSeq
    })
}

/** In-process RL environment for join ordering — the reference's ZMQ
  * request/response vocabulary as a plain Scala API (reference:
  * ZeroMQServer.java:101-269 commands reset/step/getReward/isDone/
  * getActions/getQueryGraph; episode loop RLJoinOrderRule.java:87-181).
  * No sockets: a learned policy (or any scripted agent) drives it
  * directly; a ZMQ/Py4J shim can wrap this trait without touching the
  * engine.
  *
  * State = the current factor set of the collapsing query graph (the
  * reference's QueryGraph.updateGraph semantics, QueryGraph.java:343-418:
  * joining two factors produces a new factor; edges between the same
  * factor pair merge). Action = ordinal into the current merged edge
  * list. Reward = −cost of the join just made (RLJoinOrderRule.java:131
  * `zmq.lastReward = -cost`).
  */
final class JoinOrderEnv(
    g: QueryGraph,
    card: Cardinality,
    cm: CostModel,
    registry: Option[AttributeRegistry] = None,
    selOf: Option[Int => Double] = None) {

  private var factors: Vector[JoinTree] = _
  private var lastReward: Double = 0.0
  private var episodeCost: Double = 0.0
  reset()

  def reset(): Unit = {
    factors = Vector.tabulate(g.n)(Leaf(_))
    lastReward = 0.0
    episodeCost = 0.0
  }

  /** Merged edges between current factors: distinct factor pairs that
    * have ≥1 query-graph edge across them (duplicate edges merged, as in
    * reference QueryGraph.java:153-165,281-294). */
  def actions: Vector[(Int, Int)] =
    (for {
      i <- factors.indices; j <- factors.indices
      if i < j && g.crossEdges(factors(i).set, factors(j).set).nonEmpty
    } yield (i, j)).toVector

  def isDone: Boolean = factors.size == 1

  def reward: Double = lastReward

  def totalCost: Double = episodeCost

  /** Cost of taking action `a` now, without stepping (what a 1-step
    * lookahead policy — or the reward the agent would get — sees). */
  def previewCost(a: Int): Double = {
    val (i, j) = actions(a)
    cm.joinCost(factors(i), factors(j), card)
  }

  /** Apply action `a` (ordinal into [[actions]]); returns the reward. */
  def step(a: Int): Double = {
    require(!isDone, "episode finished")
    val (i, j) = actions(a)
    val l = factors(i); val r = factors(j)
    val cost = cm.joinCost(l, r, card)
    factors = factors.zipWithIndex
      .collect { case (f, k) if k != i && k != j => f } :+ Node(l, r)
    episodeCost += cost
    lastReward = -cost
    lastReward
  }

  /** Final join tree (only when done) — what RLJoinOrderRule.transformTo
    * emits at episode end (:139-143). */
  def finalTree: JoinTree = {
    require(isDone, "episode not finished")
    factors.head
  }

  /** Size of the global one-hot attribute space (reference:
    * DbInfo.attrCount served over the wire, ZeroMQServer.java:181-189). */
  def attrCount: Int = registry.getOrElse(
    throw new IllegalStateException("no AttributeRegistry provided")).attrCount

  /** Per-leaf feature bitset: the base table's schema attributes, plus
    * (when the registry allocates buckets and `selOf` is given) the
    * leaf's selectivity-bucket bit — bucket b covers filtered fractions
    * in (10^-(b+1)·5, 10^-b·5]; an unfiltered leaf (sel ≥ 0.5) sets no
    * bucket bit, keeping the historical encoding as the zero case. */
  private def leafFeatures(reg: AttributeRegistry, i: Int): BitSet = {
    val attrs = reg.tableAttrs(g.relations(i))
    (selOf, reg.selBuckets) match {
      case (Some(sf), nb) if nb > 0 =>
        val sel = math.max(sf(i), 1e-300)
        val bucket = math.floor(math.log10(0.5 / sel)).toInt
        if (bucket < 0) attrs
        else attrs + reg.selBucketOffset(g.relations(i), math.min(bucket, nb - 1))
      case _ => attrs
    }
  }

  /** DQ featurization of the current state: per-factor one-hot bitset
    * over the global attribute space (reference: QueryGraph.java:306-332
    * mapToDBFeatures / getVisibleAttributes). */
  def stateFeatures: Vector[BitSet] = {
    val reg = registry.getOrElse(
      throw new IllegalStateException("no AttributeRegistry provided"))
    factors.map { f =>
      f.leaves.map(i => leafFeatures(reg, i))
        .foldLeft(BitSet.empty)(_ | _)
    }
  }

  /** Featurization of one action: (left attrs, right attrs) one-hots —
    * the pair a DQ-style Q-network scores. */
  def actionFeatures(a: Int): (BitSet, BitSet) = {
    val reg = registry.getOrElse(
      throw new IllegalStateException("no AttributeRegistry provided"))
    val (i, j) = actions(a)
    def attrs(f: JoinTree) =
      f.leaves.map(k => leafFeatures(reg, k))
        .foldLeft(BitSet.empty)(_ | _)
    (attrs(factors(i)), attrs(factors(j)))
  }
}

object JoinOrderEnv {
  /** Greedy-by-reward rollout — the trivial 1-step-lookahead policy;
    * exercises the full env API and serves as the baseline agent. */
  def greedyRollout(env: JoinOrderEnv): Double = {
    env.reset()
    while (!env.isDone) {
      val best = env.actions.indices.minBy(env.previewCost)
      env.step(best)
    }
    env.totalCost
  }

  /** Seeded random rollout (the reference RL rule's `reset` behavior,
    * RLJoinOrderRule.java:167-170). */
  def randomRollout(env: JoinOrderEnv, seed: Long): Double = {
    val rnd = new scala.util.Random(seed)
    env.reset()
    while (!env.isDone) env.step(rnd.nextInt(env.actions.size))
    env.totalCost
  }
}
