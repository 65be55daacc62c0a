package graft.plans

import scala.collection.immutable.BitSet

/** Global attribute registry: every column of every table mapped to a
  * stable global offset — the featurization space of the "DQ" one-hot
  * encoding (reference: DbInfo.java:19-73 `attrCount` /
  * `tableFeaturesOffsetMap` / `getDQFeatures`). */
final class AttributeRegistry(tables: Seq[(String, Seq[String])]) {
  private val offsets: Map[String, Int] = {
    var off = 0
    val b = Map.newBuilder[String, Int]
    tables.sortBy(_._1).foreach { case (t, cols) =>
      cols.foreach { c => b += s"$t.$c" -> off; off += 1 }
    }
    b.result()
  }
  val attrCount: Int = offsets.size

  def offset(table: String, column: String): Int = offsets(s"$table.$column")

  /** All attributes of a table, as a global-offset bitset. */
  def tableAttrs(table: String): BitSet =
    BitSet.fromSpecific(offsets.collect {
      case (k, v) if k.startsWith(table + ".") => v
    })
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
    registry: Option[AttributeRegistry] = None) {

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

  /** DQ featurization of the current state: per-factor one-hot bitset
    * over the global attribute space (reference: QueryGraph.java:306-332
    * mapToDBFeatures / getVisibleAttributes). */
  def stateFeatures: Vector[BitSet] = {
    val reg = registry.getOrElse(
      throw new IllegalStateException("no AttributeRegistry provided"))
    factors.map { f =>
      f.leaves.map(i => reg.tableAttrs(g.relations(i)))
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
      f.leaves.map(k => reg.tableAttrs(g.relations(k)))
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
