package graft.plans

/** Join graph over `n ≤ 63` base relations, vertex sets as Long bitmasks.
  *
  * Spark-first re-expression of the reference's central IR
  * (reference: QueryGraph.java:44-59 — vertices = join factors, edges =
  * equi-join predicates between factor sets; duplicate edges between the
  * same factor pair are merged, QueryGraph.java:153-165,281-294).
  *
  * Unlike the reference we keep the graph immutable; the "collapse a
  * join into a new vertex" mutation (QueryGraph.java:343-418) is modeled
  * by [[CollapsedGraph]] (used by the search that steps edge-by-edge and
  * by the RL environment).
  */
final case class JoinEdge(a: Int, b: Int, conds: Seq[(String, String)] = Nil) {
  require(a != b, "self-loop edge")
  def mask: Long = (1L << a) | (1L << b)
  def touches(s: Long): Boolean = (mask & s) != 0
  def crosses(l: Long, r: Long): Boolean =
    ((mask & l) != 0 && (mask & r) != 0)
}

final case class QueryGraph(relations: Vector[String], edges: Vector[JoinEdge]) {
  val n: Int = relations.size
  require(n <= 63, s"bitmask planner supports ≤63 relations, got $n")
  val full: Long = if (n == 63) -1L else (1L << n) - 1

  /** adjacency bitmask per vertex */
  val adj: Array[Long] = {
    val a = new Array[Long](n)
    edges.foreach { e => a(e.a) |= 1L << e.b; a(e.b) |= 1L << e.a }
    a
  }

  /** neighbors of a vertex set (excluding the set itself) */
  def neighbors(s: Long): Long = {
    var acc = 0L
    var rest = s
    while (rest != 0) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      acc |= adj(i)
      rest &= rest - 1
    }
    acc & ~s
  }

  def connected(s: Long): Boolean = {
    if (s == 0) return false
    val start = java.lang.Long.lowestOneBit(s)
    var seen = start
    var frontier = start
    while (frontier != 0) {
      val grow = neighbors(seen) & s
      frontier = grow & ~seen
      seen |= grow
    }
    seen == s
  }

  /** edges with one endpoint in each set */
  def crossEdges(l: Long, r: Long): Seq[JoinEdge] =
    edges.filter(e => e.crosses(l, r))

  def tableSet(s: Long): Seq[String] = {
    var rest = s
    val b = Seq.newBuilder[String]
    while (rest != 0) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      b += relations(i)
      rest &= rest - 1
    }
    b.result()
  }

  /** Reference cardinality-dictionary key: sorted, space-joined base
    * table names (reference: MyMetadataQuery.java:107-114). */
  def cardKey(s: Long): String = tableSet(s).sorted.mkString(" ")
}

/** A (bushy) join tree; `set` = bitmask of the base relations below. */
sealed trait JoinTree {
  def set: Long
  def describe(g: QueryGraph): String = this match {
    case Leaf(i)          => g.relations(i)
    // reference join-order string format, MyUtils.java:45-118
    case Node(l, r) => s"JOIN (${l.describe(g)} , ${r.describe(g)})"
  }
  def leaves: Vector[Int] = this match {
    case Leaf(i)    => Vector(i)
    case Node(l, r) => l.leaves ++ r.leaves
  }
}
final case class Leaf(i: Int) extends JoinTree { val set: Long = 1L << i }
final case class Node(l: JoinTree, r: JoinTree) extends JoinTree {
  val set: Long = l.set | r.set
}

object JoinTree {
  /** All internal join nodes, bottom-up. */
  def internalNodes(t: JoinTree): Vector[Node] = t match {
    case _: Leaf    => Vector.empty
    case n@Node(l, r) => internalNodes(l) ++ internalNodes(r) :+ n
  }
}
