package graft.plans

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Cross-run planning-result memoization — the reference serializes its
  * optimized plans to `./allOptParCosts.ser` and reloads them on
  * restart (reference: QueryOptExperiment.java:447-448,503). Spark-first
  * form: a line-oriented text file keyed by (query, planner, cost
  * model, cardinality oracle), guarded by a CORPUS FINGERPRINT on the
  * first line — the caller fingerprints whatever planning depends on
  * (graph shapes, injected cardinality dictionary, base row counts);
  * any mismatch drops the whole file. Plans are cheap to rebuild, so
  * staleness handling is all-or-nothing rather than per-entry.
  *
  * A hit returns a [[PlannedOrder]] with `planningNanos = 0` — the
  * honest marker that no search ran (the reference's reloaded plans
  * likewise skip `planner.transform`).
  */
object PlanCache {

  /** `Leaf(i)` → "i"; `Node(l, r)` → "(l r)". */
  def treeToString(t: JoinTree): String = t match {
    case Leaf(i)    => i.toString
    case Node(l, r) => s"(${treeToString(l)} ${treeToString(r)})"
  }

  def parseTree(s: String): JoinTree = {
    // recursive descent over the two-token grammar above
    var pos = 0
    def parse(): JoinTree = {
      if (s.charAt(pos) == '(') {
        pos += 1 // '('
        val l = parse()
        pos += 1 // ' '
        val r = parse()
        pos += 1 // ')'
        Node(l, r)
      } else {
        val start = pos
        while (pos < s.length && s.charAt(pos).isDigit) pos += 1
        Leaf(s.substring(start, pos).toInt)
      }
    }
    val t = parse()
    require(pos == s.length, s"trailing garbage parsing join tree '$s'")
    t
  }

  /** Bump when PLANNER OR COST-MODEL INTERNALS change semantics: the
    * corpus fingerprint the caller supplies covers the inputs planning
    * reads, not the code that does the planning — stored trees and
    * costs go stale when an enumerator or a cost constant changes even
    * though every name matches (the same hazard the reference's
    * allOptParCosts.ser has). The version is folded into the effective
    * fingerprint so one bump invalidates every cache file. */
  val FormatVersion = 1

  private def key(q: String, planner: String, cm: String, card: String) = {
    // keys are space-joined and lines tab-joined: a name with
    // whitespace would corrupt the file long after planning finished
    Seq(q, planner, cm, card).foreach(n =>
      require(!n.exists(_.isWhitespace), s"plan-cache name '$n' has whitespace"))
    s"$q $planner $cm $card"
  }

  /** One cache file bound to one fingerprint. Concurrent `put`s are safe
    * (Experiment.run plans on a thread pool); `save` is called once by
    * the driver after the run. */
  final class Store(path: Path, corpusFingerprint: String) {
    private val fingerprint = s"v$FormatVersion:$corpusFingerprint"
    private val entries =
      new java.util.concurrent.ConcurrentHashMap[String, PlannedOrder]()
    private val hitCount = new java.util.concurrent.atomic.AtomicLong
    private val missCount = new java.util.concurrent.atomic.AtomicLong

    // load: only a file whose fingerprint line matches feeds the map
    if (Files.exists(path)) {
      val lines = Files.readAllLines(path).asScala
      if (lines.headOption.contains(fingerprint)) {
        lines.drop(1).foreach { line =>
          val f = line.split('\t')
          require(f.length == 7, s"malformed plan-cache line: $line")
          val per =
            if (f(5).isEmpty) Vector.empty[Double]
            else f(5).split(',').map(_.toDouble).toVector
          entries.put(key(f(0), f(1), f(2), f(3)),
            PlannedOrder(f(1), parseTree(f(6)), f(4).toDouble, per, 0L))
        }
      }
    }

    def loadedEntries: Int = entries.size()
    def hits: Long = hitCount.get()
    def misses: Long = missCount.get()

    /** The memoized plan, or `search` (recorded for the next save). The
      * `card` tag separates true-cardinality plans from estimate plans
      * (the regret experiment plans the same (query, planner, model)
      * under both oracles). */
    def plan(
        q: String, planner: String, cm: String, card: String)(
        search: => PlannedOrder): PlannedOrder = {
      val k = key(q, planner, cm, card)
      val cached = entries.get(k)
      // EVERY hit — file-loaded or intra-run (the regret pass reusing
      // the run pass's plans) — returns planningNanos = 0: no search
      // ran for this call, so reporting the original search's time
      // would double-count it
      if (cached != null) {
        hitCount.incrementAndGet(); cached.copy(planningNanos = 0L)
      }
      else {
        val pl = search
        missCount.incrementAndGet()
        entries.put(k, pl)
        pl
      }
    }

    def save(): Unit = {
      val body = entries.asScala.toSeq.sortBy(_._1).map { case (k, pl) =>
        val Array(q, p, cm, card) = k.split(' ')
        Seq(q, p, cm, card, pl.cost.toString,
          pl.perJoinCosts.mkString(","), treeToString(pl.tree))
          .mkString("\t")
      }
      Files.createDirectories(path.toAbsolutePath.getParent)
      Files.writeString(path, (fingerprint +: body).mkString("\n"))
    }
  }
}
