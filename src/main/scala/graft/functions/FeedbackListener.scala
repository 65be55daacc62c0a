package graft.functions

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Hands-free LEO feedback: a QueryExecutionListener that harvests
  * observed cardinalities from EVERY successfully executed query into
  * the [[graft.plans.ExecutionFeedback]] dictionary — the production
  * form of the reference's execute→record-true-cards→re-plan loop
  * (QueryOptExperiment.java:589-614 records runtimes/cardinalities for
  * every executed plan as a side effect of running it; pg.json →
  * MyMetadataQuery.java:81-162 serves them back). With the listener,
  * `stats=feedback` planning self-populates from arbitrary user SQL:
  * no harness, no explicit harvest call.
  *
  * Gated at runtime by `spark.graft.feedback.auto` (default false) so
  * registration is unconditional and cheap while harvesting is a
  * per-session opt-in; `spark.graft.feedback.path`, when set, persists
  * the dictionary on application end (the durable pg.json analog).
  *
  * Scale shape: onSuccess runs on the listener thread and reads
  * driver-aggregated SQL metrics off the already-executed plan — zero
  * extra cluster work, zero query-path latency (the 25 ms harvest cost
  * measured in FeedbackProbe moves OFF the caller's thread entirely).
  */
final class FeedbackListener(session: SparkSession)
    extends QueryExecutionListener {

  override def onSuccess(
      funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    if (FeedbackListener.enabled(session)) {
      // observability must never fail (or slow) a query
      try graft.plans.ExecutionFeedback.harvestPlan(qe.executedPlan)
      catch { case scala.util.control.NonFatal(_) => }
      // completion signal AFTER the harvest lands — one tick per
      // processed callback, even when the plan yielded zero
      // observations, so waiters never stall to the deadline on an
      // unharvestable plan and never return early on another query's
      // stray observation (ADVICE r14: the old wait polled the GLOBAL
      // dictionary size)
      FeedbackListener.harvests.incrementAndGet()
    }

  override def onFailure(
      funcName: String, qe: QueryExecution, exception: Exception): Unit =
    // no harvest from a failed plan, but the callback still TICKS:
    // a waiter whose query failed gets its completion signal instead
    // of stalling to the full deadline (ADVICE r15)
    if (FeedbackListener.enabled(session))
      FeedbackListener.harvests.incrementAndGet()
}

object FeedbackListener {

  // weak keys: sessions must stay collectable (test suites create
  // hundreds); Boolean values are just set-membership
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private[functions] def enabled(session: SparkSession): Boolean =
    try session.conf.get("spark.graft.feedback.auto", "false").toBoolean
    catch { case scala.util.control.NonFatal(_) => false }

  /** Idempotent per-session registration — called from the
    * [[GraftExtensions]] rule builder, which Spark invokes once per
    * session when the optimizer is first built. */
  def ensureRegistered(session: SparkSession): Unit =
    registered.synchronized {
      if (registered.add(session)) {
        // the durable half of the loop: a configured path PRE-POPULATES
        // the dictionary at registration (the reference's Python client
        // loads pg.json between runs, MyMetadataQuery.java:81-96); live
        // observations win over the stale file by load()'s contract
        try {
          val path = session.conf.get("spark.graft.feedback.path", "")
          if (path.nonEmpty && java.nio.file.Files.exists(
              java.nio.file.Paths.get(path)))
            graft.plans.ExecutionFeedback.load(path)
        } catch { case scala.util.control.NonFatal(_) => }
        session.listenerManager.register(new FeedbackListener(session))
        session.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(
              end: SparkListenerApplicationEnd): Unit =
            try {
              val path = session.conf.get("spark.graft.feedback.path", "")
              if (path.nonEmpty) graft.plans.ExecutionFeedback.save(path)
            } catch { case scala.util.control.NonFatal(_) => }
        })
      }
    }

  private[functions] val harvests =
    new java.util.concurrent.atomic.AtomicLong()

  /** Completed harvest callbacks since JVM start — the per-harvest
    * completion signal [[awaitHarvests]] waits on. */
  def harvestCount: Long = harvests.get

  /** Listener delivery is asynchronous (ExecutionListenerManager is
    * fed from the shared listener bus): wait until at least one MORE
    * harvest callback has completed than `before` (captured via
    * [[harvestCount]] before running the query) or the deadline
    * passes. Counts CALLBACKS, not dictionary entries — a plan that
    * yields zero observations still completes the wait, and another
    * query's stray OBSERVATION cannot satisfy it spuriously
    * (ADVICE r14). SERIAL-USE ASSUMPTION (ADVICE r15): the counter is
    * global, so a late-arriving CALLBACK from an earlier action still
    * in flight on the async listener bus can tick it early — callers
    * must capture `before` via [[harvestCount]] immediately before
    * the action and run waited-on queries serially per session (every
    * in-tree caller does; concurrent sessions wanting exact
    * attribution should key off dictionary contents instead). Failed
    * queries tick too (onFailure), so they complete the wait rather
    * than stalling to the deadline. Returns the current count. */
  def awaitHarvests(before: Long, deadlineMs: Long = 30000): Long = {
    val end = System.nanoTime + deadlineMs * 1000000L
    while (harvests.get <= before && System.nanoTime < end) Thread.sleep(20)
    harvests.get
  }
}
