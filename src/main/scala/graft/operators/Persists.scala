package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for persist() barriers taken inside operators.
  *
  * Signature columns that feed a self-join or banding explode need a
  * materialization barrier (CollapseProject otherwise inlines the
  * computation into every reference), but the operator that takes the
  * barrier can't release it — the returned DataFrame still reads it.
  * So barriers register here and the RUNNER releases them after the
  * result is consumed.
  *
  * Release is SCOPED per query: a runner wraps build+consume in
  * [[scoped]], and only the barriers taken inside that scope are
  * released on exit — two queries running concurrently (separate
  * threads) no longer unpersist each other's in-flight frames, which
  * the round-2 global-queue design did. Barriers taken outside any
  * scope land in a global queue drained by [[releaseAll]] (ad-hoc /
  * notebook use).
  */
object Persists {
  private val global = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val scopes =
    new ThreadLocal[List[java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]] {
      override def initialValue():
          List[java.util.concurrent.ConcurrentLinkedQueue[DataFrame]] = Nil
    }

  /** persist() + register with the innermost active scope on this thread
    * (or globally when none). */
  def barrier(df: DataFrame): DataFrame = {
    val p = df.persist()
    scopes.get() match {
      case head :: _ => head.add(p)
      case Nil       => global.add(p)
    }
    p
  }

  /** Run one query's build-AND-consume under a fresh barrier scope; every
    * barrier taken during `f` (on this thread) is unpersisted on exit.
    * `f` must consume the result (write/collect) before returning —
    * release happens immediately after. */
  def scoped[A](f: => A): A = scopedImpl(blocking = false)(f)

  /** [[scoped]] with a BLOCKING exit drain: returns only after the
    * executors actually dropped the barrier blocks. Benchmark runners
    * use this so one query's storage memory is genuinely free before
    * the next timing starts — the r10 bench's async drains let ~90
    * queries of lazily-freed barriers pile up in the shared storage
    * pool and inflated the barrier-dense graph kernels 13–17×
    * (g09i recorded 133.6 s vs 7.7 s standalone; VERDICT r10). The
    * drain cost must sit OUTSIDE the caller's timed region — time
    * inside `f`, not around the call. */
  def scopedBlocking[A](f: => A): A = scopedImpl(blocking = true)(f)

  private def scopedImpl[A](blocking: Boolean)(f: => A): A = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    scopes.set(q :: scopes.get())
    try f
    finally {
      scopes.set(scopes.get().tail)
      drain(q, blocking)
    }
  }

  /** Unpersist every UNSCOPED live barrier (non-blocking). */
  def releaseAll(): Unit = drain(global, blocking = false)

  private def drain(
      q: java.util.concurrent.ConcurrentLinkedQueue[DataFrame],
      blocking: Boolean): Unit = {
    var df = q.poll()
    while (df != null) {
      // A barrier can outlive its session (global-queue frames drained
      // by a later caller after the owning session stopped); unpersist
      // would NPE into the dead context, and the stop already freed
      // the blocks anyway.
      if (!df.sparkSession.sparkContext.isStopped)
        df.unpersist(blocking)
      df = q.poll()
    }
  }
}
