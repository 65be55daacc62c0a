package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for persist() barriers taken inside operators.
  *
  * Signature columns that feed a self-join or banding explode need a
  * materialization barrier (CollapseProject otherwise inlines the
  * computation into every reference), but the operator that takes the
  * barrier can't release it — the returned DataFrame still reads it.
  * So barriers register here and the HARNESS releases them after the
  * result is consumed (Verify and Bench call [[releaseAll]] per query;
  * long-lived sessions embedding these operators should do the same).
  */
object Persists {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** persist() + register for later release. */
  def barrier(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Unpersist every live barrier (non-blocking). Safe to call between
    * queries: barriers are only read while their query's result is being
    * computed. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }
}
