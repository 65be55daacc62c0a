package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Shared scaffold for streaming correctness-gate queries: run a
  * streaming DataFrame to completion with Trigger.AvailableNow into a
  * uniquely-named memory sink and return the completed sink. Fails
  * LOUDLY on timeout — stopping a half-finished batch and reading the
  * sink would masquerade as a data divergence in the oracle compare. */
object StreamRun {
  private val runs = new java.util.concurrent.atomic.AtomicInteger(0)

  def toCompletion(
      ds: DataFrame, namePrefix: String,
      outputMode: String = "append", timeoutMs: Long = 300000): DataFrame = {
    val name = s"${namePrefix}_${runs.incrementAndGet()}"
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(timeoutMs)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"$namePrefix streaming batch did not finish within ${timeoutMs / 1000}s")
    }
    q.stop()
    ds.sparkSession.table(name)
  }
}
