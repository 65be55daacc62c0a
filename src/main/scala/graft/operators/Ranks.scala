package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.row_number

/** Shared ranking tails. */
private[operators] object Ranks {

  /** Deterministic top-k with a 1-based `rk` column: sort+limit first
    * (plans as TakeOrderedAndProject — per-partition heads merged on
    * the driver side of the exchange, no global sort and no
    * corpus-wide window), THEN a rank window over just the k
    * survivors. `sort` must be a total order (include a tie-break
    * column) or ranks are nondeterministic. */
  def topKRanked(df: DataFrame, k: Int, sort: Column*): DataFrame = {
    val top = df.orderBy(sort: _*).limit(k)
    top.withColumn("rk", row_number().over(Window.orderBy(sort: _*)).cast("int"))
  }
}
