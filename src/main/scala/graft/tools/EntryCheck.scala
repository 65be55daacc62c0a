// driver t1 smoke replica: SparkEntry.entry must return rows > 0
package graft.tools

import org.apache.spark.sql.SparkSession

object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"entry rows=${rows.length} first=${rows.headOption}")
    require(rows.nonEmpty, "entry returned no rows")
    println("ENTRY OK")
    spark.stop()
  }
}
