// probe: Tables.registerAll memoization must re-register when the same
// session switches sfDir (and skip when it doesn't)
package graft.tools

import org.apache.spark.sql.SparkSession

object SfSwitchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cnt(sf: String): Long = {
      graft.sources.Tables.registerAll(spark, s"/root/testdata/$sf")
      spark.sql("SELECT count(*) FROM lineitem").collect().head.getLong(0)
    }
    val seq = Seq("sf0.001", "sf0.01", "sf0.001", "sf0.001", "sf0.01")
    val counts = seq.map(cnt)
    println(s"counts: ${seq.zip(counts).mkString(", ")}")
    require(counts == Seq(6000L, 60000L, 6000L, 6000L, 60000L),
      "sfDir switch broke view registration")
    println("SF-SWITCH OK")
    spark.stop()
  }
}
