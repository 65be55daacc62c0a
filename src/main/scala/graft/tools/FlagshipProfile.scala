// scratch: where does flagship time go at sf0.1?
package graft.tools

import org.apache.spark.sql.SparkSession

object FlagshipProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    time("warmup count")(spark.read.parquet(s"$sfDir/lineitem.parquet").count())
    time("registerAll x1")(graft.sources.Tables.registerAll(spark, sfDir))
    time("registerAll x2")(graft.sources.Tables.registerAll(spark, sfDir))
    val sql = graft.operators.RelationalQueries.sharedSql("q03_flagship")
    time("flagship sql only")(
      spark.sql(sql).write.format("noop").mode("overwrite").save())
    time("flagship sql again")(
      spark.sql(sql).write.format("noop").mode("overwrite").save())
    time("full query fn (incl registerAll)")(
      graft.operators.RelationalQueries.queries("q03_flagship")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
