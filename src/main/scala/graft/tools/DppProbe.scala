package graft.tools
import org.apache.spark.sql.SparkSession
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.sources.SourceFormats.dppJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    println("=== executed ===")
    println(df.queryExecution.executedPlan.toString.take(4000))
    println("=== inputFiles fact ===")
    df.inputFiles.filter(_.contains("documents_by_lang_dpp")).foreach(println)
  }
}
