package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DppProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val factDir = "target/tmp/formats/documents_by_lang_dpp_root_testdata_sf0_001"
    val dimDir = "target/tmp/formats/lang_dim_root_testdata_sf0_001"

    def shape(s: SparkSession, tag: String): Unit = {
      println(s"--- $tag useStats=" +
        s.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats") +
        " ratio=" +
        s.conf.get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"))
      val fact = s.read.parquet(factDir)
      val dim = s.read.parquet(dimDir).filter(col("keep")).select("lang")
      val df = fact.join(dim.hint("broadcast"), "lang")
        .groupBy("lang").agg(count(lit(1)).as("docs"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString.toLowerCase
      println(s"$tag dynamicpruning=" + p.contains("dynamicpruning"))
    }

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10")
    shape(s2, "clone")

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10")
    shape(spark, "orig")
  }
}
