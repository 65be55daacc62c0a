package graft
import org.apache.spark.sql.SparkSession
object SmokeNs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.names.foreach { n =>
      val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", n)
      println(s"$n: ${df.count()} rows, schema=${df.schema.simpleString.take(200)}")
    }
    spark.stop()
  }
}
