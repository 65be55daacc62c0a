package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: per-stage row counts and timings for g33. */
object BetweennessProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.operators.GraphOps.betweennessCentrality(spark, sfDir)
    val n = df.count()
    println(s"g33 rows=$n in ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(s"recount rows=$n2 in ${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
