// scratch profiler — run via: sbt "runMain graft.tools.ProfileMinhash"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Shingles

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val sh = docs.withColumn("sh", array_distinct(Shingles.wordShingles("text", 4)))
      .select(col("doc_id"), col("sh"))
    time("shingles only")(sh.write.format("noop").mode("overwrite").save())
    val mh = sh.withColumn("mh", expr(
      """transform(sequence(0, 31),
           i -> array_min(transform(sh, s -> xxhash64(s, i))))"""))
    time("minhash 32")(mh.write.format("noop").mode("overwrite").save())
    val banded = mh.select(col("doc_id"), posexplode(expr(
      """transform(sequence(0, 7), b -> xxhash64(slice(mh, b * 4 + 1, 4)))"""))
      .as(Seq("band", "sig")))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val cached = banded.cache()
    time("banded cached")(cached.count())
    val cand = cached.as("x").join(cached.as("y"),
      col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
    time("candidates from cached")(println("cand=" + cand.count()))
    spark.stop()
  }
}
