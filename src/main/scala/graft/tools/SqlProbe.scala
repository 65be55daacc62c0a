// scratch probe for the registered graft_* SQL functions
package graft.tools

import org.apache.spark.sql.SparkSession

object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")

    println("shingles: " + spark.sql(
      "SELECT graft_shingles('a b c d e', 3)").collect().head)
    println("minhash:  " + spark.sql(
      "SELECT graft_minhash(graft_shingles(text, 4), 8) FROM documents LIMIT 1")
      .collect().head.getSeq[Long](0).take(4))
    println("cosine:   " + spark.sql(
      "SELECT round(graft_cosine(array(1D,2D), array(2D,4D)), 6)").collect().head)
    // mismatched lengths: documented truncation to the shorter vector
    println("cosine-mismatch: " + spark.sql(
      "SELECT round(graft_cosine(array(3D,4D,100D), array(3D,4D)), 6)")
      .collect().head)
    println("simhash:  " + spark.sql(
      "SELECT graft_simhash(split(text, ' ')) FROM documents LIMIT 2")
      .collect().map(_.getLong(0)).mkString(", "))
    println("lsh_sigs: " + spark.sql(
      """SELECT graft_lsh_sigs(transform(embedding, x -> CAST(x AS DOUBLE)), 4, 8)
         FROM embeddings LIMIT 1""")
      .collect().head.getSeq[Int](0))
    // probes: wrong arg types / counts
    for (bad <- Seq(
        "SELECT graft_minhash(array(1, 2), 4)",
        "SELECT graft_cosine(array('a'), array('b'))",
        "SELECT graft_shingles('x')",
        "SELECT graft_shingles('x', 3, 9)",
        "SELECT graft_simhash('not-an-array')",
        "SELECT graft_lsh_sigs(array(1D), 4, 99)")) {
      try { spark.sql(bad).collect(); println(s"NO-ERROR: $bad") }
      catch { case e: Exception =>
        println(s"ERR ok: $bad -> ${e.getMessage.linesIterator.next().take(120)}") }
    }
    spark.stop()
  }
}
