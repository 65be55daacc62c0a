package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Salting must be result-neutral AND actually split the hot key across
  * salt buckets. */
class SkewOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted join == plain join on a pathologically skewed key") {
    val s = spark
    import s.implicits._
    // 10k rows of one hot key + 1k spread over 100 cold keys
    val probe = ((0 until 10000).map(i => (7L, s"hot$i")) ++
      (0 until 1000).map(i => ((i % 100).toLong + 100L, s"cold$i")))
      .toDF("k", "payload")
    val build = (0 until 200).map(i => (i.toLong, s"dim$i")).toDF("bk", "name")

    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewOps.saltedJoin(probe, build, "k", "bk", buckets = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(plain.size == 10000 + 1000)
  }

  test("the hot key's rows spread across multiple salt values") {
    val s = spark
    import s.implicits._
    val probe = (0 until 10000).map(i => (7L, s"hot$i")).toDF("k", "payload")
    import org.apache.spark.sql.functions._
    val salts = probe.withColumn("_salt",
        pmod(xxhash64(struct(probe.columns.map(col).toSeq: _*)), lit(8))
          .cast("int"))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key only reached $salts of 8 salt buckets")
  }
}
