package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen expressions must be drop-in equivalent to the
  * higher-order-function formulations they replaced, in BOTH execution
  * modes (whole-stage codegen on and off — i.e. doGenCode and eval). */
class NativeExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    // non-literal inputs (parquet-backed) so constant folding cannot
    // pre-evaluate the expressions at optimization time
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withCodegen[A](on: Boolean)(f: => A): A = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try f finally spark.conf.set(key, old)
  }

  test("graft_minhash equals the HOF formulation (both codegen modes)") {
    val hof =
      """transform(sequence(0, 7), i ->
           array_min(transform(transform(sh, s -> xxhash64(s)),
                     h -> xxhash64(h, i))))"""
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = spark.sql(
        s"""SELECT graft_minhash(sh, 8) AS native, $hof AS hof
            FROM (SELECT split(text, ' ') AS sh FROM documents LIMIT 50)""")
        .collect()
      assert(rows.length == 50)
      rows.foreach { r =>
        val native = r.getAs[scala.collection.Seq[Long]](0).toSeq
        val hofV = r.getAs[scala.collection.Seq[Long]](1).toSeq
        assert(native == hofV, s"codegen=$cg mismatch")
      }
    }
  }

  test("graft_minhash of an empty array is the MaxValue fill") {
    val r = spark.sql(
      """SELECT graft_minhash(filter(split(text, ' '), w -> false), 4)
         FROM documents LIMIT 1""").collect()
    assert(r.head.getAs[scala.collection.Seq[Long]](0).toSeq ==
      Seq.fill(4)(Long.MaxValue))
  }

  test("graft_cosine equals the zip_with/aggregate formulation") {
    val hof =
      """try_divide(
           aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, p) -> s + p),
           sqrt(aggregate(a, 0D, (s, x) -> s + x * x)) *
           sqrt(aggregate(b, 0D, (s, x) -> s + x * x)))"""
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = spark.sql(
        s"""SELECT graft_cosine(a, b) AS native, $hof AS hof
            FROM (SELECT transform(e1.embedding, x -> CAST(x AS DOUBLE)) AS a,
                         transform(e2.embedding, x -> CAST(x AS DOUBLE)) AS b
                  FROM embeddings e1 JOIN embeddings e2
                    ON e1.vec_id + 1 = e2.vec_id
                  LIMIT 50)""").collect()
      assert(rows.length == 50)
      rows.foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
          s"codegen=$cg")
      }
    }
  }

  test("graft_cosine zero vector yields 0.0, null input yields null") {
    val z = spark.sql(
      "SELECT graft_cosine(array(0D, 0D), array(1D, 1D))").collect()
    assert(z.head.getDouble(0) == 0.0)
    val n = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1D))").collect()
    assert(n.head.isNullAt(0))
  }

  test("graft_simhash equals the nested-aggregate HOF formulation") {
    val hof =
      """aggregate(sequence(0, 63), 0L, (acc, j) ->
           acc | IF(aggregate(transform(toks, t -> xxhash64(t)), 0,
                      (s, h) -> s + IF((shiftright(h, j) & 1) = 1, 1, -1)) > 0,
                    shiftleft(1L, j), 0L))"""
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val rows = spark.sql(
        s"""SELECT graft_simhash(toks) AS native, $hof AS hofv
            FROM (SELECT array_distinct(split(text, ' ')) AS toks
                  FROM documents LIMIT 40)""").collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"codegen=$cg"))
    }
  }

  test("graft_lsh_sigs: deterministic, bounded, matches the kernel") {
    val rows = spark.sql(
      """SELECT vec_id, graft_lsh_sigs(transform(embedding,
                x -> CAST(x AS DOUBLE)), 4, 8) AS sigs
         FROM embeddings ORDER BY vec_id LIMIT 20""").collect()
    rows.foreach { r =>
      val sigs = r.getAs[scala.collection.Seq[Int]](1)
      assert(sigs.size == 4)
      assert(sigs.forall(s => s >= 0 && s < 256)) // 8-bit signatures
    }
    // repeat-run determinism
    val again = spark.sql(
      """SELECT graft_lsh_sigs(transform(embedding, x -> CAST(x AS DOUBLE)), 4, 8)
         FROM embeddings ORDER BY vec_id LIMIT 20""").collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Int]](1).toSeq).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Int]](0).toSeq).toSeq)
  }

  test("graft_nearest_cents broadcast path == literal path at C = 1024") {
    // a model too big to sensibly embed as a plan literal: 1024 centroids
    // x 64 dims. The broadcast-backed expression must produce the exact
    // assignment the literal path does, in both execution modes.
    val rnd = new scala.util.Random(7)
    val cents: Seq[Seq[Double]] =
      Seq.fill(1024)(Seq.fill(64)(rnd.nextGaussian()))
    import org.apache.spark.sql.functions._
    val base = spark.table("embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      .limit(50)
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val viaLiteral = base.withColumn("nc",
          call_function("graft_nearest_cents", col("v"), typedlit(cents), lit(3)))
        .select("vec_id", "nc").collect()
          .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      val viaBroadcast = base.withColumn("nc",
          graft.operators.SimilarityOps.nearestCents(spark, col("v"), cents, 3))
        .select("vec_id", "nc").collect()
          .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      assert(viaBroadcast == viaLiteral, s"codegen=$cg")
    }
  }

  test("graft_pq_codes: subspace argmin matches a naive reference, both codegen modes") {
    // naive reference computed in Scala over the same doubles
    def refCodes(v: Seq[Double], cents: Seq[Seq[Double]], m: Int): Seq[Int] = {
      val sub = v.size / m
      (0 until m).map { s =>
        val from = s * sub
        val until = if (s == m - 1) v.size else from + sub
        cents.indices.minBy { ci =>
          (from until until).map { j =>
            val d = v(j) - cents(ci)(j); d * d
          }.sum
        } // minBy keeps the FIRST minimum = lower index on ties
      }
    }
    val rows = spark.sql(
      """SELECT vec_id, transform(embedding, x -> cast(x AS DOUBLE)) AS v
         FROM embeddings ORDER BY vec_id LIMIT 20""").collect()
    val cents = rows.take(4).map(_.getSeq[Double](1).toSeq).toSeq
    val centsLit = org.apache.spark.sql.functions.typedlit(cents)
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = spark.sql(
        """SELECT vec_id, transform(embedding, x -> cast(x AS DOUBLE)) AS v
           FROM embeddings ORDER BY vec_id LIMIT 20""")
        .withColumn("codes", org.apache.spark.sql.functions.call_function(
          "graft_pq_codes", org.apache.spark.sql.functions.col("v"),
          centsLit, org.apache.spark.sql.functions.lit(8)))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Int](2) == refCodes(r.getSeq[Double](1).toSeq, cents, 8),
          s"codes diverge for vec ${r.getLong(0)} (codegen=$codegen)")
      }
    }
    // tie-break: identical centroids → always the lower index
    val tied = Seq(Seq.fill(8)(1.0), Seq.fill(8)(1.0))
    assert(refCodes(Seq.fill(8)(0.5), tied, 4) == Seq(0, 0, 0, 0))
    val tiedDf = spark.range(1).selectExpr("array(0.5d, 0.5d) AS v")
      .select(org.apache.spark.sql.functions.call_function("graft_pq_codes",
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.typedlit(
          Seq(Seq(9.0, 9.0), Seq(9.0, 9.0))),
        org.apache.spark.sql.functions.lit(2))).collect()
    assert(tiedDf.head.getSeq[Int](0) == Seq(0, 0))
  }

  test("expressions run inside whole-stage codegen over real scans") {
    val plan = spark.sql(
      """SELECT graft_cosine(transform(embedding, x -> CAST(x AS DOUBLE)),
                             transform(embedding, x -> CAST(x AS DOUBLE))) AS c,
                graft_minhash(array(CAST(vec_id AS STRING)), 4) AS m
         FROM embeddings""").queryExecution.executedPlan
    // WholeStageCodegenExec renders as "*(n)" in the plan tree
    assert(plan.toString.contains("*(1)"),
      s"native expressions fell out of codegen:\n$plan")
  }
}
