package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-scale LSH behavior: corpora dominated by boilerplate
  * (80% of rows collapsing onto one signature) must NOT make any banded
  * candidate join quadratic in the duplicate-cluster size — the
  * hot-bucket caps drop the degenerate buckets (the documented recall
  * loss; exact dedup owns identical-content removal) while planted
  * near-dups in the cold region keep 100% recall. */
class DedupAdversarialScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 10^5 embeddings: 80k boilerplate (near-identical, pairwise cosine
    * ≈ 1 — one LSH bucket per table), 20k scattered directions, with 5
    * planted near-dup pairs at ids 90000..90009 (the odd twin is a
    * 1+1e-6 scaling of the even one — same direction, so identical
    * hyperplane signs by construction and cosine exactly 1). */
  private def skewedVectors: DataFrame =
    spark.range(100000).selectExpr("id AS vec_id",
      """CASE
           WHEN id < 80000 THEN
             transform(sequence(0, 7), j -> 1.0d + ((id * 31 + j) % 7) * 1e-6d)
           WHEN id >= 90000 AND id < 90010 THEN
             transform(sequence(0, 7),
               j -> (pmod(xxhash64(id - id % 2, j), 1000) / 500.0d - 1.0d)
                      * (1.0d + (id % 2) * 1e-6d))
           ELSE transform(sequence(0, 7),
             j -> pmod(xxhash64(id, j), 1000) / 500.0d - 1.0d)
         END AS embedding""")

  test("d05 embedding: 80%-boilerplate 100k corpus stays bounded, planted recall 100%") {
    val pairs = DedupOps.embeddingNearDupOn(skewedVectors,
        threshold = 0.95, tables = 4, planes = 8, maxBucketFreq = 2000,
        corpusRows = Some(100000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 5).map(k => (90000L + 2 * k, 90001L + 2 * k)).toSet
    assert(planted.subsetOf(pairs),
      s"planted pairs missing: ${planted -- pairs}")
    assert(!pairs.exists(p => p._1 < 80000 && p._2 < 80000),
      "boilerplate cluster must be dropped by the hot-bucket cap, not enumerated")

    // the omission is the cap, not the threshold: boilerplate vectors
    // really are above-threshold near-dups of each other
    def v(id: Long) = (0 until 8).map(j => 1.0 + ((id * 31 + j) % 7) * 1e-6)
    val (a, b) = (v(0), v(1))
    val cos = a.zip(b).map { case (x, y) => x * y }.sum /
      math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(cos >= 0.95, s"fixture broken: boilerplate cosine $cos below threshold")
  }

  test("s02 ANN: hot boilerplate buckets are dropped, cold-region queries still fill top-k") {
    // queries are ids 0..4 — put them in the COLD (hash-spread) region
    // and the 80k boilerplate cluster at high ids, so the test shows a
    // query surviving the cap: its bucket-mates are the ~20k cold
    // vectors, while the boilerplate mega-buckets are dropped instead of
    // flooding every probe with 80k candidates
    val vectors = spark.range(100000).selectExpr("id AS vec_id",
      """CASE WHEN id < 20000 THEN
           transform(sequence(0, 7), j -> pmod(xxhash64(id, j), 1000) / 500.0d - 1.0d)
         ELSE transform(sequence(0, 7), j -> 1.0d + ((id * 31 + j) % 7) * 1e-6d)
         END AS embedding""")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(x AS DOUBLE)) AS v")
    val topk = SimilarityOps.lshTopKOn(vectors, corpusRows = 100000L,
        nQueries = 5, k = 10, tables = 4, planes = 8, maxBucketFreq = 2000)
      .collect()
    val perQuery = topk.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery == (0L until 5L).map(_ -> 10).toMap,
      s"every cold-region query must fill its top-k, got $perQuery")
    assert(topk.forall(_.getLong(2) < 20000),
      "no neighbor may come from the dropped boilerplate cluster")
  }

  /** 2·10^4 documents: 16k identical boilerplate texts (every band
    * signature collides — d01 exact dedup owns these), 4k unique-token
    * docs, one planted jaccard near-dup pair (19000/19001, 9 of 10
    * words shared) and one planted identical pair in the cold region
    * (19500/19501). */
  private def skewedDocs: DataFrame =
    spark.range(20000).selectExpr("id AS doc_id",
      """CASE
           WHEN id < 16000 THEN
             'the quick brown fox jumps over the lazy dog again and again'
           WHEN id IN (19000, 19001) THEN
             concat('p0 p1 p2 p3 p4 p5 p6 p7 p8 ',
                    CASE WHEN id = 19000 THEN 'p9' ELSE 'q9' END)
           WHEN id IN (19500, 19501) THEN
             'r0 r1 r2 r3 r4 r5 r6 r7 r8 r9'
           ELSE concat_ws(' ',
             transform(sequence(0, 9), j -> concat('w', id * 13 + j)))
         END AS text""")

  test("d02 minhash: boilerplate-identical 20k corpus stays bounded, planted recall 100%") {
    val pairs = DedupOps.minhashLshOn(skewedDocs,
        maxBucketFreq = 2000, corpusRows = Some(20000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((19000L, 19001L)),
      s"planted jaccard near-dup missing from $pairs")
    assert(pairs.contains((19500L, 19501L)), "planted identical pair missing")
    assert(!pairs.exists(p => p._1 < 16000 && p._2 < 16000),
      "boilerplate cluster must be dropped by the hot-bucket cap")
  }

  test("d05 cap scaling: the scaled term is bounded below the corpus size") {
    // at the shipped default planes=2, the raw 4n/2^planes equals n —
    // the maximum possible bucket size — so an unbounded scale term
    // would make the backstop vacuous exactly at the default
    assert(DedupOps.scaledEmbeddingCap(100000L, 2) == 50000L)
    assert(DedupOps.scaledEmbeddingCap(12000L, 2) == 6000L)
    // small corpora: the floor governs (and the corpus≤cap dominance
    // short-circuit keeps the gate SFs byte-identical)
    assert(DedupOps.scaledEmbeddingCap(500L, 2) == 5000L)
    assert(DedupOps.scaledEmbeddingCap(5000L, 2) == 5000L)
    // fine planes: 4× expected bucket stays below n/2 and governs
    assert(DedupOps.scaledEmbeddingCap(1000000L, 8) == 15625L)
  }

  test("d05 embedding through embeddingNearDup DEFAULTS: boilerplate dropped at planes=2") {
    // exercises the DEFAULT parameter path (planes=2, floor=5000,
    // tables=32, τ=0.3) end-to-end via a fixture sfDir — n=12000 puts
    // the scaled cap at 6000 < n, so the 11k-member boilerplate bucket
    // must be dropped in every table while planted cold-region twins
    // (identical direction ⇒ identical signs in all 32 tables) survive
    // boilerplate is EXACTLY identical here (d01 exact dedup owns those)
    // — at planes=2 a near-identical cluster can straddle a borderline
    // hyperplane and split into sub-buckets below the cap, which is a
    // fixture artifact, not the degenerate-bucket case under test
    val dir = new java.io.File("target/tmp/adv-defaults").getAbsolutePath
    spark.range(12000).selectExpr("id AS vec_id",
      """CASE
           WHEN id < 11000 THEN
             transform(sequence(0, 7), j -> 1.0d)
           WHEN id >= 11900 AND id < 11910 THEN
             transform(sequence(0, 7),
               j -> (pmod(xxhash64(id - id % 2, j), 1000) / 500.0d - 1.0d)
                      * (1.0d + (id % 2) * 1e-6d))
           ELSE transform(sequence(0, 7),
             j -> cast(pmod(xxhash64(id, j), 1000) / 500.0d - 1.0d AS DOUBLE))
         END AS embedding""")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "embeddings.parquet").getAbsolutePath)
    val pairs = DedupOps.embeddingNearDup(spark, dir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 5).map(k => (11900L + 2 * k, 11901L + 2 * k)).toSet
    assert(planted.subsetOf(pairs), s"planted pairs missing: ${planted -- pairs}")
    assert(!pairs.exists(p => p._1 < 11000 && p._2 < 11000),
      "boilerplate cluster must be dropped by the default-scaled cap")
  }

  test("d03 simhash: boilerplate-identical 20k corpus stays bounded, planted recall 100%") {
    val pairs = DedupOps.simhashPairsOn(skewedDocs,
        maxBucketFreq = 2000, corpusRows = Some(20000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((19500L, 19501L)),
      s"planted identical pair (hamming 0) missing from $pairs")
    assert(!pairs.exists(p => p._1 < 16000 && p._2 < 16000),
      "boilerplate cluster must be dropped by the hot-bucket cap")
  }
}
