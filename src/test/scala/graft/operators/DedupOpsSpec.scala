package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Skew-safety of the n-gram canopy dedup: a corpus-common 8-gram
  * (boilerplate) must not make one candidate bucket quadratic, and the
  * frequency cutoff must not change results on the testdata corpus. */
class DedupOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** 60 docs opening with the same 8-word license blurb (a hot canopy
    * key shared by all 60) followed by per-doc unique text, plus one
    * true near-dup pair (9000/9001) that shares its OWN rare 8-gram and
    * nearly all 5-char grams. */
  private def boilerplateDocs = {
    val blurb = "licensed under the apache license version two zero"
    val unique = (0 until 60).map { i =>
      val body = (0 until 12).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, s"$blurb $body")
    }
    val nearDup = Seq(
      (9000L, "the quick brown fox jumps over the lazy dog again and again"),
      (9001L, "the quick brown fox jumps over the lazy dog again and again!"))
    val s = spark
    import s.implicits._
    (unique ++ nearDup).toDF("doc_id", "text")
  }

  test("canopy frequency cap bounds boilerplate candidates but keeps true pairs") {
    val capped = DedupOps
      .ngramJaccardOn(boilerplateDocs, threshold = 0.5, maxCanopyFreq = 50)
      .collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((9000L, 9001L)),
      "cap must drop boilerplate-only pairs and keep the true near-dup")

    // without the cap the hot blurb key generates all 60*59/2 candidates
    val uncappedCandidates = DedupOps
      .ngramJaccardOn(boilerplateDocs, threshold = -1.0, maxCanopyFreq = Long.MaxValue)
      .count()
    val cappedCandidates = DedupOps
      .ngramJaccardOn(boilerplateDocs, threshold = -1.0, maxCanopyFreq = 50)
      .count()
    assert(uncappedCandidates >= 60L * 59 / 2,
      s"fixture should be quadratic uncapped, got $uncappedCandidates")
    assert(cappedCandidates == 1,
      s"cap should leave only the rare-key candidate, got $cappedCandidates")
  }

  test("d05 LSH blocking finds exactly the brute-force pairs at threshold") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val sfDir = "/root/testdata/sf0.01"
    val lsh = DedupOps.embeddingNearDup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
    val brute = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round(expr("graft_cosine(x.v, y.v)"), 4).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture should have true pairs")
    assert(lsh == brute,
      s"LSH missed ${(brute -- lsh).size}, spurious ${(lsh -- brute).size}")
  }

  test("d05 hot-bucket cap bounds a degenerate corpus; default cap is a no-op on testdata") {
    val s = spark
    import s.implicits._
    // adversarial corpus: 200 IDENTICAL vectors — every one lands in the
    // same bucket of all 16 tables, so uncapped candidate generation is
    // exactly quadratic (19900 pairs)
    val identical = (0 until 200)
      .map(i => (i.toLong, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val uncapped = DedupOps.embeddingNearDupOn(
      identical, threshold = -1.0, tables = 16, planes = 2,
      maxBucketFreq = Long.MaxValue).count()
    assert(uncapped == 200L * 199 / 2, s"fixture should be quadratic, got $uncapped")
    val capped = DedupOps.embeddingNearDupOn(
      identical, threshold = -1.0, tables = 16, planes = 2,
      maxBucketFreq = 50).count()
    assert(capped == 0, s"all buckets are hot at cap=50, got $capped candidates")

    // the shipped default must not change testdata results
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(cap: Long) =
      DedupOps.embeddingNearDupOn(d, 0.3, 16, 2, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(5000) == pairs(Long.MaxValue))
  }

  test("d04 output on testdata is unchanged by the default cap") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def pairs(cap: Long) =
      DedupOps.ngramJaccardOn(d, threshold = 0.5, maxCanopyFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(100) == pairs(Long.MaxValue))
  }

  test("d12 incremental dedup equals the full pair set restricted to the delta") {
    val sfDir = "/root/testdata/sf0.01"
    val cut = graft.sources.Tables.rowCount(spark, sfDir, "documents") * 9 / 10
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = rows(DedupOps.minhashPortable(spark, sfDir))
    val inc = rows(DedupOps.incrementalDedup(spark, sfDir))
    // id_b is the pair max, so "touches the delta" == id_b >= cut
    assert(inc == full.filter(_._2 >= cut),
      "incremental must produce exactly the full-corpus pairs touching the delta")
    assert(inc.nonEmpty, "fixture must exercise the delta path")
    assert(!inc.exists(p => p._1 < cut && p._2 < cut),
      "no corpus-x-corpus pair may be generated")
    // the benched d12i form (candidate join over the MATERIALIZED
    // signature table — the ingest shape) is result-identical
    val fromSigs = rows(DedupOps.incrementalDedupFromSigs(spark, sfDir))
    assert(fromSigs == inc,
      "pre-materialized-signature path must equal the inline path")
  }

  test("d13 edit-distance verify agrees with the jaccard verifier") {
    val sfDir = "/root/testdata/sf0.01"
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edit = ids(DedupOps.editDistDedup(spark, sfDir))
    assert(edit.nonEmpty, "fixture must exercise the edit-dist verifier")
    assert(edit.forall(p => p._1 < p._2), "pairs must be id-ordered")
    // near-identical shingle sets imply a near-identical prefix: every
    // jaccard ≥ 0.8 pair must survive the edit-distance verifier too
    val strong = ids(DedupOps.minhashPortable(spark, sfDir, threshold = 0.8))
    assert(strong.nonEmpty && strong.subsetOf(edit),
      s"high-jaccard pairs rejected by edit distance: ${strong -- edit}")
    // and the verifier must DISCRIMINATE: it may not bless every
    // banded candidate (else the threshold does nothing)
    val loose = ids(DedupOps.minhashPortable(spark, sfDir, threshold = 0.0))
    assert(edit.subsetOf(loose) && edit != loose,
      "edit verifier must reject some banded candidates")
    // the benched d13i form (stored signature table) is result-identical
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(DedupOps.editDistDedupFromSigs(spark, sfDir)) ==
      rows(DedupOps.editDistDedup(spark, sfDir)),
      "pre-materialized-signature path must equal the inline path")
  }

  test("connected components match union-find on random pair graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val n = 40 + rnd.nextInt(20)
      val pairs = Seq.fill(30 + rnd.nextInt(40)) {
        val a = rnd.nextInt(n).toLong; var b = rnd.nextInt(n).toLong
        while (b == a) b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.distinct
      // reference: classic union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        if (parent(x) != x) parent(x) = find(parent(x)); parent(x)
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = touched.map { v =>
        // component representative = min vertex of the component
        val root = find(v.toInt)
        v -> touched.filter(u => find(u.toInt) == root).min
      }.toMap
      val cc = DedupOps.connectedComponents(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc == expected, s"trial $trial: CC != union-find")
    }
  }

  test("connected components resolve transitive near-dup chains to one cluster") {
    val s = spark
    import s.implicits._
    // chain 1-2-3-4 (needs >1 propagation round), isolated pair 10-11,
    // and a triangle 20-21-22 with a redundant closing edge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("d14 prefix-filtered jaccard join is LOSSLESS: equals brute " +
      "force on the fixture corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"))
    val got = DedupOps.prefixJaccardOn(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute force: every pair, exact verified — the prefix filter may
    // only shrink the CANDIDATE set, never the verified result
    val g = docs.withColumn("grams", array_distinct(expr(
        "regexp_extract_all(text, '.{5}', 0)")))
      .filter(size(col("grams")) > 0).select("doc_id", "grams")
    val brute = g.as("a").join(g.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(size(array_intersect(col("a.grams"), col("b.grams")))
            .cast("double") /
          size(array_union(col("a.grams"), col("b.grams"))), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == brute)
    assert(got.nonEmpty) // the fixture has true near-dup pairs
    // canopy-blocked d04 can only lose pairs relative to the lossless
    // join (on this fixture it loses none — both find the same set)
    val canopy = DedupOps.ngramJaccardOn(docs, 0.5, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(canopy.subsetOf(got))
  }

  test("d15 CDC census: shared passages share chunks; edits stay local") {
    val s = spark
    import s.implicits._
    val passage = (0 until 30).map(i => s"tok$i").mkString(" ")
    def census(rows: (Long, String)*): Map[String, (Long, Long)] =
      DedupOps.cdcChunkCensusOn(rows.toDF("doc_id", "text")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical docs: every (>= 20 char) chunk is shared by both
    val dup = census(1L -> passage, 2L -> passage)
    assert(dup.nonEmpty && dup.values.forall(_ == (2L, 2L)))
    // the SAME passage embedded in different prefix/suffix context:
    // content-defined boundaries keep interior chunks identical, so
    // at least one shared chunk survives — the property fixed-width
    // chunking (c13) loses to offset shift
    val ctx = census(
      1L -> s"unrelated prefix words here $passage",
      2L -> s"$passage and then a different tail entirely")
    assert(ctx.exists { case (_, (nd, _)) => nd == 2L },
      "shared passage must surface at least one cross-doc chunk")
    // disjoint docs: nothing shared
    val far = census(1L -> passage,
      2L -> (30 until 60).map(i => s"w$i").mkString(" "))
    assert(!far.exists { case (_, (nd, _)) => nd == 2L })
  }

  test("d18 intra-doc dedup: first chunk occurrence kept, order intact") {
    val s = spark
    import s.implicits._
    def run(rows: (Long, String)*) =
      DedupOps.intraDocDedupOn(rows.toDF("doc_id", "text"), k = 2)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
          r.getLong(3))).toMap
    val got = run(
      1L -> "a b c d a b", // chunk 0 repeats at 2: drop the repeat
      2L -> "x y x y x y", // one distinct chunk, two repeats
      3L -> "a b c d e",   // partial tail chunk, all distinct
      4L -> "a b a")       // tail "a" ≠ chunk "a b": both kept
    assert(got(1L) == ("a b c d", 3L, 1L))
    assert(got(2L) == ("x y", 3L, 2L))
    assert(got(3L) == ("a b c d e", 3L, 0L))
    assert(got(4L) == ("a b a", 2L, 0L))
    // repeats NOT aligned to the chunk grid survive (the documented
    // fixed-grid limit — d16's window join is the exhaustive form)
    assert(run(5L -> "z a b a b x")(5L)._3 == 0L)
  }

  test("d20 calibration: identical docs bin at 8/8 slots, jaccard 1") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    val txt = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (20 to 40).map(i => s"x$i").mkString(" ")
    val d = Seq((1L, txt), (2L, txt), (3L, other)).toDF("doc_id", "text")
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .withColumn("sig", org.apache.spark.sql.functions.expr(
        DedupOps.portableSigSql))
    val got = DedupOps.minhashCalibrationOn(d).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    // the identical pair is the only band collision: one bin, all 8
    // slots match, exact jaccard 1, estimator 8/8 = 1
    assert(got == Map(8 -> (1L, 1.0, 1.0)))
    // the d20i serve over the stored signature table is identical
    val sf = "/root/testdata/sf0.001"
    val inline = DedupOps.minhashCalibration(spark, sf)
      .collect().map(_.toSeq).toSet
    val served = DedupOps.minhashCalibrationFromSigs(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(inline.nonEmpty && inline == served)
  }

  test("d19 report: within-source dups and cross-source leaks split") {
    val s = spark
    import s.implicits._
    val got = DedupOps.dedupReportOn(Seq(
      (1L, "a", "same text"), (2L, "a", "same text"),
      (3L, "a", "unique in a"),
      (4L, "b", "same text"), (5L, "b", "only b"))
      .toDF("doc_id", "source", "text"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // a: 3 docs, 1 within-source copy, 2 docs whose content also
    // lives in b; b: no within-source dup, 1 leaked doc
    assert(got == Map("a" -> (3L, 1L, 2L), "b" -> (2L, 0L, 1L)))
  }
}
