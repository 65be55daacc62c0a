package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase per-source quota must (a) equal the one-window form —
  * global top-k by a per-row score is the top-k of the union of
  * per-partition top-ks — and (b) bound the rows any single source
  * contributes to the global ranking at k·P, so a mega-source never
  * funnels through one reducer. */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** 20k docs in one mega-source + 50 in a small one, spread over 8
    * input partitions. */
  private def skewedDocs = spark.range(0, 20050, 1, 8).selectExpr(
    "id AS doc_id",
    "concat('text-', md5(cast(id AS STRING))) AS text",
    "CASE WHEN id < 20000 THEN 'mega' ELSE 'small' END AS source")

  test("two-phase quota equals the one-window form on skewed data") {
    val d = skewedDocs
    val k = 7
    val twoPhase = CurationOps.sourceQuotaOn(d, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
    val oneWindow = d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select(col("doc_id"), col("source"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(twoPhase == oneWindow)
    assert(twoPhase.count(_._2 == "mega") == k)
    assert(twoPhase.count(_._2 == "small") == k)
  }

  test("phase 1 bounds any source's contribution at k per input partition") {
    val k = 7
    val perSource = CurationOps.quotaCandidates(skewedDocs, k)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 8 input partitions → the 20k-doc mega-source reaches the global
    // ranking with at most 56 rows instead of 20000
    assert(perSource("mega") <= 8L * k,
      s"mega source sent ${perSource("mega")} rows to the global rank")
    assert(perSource("small") <= 8L * k)
  }

  test("epoch shuffle: deterministic per seed, distinct across seeds, " +
      "contiguous positions per shard") {
    val sfDir = "/root/testdata/sf0.001"
    def runIt(seed: Int): Map[Long, (Int, Int)] =
      CurationOps.epochShuffle(spark, sfDir, seed = seed).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val a = runIt(7)
    assert(a == runIt(7), "same seed must reproduce the same permutation")
    val b = runIt(8)
    assert(a != b, "different seeds must give a different permutation")
    // every doc placed exactly once; positions within a shard are 1..n
    val byShard = a.values.groupBy(_._1)
    byShard.foreach { case (shard, coords) =>
      val ps = coords.map(_._2).toSeq.sorted
      assert(ps == (1 to ps.size), s"shard $shard positions not contiguous")
    }
    // hash-uniform shards: no shard holds more than 3x its fair share
    val fair = a.size.toDouble / byShard.size
    assert(byShard.values.map(_.size).max <= 3 * fair)
  }

  test("c14 negative samples: deterministic per seed, anchor-free, " +
      "k per anchor, roughly uniform") {
    val sfDir = "/root/testdata/sf0.001"
    def runIt(seed: Int) = CurationOps.negativeSamples(spark, sfDir,
        k = 3, seed = seed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = runIt(7)
    assert(a == runIt(7), "same seed must reproduce the same pairs")
    assert(a != runIt(8), "different seeds must draw different negatives")
    assert(a.forall { case (anchor, _, neg) => anchor != neg },
      "a document must never be its own negative")
    val n = a.map(_._1).size
    a.groupBy(_._1).foreach { case (anchor, rows) =>
      assert(rows.map(_._2) == Set(0L, 1L, 2L),
        s"anchor $anchor must carry exactly slots 0..2")
    }
    // hash-uniform negatives: no doc serves as negative > 12x its fair
    // share (50 docs x 3 slots / 50 candidates = 3 expected each)
    val maxServe = a.groupBy(_._3).values.map(_.size).max
    assert(maxServe <= 36, s"a negative id repeated $maxServe times")
  }

  test("c15 weighted sample: deterministic, weight-monotone keep rate") {
    val sfDir = "/root/testdata/sf0.01"
    def kept(seed: Int): Set[Long] =
      CurationOps.weightedSample(spark, sfDir, seed = seed)
        .collect().map(_.getLong(0)).toSet
    val a = kept(7)
    assert(a == kept(7), "same seed must reproduce the sample")
    assert(a != kept(8), "different seeds must draw differently")
    val all = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && a.size < all.size,
      "sample must keep some docs and drop some")
    // weight-proportional: the keep RATE of the longer half must beat
    // the shorter half's (weight is monotone in n_chars)
    val sorted = all.toSeq.sortBy(_._2).map(_._1)
    val (short, long) = sorted.splitAt(sorted.size / 2)
    def rate(ids: Seq[Long]) =
      ids.count(a).toDouble / ids.size
    assert(rate(long) > rate(short),
      f"longer docs must be kept more often (${rate(long)}%.2f vs " +
        f"${rate(short)}%.2f)")
    // saturated weights: every doc at/over the 2000-char cap is kept
    val capped = all.filter(_._2 >= 2000).keySet
    assert(capped.subsetOf(a),
      s"docs at weight 1.0 must always be kept: ${capped -- a}")
  }

  test("c16 temperature mix damps the dominant source toward sqrt shares") {
    val s = spark
    import s.implicits._
    // 9:1 skew — α=1/2 keep rates: big = sqrt(100/900) = 1/3, small = 1
    val d = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val kept = CurationOps.temperatureMixOn(d).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource("small") == 100,
      "the rarest source must keep everything")
    val bigRate = bySource("big") / 900.0
    assert(bigRate > 0.28 && bigRate < 0.39,
      f"dominant source must keep ~1/3, kept $bigRate%.3f")
    // deterministic per seed, reshuffled across seeds
    val again = CurationOps.temperatureMixOn(d).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
    assert(CurationOps.temperatureMixOn(d, seed = 8).collect()
      .map(_.getLong(0)).toSet != kept.map(_._1).toSet)
  }

  test("c13 chunks reconstruct every document exactly under the stride") {
    val sfDir = "/root/testdata/sf0.001"
    val (width, stride) = (64, 48)
    val chunks = CurationOps.chunkDocs(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getString(3)).toSeq
      }
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    var sawOverlap = false
    for ((id, text) <- texts) {
      val ws = text.split(" ", -1).toSeq
      val cs = chunks(id)
      assert(cs.size == (ws.size - 1) / stride + 1,
        s"doc $id: ${cs.size} chunks for ${ws.size} tokens")
      // the first `stride` tokens of every non-last chunk, then the
      // whole last chunk, must tile the document losslessly
      val rebuilt = cs.init.flatMap(_.split(" ", -1).take(stride)) ++
        cs.last.split(" ", -1)
      assert(rebuilt == ws, s"doc $id: chunks do not tile the document")
      // overlapping windows: consecutive chunks share width-stride tokens
      if (cs.size > 1) {
        sawOverlap = true
        cs.sliding(2).foreach { case Seq(a2, b2) =>
          val at = a2.split(" ", -1); val bt = b2.split(" ", -1)
          assert(at.drop(stride).sameElements(
            bt.take(at.length - stride)),
            s"doc $id: overlap mismatch between consecutive chunks")
        }
      }
    }
    assert(sawOverlap, "fixture must contain at least one multi-chunk doc")
  }

  test("c18: no near-dup pair straddles the train/eval split") {
    val sf = "/root/testdata/sf0.001"
    val split = CurationOps.dedupAwareSplit(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // the same pair set the cluster labels were built from
    val pairs = DedupOps.minhashPortable(spark, sf, threshold = 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dup pair ($a,$b) split across ${split(a)}/${split(b)}")
    }
    // both sides populated (the 2/16 hex rule keeps eval ~12.5%)
    assert(split.values.toSet == Set("train", "eval"))
  }

  test("temporalSplit: integer cutoff, inclusive train edge, embargo band") {
    val s = spark
    import s.implicits._
    // days 0..10, one event per day, one shared user plus a per-day
    // user: cutoff = 0 + (10-0)*70 div 100 = 7; embargo = days 8-9;
    // test = day 10
    val e = (0L to 10L).flatMap(d => Seq((1L, d), (100L + d, d)))
      .toDF("user_id", "day")
    val got = CurationOps.temporalSplitOn(e, trainPct = 70, embargoDays = 2)
      .collect().map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"))).toMap
    assert(got == Map(
      "train" -> (16L, 9L), // days 0..7: 8 shared + 8 daily users
      "embargo" -> (4L, 3L), // days 8,9
      "test" -> (2L, 2L))) // day 10
    // leakage guard: no test day at or below the embargo ceiling
    val split = CurationOps.temporalSplitOn(e).collect()
    assert(split.map(_.getAs[Long]("n_events")).sum == 22L)
  }

  test("c20: flags only cross-set near-dups, never within-set pairs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "eval", "alpha beta gamma delta epsilon zeta"),
      // exact duplicate of the eval doc, train side: every band
      // collides, jaccard = 1 — MUST be flagged
      (2L, "src1", "alpha beta gamma delta epsilon zeta"),
      // second exact duplicate, also train: flagged against eval 1,
      // but the (2,3) train-train pair must NOT appear
      (3L, "src2", "alpha beta gamma delta epsilon zeta"),
      // eval-side duplicate of doc 1: eval-eval pair must NOT appear
      (4L, "eval", "alpha beta gamma delta epsilon zeta"),
      // unrelated train doc: no flag
      (5L, "src1", "one two three four five six seven eight"))
      .toDF("doc_id", "source", "text")
    val got = CurationOps.neardupDecontamOn(docs, "eval", 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((2L, 1L, 1.0), (2L, 4L, 1.0),
      (3L, 1L, 1.0), (3L, 4L, 1.0)))
  }

  test("c22 token budget: inclusive ceiling, per-source, ingest order") {
    val s = spark
    import s.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, src, (1 to n).map(i => s"t$i").mkString(" "))
    val got = CurationOps.tokenBudgetMixOn(Seq(
      doc(1, "a", 5), doc(2, "a", 5), doc(3, "a", 5), // cum 5,10,15
      doc(4, "b", 5), doc(5, "b", 7), // cum 5,12 — 12 == budget kept
      doc(6, "c", 13)) // first doc already over: source fully dropped
      .toDF("doc_id", "source", "text"), budgetTokens = 12L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 5L, 2L -> 10L, 4L -> 5L, 5L -> 12L))
  }

  test("c21 report equals the c04/c20 signals rolled up to eval grain") {
    val sf = "/root/testdata/sf0.001"
    val exact = CurationOps.decontaminate(spark, sf).collect()
      .groupBy(_.getAs[Long]("eval_id"))
      .view.mapValues(_.map(_.getAs[Long]("train_id")).distinct.length.toLong)
      .toMap
    val near = CurationOps.neardupDecontam(spark, sf).collect()
      .groupBy(_.getAs[Long]("eval_id"))
      .view.mapValues(_.map(_.getAs[Long]("train_id")).distinct.length.toLong)
      .toMap
    val got = CurationOps.contaminationReport(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = (exact.keySet ++ near.keySet).map(k =>
      k -> (exact.getOrElse(k, 0L), near.getOrElse(k, 0L))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("c27 dsir: target-like raw docs outrank unlike; repeats count") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "tgt", "cat sat cat sat cat sat"),
      (2L, "tgt", "cat sat cat sat"),
      // raw pool: 10 repeats the target bigrams, 12 mixes, 11 has none
      (10L, "raw", "cat sat cat sat"),
      (11L, "raw", "dog ran dog ran"),
      (12L, "raw", "cat sat dog ran"))
      .toDF("doc_id", "source", "text")
    val all = CurationOps.dsirSelectOn(rows, target = "tgt", topN = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // only raw docs are scored; target-bigram mass orders them
    assert(all.keySet == Set(10L, 11L, 12L))
    assert(all(10L) > all(12L) && all(12L) > all(11L))
    // importance weights are log-ratios: target-like positive mass,
    // target-free strictly negative
    assert(all(10L) > 0 && all(11L) < 0)
    // the top-N cut keeps the best by (weight desc, doc_id)
    val top = CurationOps.dsirSelectOn(rows, target = "tgt", topN = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(10L, 12L))
  }

  test("c29 card equals the independent roll-up of its gated inputs") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "source",
        "size(split(text, ' ')) AS nt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val lang = TextOps.langIdModel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val score = TextOps.qualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rep = DedupOps.dedupReport(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val got = CurationOps.datasetCard(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getDouble(6)))
      .toMap
    assert(got.keySet == rep.keySet && got.nonEmpty)
    got.foreach { case (src, (nd, ntk, dups, cross, top, mean)) =>
      val ids = docs.filter(_._2 == src)
      assert((nd, dups, cross) == rep(src), src)
      assert(ntk == ids.map(_._3).sum, src)
      val modes = ids.map(d => lang(d._1)).groupBy(identity)
        .view.mapValues(_.length).toSeq
      val best = modes.sortBy { case (l, c) => (-c, l) }.head._1
      assert(top == best, src)
      val scores = ids.map(d => score(d._1))
      val want = BigDecimal(scores.sum / scores.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - want) <= 0.0001, src)
    }
    // srcOf is the id→source map the roll-ups above derive from
    assert(srcOf.size == docs.length)
  }

  test("c30 waterfill: small sources full, big ones clip to one level") {
    val s = spark
    import s.implicits._
    def run(rows: (String, Long)*) =
      CurationOps.waterfillOn(rows.toDF("source", "avail"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // total 15, budget 7: only the smallest is fully fundable
    // (4·2 = 8 > 7−2 = 5), clip level (7−2)/2 = 2
    val a = run("x" -> 2L, "y" -> 4L, "z" -> 9L)
    assert(a == Map("x" -> (2L, 2L, 1), "y" -> (4L, 2L, 0),
      "z" -> (9L, 2L, 0)))
    // total 12, budget 6: the two small sources keep everything,
    // the hub gets the exact remainder (sum == budget)
    val b = run("p" -> 1L, "q" -> 1L, "r" -> 10L)
    assert(b == Map("p" -> (1L, 1L, 1), "q" -> (1L, 1L, 1),
      "r" -> (10L, 4L, 0)))
    assert(b.values.map(_._2).sum == 6L)
  }
}
