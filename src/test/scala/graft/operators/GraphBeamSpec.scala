package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s34 graph-beam ANN: monotone beam improvement in the step dial,
  * determinism, and navigation quality vs the brute ranking on the
  * entry's component. */
class GraphBeamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

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

  private def best(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getDouble(3)).max).toMap

  test("deeper walks never lose similarity (incumbent-best beams)") {
    val s2 = best(SimilarityOps.graphBeamAnn(spark, sf, steps = 2))
    val s6 = best(SimilarityOps.graphBeamAnn(spark, sf, steps = 6))
    s2.keys.foreach { q =>
      assert(s6(q) >= s2(q) - 1e-9,
        s"query $q: 6-step best ${s6(q)} below 2-step best ${s2(q)}")
    }
  }

  test("deterministic across runs; ranks contiguous; self excluded") {
    val a = SimilarityOps.graphBeamAnn(spark, sf).collect()
    val b = SimilarityOps.graphBeamAnn(spark, sf).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet && a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getLong(2) != q))
    }
  }

  // Per-query recall@5 of an approx frame against the brute truth.
  private def recall5(approx: org.apache.spark.sql.DataFrame)
      : Map[Long, Double] =
    SimilarityOps.annRecallOn(
        SimilarityOps.bruteForceTopK(spark, sf, nQueries = 5, k = 5),
        approx)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("multi-entry recall >= single-entry recall, per query") {
    val single = recall5(SimilarityOps.graphBeamAnn(spark, sf))
    val multi = recall5(SimilarityOps.graphBeamAnnMulti(spark, sf))
    assert(single.keySet == multi.keySet && single.nonEmpty)
    single.keys.foreach { q =>
      assert(multi(q) >= single(q) - 1e-9,
        s"query $q: multi-entry recall ${multi(q)} below " +
          s"single-entry ${single(q)}")
    }
    // and the seeds buy something in aggregate, not just tie
    assert(multi.values.sum >= single.values.sum)
  }

  test("batched 2-hop rounds: recall holds in aggregate vs the classic " +
      "walk (the r15 barrier experiment's quality half)") {
    // WITHIN one batched round the classic round-pair's candidates are
    // a subset of the batched round's, but after the first beam trim
    // the two walks' frontiers diverge, so later rounds are NOT
    // supersets — strict per-query dominance is data-dependent, not
    // structural (ADVICE r15; it held on every generation so far, and
    // at sf0.1 batching bridges a reciprocity-pruned gap, 0.2 → 0.6 on
    // query 3 — EXPERIMENT_r15 §6). Pin the contract that IS stable:
    // aggregate recall within one truth-hit (1/k per query) of
    // classic, and no query losing more than it could trade for. The
    // TIMING half is the recorded negative inline; s38 serves the
    // stored artifact instead.
    val classic = recall5(SimilarityOps.graphBeamAnnMulti(spark, sf))
    val batched = recall5(SimilarityOps.graphBeamAnnMultiBatched(spark, sf))
    assert(classic.keySet == batched.keySet && classic.nonEmpty)
    val eps = 0.2 + 1e-9 // one truth hit at k=5
    classic.keys.foreach { q =>
      assert(batched(q) >= classic(q) - eps,
        s"query $q: batched recall ${batched(q)} more than one hit " +
          s"below classic ${classic(q)}")
    }
    assert(batched.values.sum >= classic.values.sum - 1e-9,
      s"aggregate batched recall ${batched.values.sum} fell below " +
        s"classic ${classic.values.sum}")
  }

  test("s38: serving from the stored 1∪2-hop artifact equals the " +
      "inline batched walk; classic-served equals inline classic") {
    // the artifact is the INDEX-LAYOUT answer to the r15 negative
    // (inline e⋈e build ate the barrier savings): navigation must be
    // IDENTICAL — same entries, rounds, scores — only the edge frame's
    // provenance changes (stored parquet vs in-session build)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val inline = rows(SimilarityOps.graphBeamAnnMultiBatched(spark, sf))
    val served = rows(SimilarityOps.graphBeamAnnBatchedServed(spark, sf))
    assert(served == inline, "stored-artifact serve diverged from inline")
    val inlineC = rows(SimilarityOps.graphBeamAnnMulti(spark, sf))
    val servedC = rows(SimilarityOps.graphBeamAnnMultiServed(spark, sf))
    assert(servedC == inlineC, "classic serve diverged from inline")
    // and the artifact actually exists on disk for reuse
    assert(graft.sources.FsUtil.exists(spark,
      SimilarityOps.beamHop2EdgesPath(spark, sf) + "/_SUCCESS"))
  }

  test("s38 recall contract: aggregate recall@5 of the stored-artifact " +
      "batched serve holds vs the classic walk") {
    val classic = recall5(SimilarityOps.graphBeamAnnMulti(spark, sf))
    val served = recall5(SimilarityOps.graphBeamAnnBatchedServed(spark, sf))
    assert(classic.keySet == served.keySet && classic.nonEmpty)
    assert(served.values.sum >= classic.values.sum - 1e-9,
      s"aggregate served recall ${served.values.sum} fell below " +
        s"classic ${classic.values.sum}")
  }

  test("s45: hop2DeltaUpdate is an IDENTITY — the maintained 2-hop " +
      "frame equals the from-scratch rebuild over the updated graph") {
    // 2hop(e ∪ Δ) = H ∪ Δ ∪ e⋈Δ ∪ Δ⋈e ∪ Δ⋈Δ is algebra, but the
    // implementation must get the column routing and self-loop/
    // distinct handling right — pin frame equality on a real split
    val s = spark
    import org.apache.spark.sql.functions.{col, expr}
    val all = spark.read.parquet(sf + "/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
    // a small synthetic edge split: base = mutual-kNN over vec_id<300,
    // delta = a handful of new symmetric links touching both sides
    val base = GraphOps.mutualKnnEdgesOn(all.filter(col("vec_id") < 300))
    val e = base.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(base.select(col("b").as("src"), col("a").as("dst")))
    import s.implicits._
    val deltaPairs = Seq((301L, 5L), (302L, 17L), (301L, 302L))
    val delta = deltaPairs.toDF("src", "dst")
      .unionAll(deltaPairs.map(p => (p._2, p._1)).toDF("src", "dst"))
    def hop2(edges: org.apache.spark.sql.DataFrame) =
      edges.unionAll(
        edges.select(col("src"), col("dst").as("mid"))
          .join(edges.select(col("src").as("mid"), col("dst")), "mid")
          .select("src", "dst"))
        .filter(col("src") =!= col("dst")).distinct()
    val full = hop2(e.unionAll(delta))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maintained = SimilarityOps.hop2DeltaUpdate(hop2(e), e, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == full,
      s"maintained frame diverged: only-in-full=${(full -- maintained).take(5)} " +
        s"only-in-maintained=${(maintained -- full).take(5)}")
  }

  test("s45: the delta-batched serve matches the inline batched walk " +
      "over the updated graph; deterministic") {
    val out = SimilarityOps.graphBeamDeltaBatchedServed(spark, sf)
    val rows = out.collect().map(_.toSeq).toSet
    assert(rows.nonEmpty)
    val again = SimilarityOps.graphBeamDeltaBatchedServed(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(again == rows, "delta-batched serve must be deterministic")
    // recall contract vs the classic delta serve, aggregate form
    val classic = recall5(SimilarityOps.graphBeamDeltaInsert(spark, sf))
    val batched = recall5(SimilarityOps.graphBeamDeltaBatchedServed(spark, sf))
    assert(classic.keySet == batched.keySet && classic.nonEmpty)
    assert(batched.values.sum >= classic.values.sum - 0.2 - 1e-9,
      s"aggregate delta-batched recall ${batched.values.sum} fell more " +
        s"than one hit below classic ${classic.values.sum}")
  }

  test("s37 recall contract: delta-inserted graph >= full rebuild, per query") {
    val rebuilt = recall5(SimilarityOps.graphBeamAnnMulti(spark, sf))
    val delta = recall5(SimilarityOps.graphBeamDeltaInsert(spark, sf))
    assert(rebuilt.keySet == delta.keySet && rebuilt.nonEmpty)
    rebuilt.keys.foreach { q =>
      assert(delta(q) >= rebuilt(q) - 1e-9,
        s"query $q: delta-insert recall ${delta(q)} below " +
          s"rebuilt ${rebuilt(q)}")
    }
  }

  test("s37 deterministic; ranks contiguous; self excluded") {
    val a = SimilarityOps.graphBeamDeltaInsert(spark, sf).collect()
    val b = SimilarityOps.graphBeamDeltaInsert(spark, sf).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet && a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getLong(2) != q))
    }
    // delta vertices are REACHABLE: some result names an inserted
    // (vec_id % 7 == 3) neighbor, else insertion wired nothing
    assert(a.exists(_.getLong(2) % 7 == 3),
      "no delta vertex ever surfaces in the served top-k")
  }

  test("s37i: serving from the stored base-edge artifact equals inline") {
    val inline = SimilarityOps.graphBeamDeltaInsert(spark, sf)
      .collect().map(_.toSeq).toSet
    val served = SimilarityOps.graphBeamDeltaServed(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served == inline && served.nonEmpty,
      "the production twin must serve the gate form's exact answer")
  }

  test("graphRebuildNeeded triggers on the delta share") {
    val verts = spark.createDataFrame(
      (0L until 70L).map(i => (i, i % 7 == 3)))
      .toDF("vec_id", "is_delta")
    val below = SimilarityOps.graphRebuildNeeded(verts, threshold = 0.2)
      .collect().head
    assert(below.getLong(0) == 70 && below.getLong(1) == 10 &&
      !below.getBoolean(3), s"1/7 delta under 0.2 must not trigger: $below")
    val above = SimilarityOps.graphRebuildNeeded(verts, threshold = 0.1)
      .collect().head
    assert(above.getBoolean(3), "1/7 delta over a 0.1 threshold must trigger")
  }

  test("multi-entry deterministic; entries=1 matches s34's shape") {
    val a = SimilarityOps.graphBeamAnnMulti(spark, sf).collect()
    val b = SimilarityOps.graphBeamAnnMulti(spark, sf).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet && a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getLong(2) != q))
    }
  }
}
