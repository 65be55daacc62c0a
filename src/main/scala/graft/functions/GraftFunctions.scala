package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration of the graft native expressions, two ways:
  *
  *  1. [[GraftFunctions.register]] — imperative, on an existing session
  *    (idempotent; operators call it before using `expr("graft_...")`).
  *  2. [[GraftExtensions]] — `spark.sql.extensions=graft.functions.GraftExtensions`
  *    for deployments that want the functions (and later, optimizer
  *    rules) available in every session from the start.
  */
object GraftFunctions {

  private def minhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sh, Literal(k: Int, _)) => MinHashSig(sh, k)
    case Seq(sh) => MinHashSig(sh, 32)
    case _ => throw new IllegalArgumentException(
      "graft_minhash(shingles array<string>[, k literal int])")
  }

  private def cosineBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => CosineSim(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_cosine(a array<double>, b array<double>)")
  }

  private def shinglesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text, Literal(k: Int, _)) => WordShingles(text, k)
    case _ => throw new IllegalArgumentException(
      "graft_shingles(text string, k literal int)")
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(toks) => SimHash64(toks)
    case _ => throw new IllegalArgumentException(
      "graft_simhash(tokens array<string>)")
  }

  private def lshSigsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, Literal(t: Int, _), Literal(p: Int, _)) => HyperplaneSigs(v, t, p)
    case _ => throw new IllegalArgumentException(
      "graft_lsh_sigs(v array<double>, tables literal int, planes literal int)")
  }

  private def portableSigsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, Literal(t: Int, _), Literal(p: Int, _)) => PortableSigs(v, t, p)
    case _ => throw new IllegalArgumentException(
      "graft_portable_sigs(v array<double>, tables literal int, planes literal int)")
  }

  private def nearestCentsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, cents, Literal(n: Int, _)) => NearestCentroids(v, cents, n)
    case _ => throw new IllegalArgumentException(
      "graft_nearest_cents(v array<double>, cents array<array<double>>, n literal int)")
  }

  private def zvalueBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(x, y) => ZValue(x, y)
    case _ => throw new IllegalArgumentException(
      "graft_zvalue(x bigint, y bigint)")
  }

  private def cmsQueryBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sketch, key) => CmsQuery(sketch, key)
    case _ => throw new IllegalArgumentException(
      "graft_cms_query(sketch binary, key string)")
  }

  private def cmsMergeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sketch) => CmsMerge(sketch)
    case _ => throw new IllegalArgumentException(
      "graft_cms_merge(sketch binary)")
  }

  // sizing args arrive as any foldable numeric (a plain literal, a
  // CAST around one, a decimal like 0.01) — fold to the value here
  private def foldNum(e: Expression): Option[Any] =
    if (e.foldable) Option(e.eval()) else None

  private def bloomAggBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(key, nExpr, fppExpr) =>
      val n = foldNum(nExpr).map {
        case l: Long => l
        case i: Int => i.toLong
        case o => throw new IllegalArgumentException(
          s"graft_bloom_agg expectedItems must be integral, got $o")
      }
      val fpp = foldNum(fppExpr).map {
        case d: Double => d
        case f: Float => f.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case o => throw new IllegalArgumentException(
          s"graft_bloom_agg fpp must be numeric, got $o")
      }
      (n, fpp) match {
        case (Some(nn), Some(p)) => BloomAgg(key, nn, p)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(key string, expectedItems literal long, fpp literal double)")
      }
    case _ => throw new IllegalArgumentException(
      "graft_bloom_agg(key string, expectedItems literal long, fpp literal double)")
  }

  private def bloomContainsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sketch, key) => BloomContains(sketch, key)
    case _ => throw new IllegalArgumentException(
      "graft_bloom_contains(sketch binary, key string)")
  }

  private def topkBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(score, payload, Literal(k: Int, _)) => TopKAgg(score, payload, k)
    case _ => throw new IllegalArgumentException(
      "graft_topk(score double, payload bigint, k literal int)")
  }

  private def topkDistinctBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(score, payload, Literal(k: Int, _)) =>
      TopKAgg(score, payload, k, distinctPayload = true)
    case _ => throw new IllegalArgumentException(
      "graft_topk_distinct(score double, payload bigint, k literal int)")
  }

  private def charCodesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s) => CharCodes(s)
    case _ => throw new IllegalArgumentException(
      "graft_char_codes(s string)")
  }

  private def charGramsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s, n) => CharGrams(s, n)
    case _ => throw new IllegalArgumentException(
      "graft_char_grams(s string, n literal int)")
  }

  private def dist2Builder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => SqDist(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_dist2(a array<double>, b array<double>)")
  }

  private def pqCodesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, cents, Literal(m: Int, _)) => PqCodes(v, cents, m)
    case _ => throw new IllegalArgumentException(
      "graft_pq_codes(v array<double>, cents array<array<double>>, m literal int)")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      minhashBuilder _),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      cosineBuilder _),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      shinglesBuilder _),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      simhashBuilder _),
    (FunctionIdentifier("graft_lsh_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "graft_lsh_sigs"),
      lshSigsBuilder _),
    (FunctionIdentifier("graft_portable_sigs"),
      new ExpressionInfo(classOf[PortableSigs].getName, "graft_portable_sigs"),
      portableSigsBuilder _),
    (FunctionIdentifier("graft_nearest_cents"),
      new ExpressionInfo(classOf[NearestCentroids].getName, "graft_nearest_cents"),
      nearestCentsBuilder _),
    (FunctionIdentifier("graft_pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "graft_pq_codes"),
      pqCodesBuilder _),
    (FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "graft_zvalue"),
      zvalueBuilder _),
    (FunctionIdentifier("graft_cms_query"),
      new ExpressionInfo(classOf[CmsQuery].getName, "graft_cms_query"),
      cmsQueryBuilder _),
    (FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[CmsMerge].getName, "graft_cms_merge"),
      cmsMergeBuilder _),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
      bloomAggBuilder _),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      bloomContainsBuilder _),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      topkBuilder _),
    (FunctionIdentifier("graft_topk_distinct"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk_distinct"),
      topkDistinctBuilder _),
    (FunctionIdentifier("graft_char_codes"),
      new ExpressionInfo(classOf[CharCodes].getName, "graft_char_codes"),
      charCodesBuilder _),
    (FunctionIdentifier("graft_char_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "graft_char_grams"),
      charGramsBuilder _),
    (FunctionIdentifier("graft_dist2"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_dist2"),
      dist2Builder _))

  /** Idempotent imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point: native functions + the in-optimizer
  * DPccp join reordering (disable the latter at runtime with
  * `SET spark.graft.joinReorder.enabled=false`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    // the rule builder runs once per session when the optimizer is
    // built — the hook point for per-session listener registration
    // (SparkSessionExtensions has no listener injection surface);
    // harvesting stays gated by spark.graft.feedback.auto
    ext.injectOptimizerRule { session =>
      FeedbackListener.ensureRegistered(session)
      graft.plans.SelfJoinElimination()
    }
    ext.injectOptimizerRule(_ => graft.plans.OuterJoinRemoval())
    ext.injectOptimizerRule(_ => graft.plans.GraftJoinReorder())
    // estimate-backed partial-agg pushdown; ON by default after the
    // 361-entry differential check, disabled via
    // spark.graft.eagerAgg.enabled=false (q157/q158 gate it)
    ext.injectOptimizerRule(_ => graft.plans.EagerAggregation())
  }
}
