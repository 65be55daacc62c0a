package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t18 model-table language ID: real sentences in each profiled
  * language must classify correctly, ties and unknowns must be
  * deterministic, and c24's derived-lang temperature mix must flatten
  * toward the rarest DETECTED language. */
class LangIdModelSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def multilingual = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox is jumping over one of the lazy dogs"),
      (2L, "der schnelle braune fuchs springt und ich sehe die schule"),
      (3L, "el zorro marrón ha saltado sobre los perros que el niño adora"),
      (4L, "le renard rapide saute par dessus les chiens qui mangent leur pain"),
      (5L, "我是一个学生 我的书在这里 我有很多朋友"),
      (6L, "xxxx yyyy zzzz qqqq"))
      .toDF("doc_id", "text")
  }

  test("recovers the true language of real sentences in all five profiles") {
    val got = TextOps.langIdModelOn(multilingual)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got(1L)._1 === "en")
    assert(got(2L)._1 === "de")
    assert(got(3L)._1 === "es")
    assert(got(4L)._1 === "fr")
    assert(got(5L)._1 === "zh")
    // every detected doc carries a positive integer score
    (1L to 5L).foreach(id => assert(got(id)._2 > 0L))
    // no profile gram at all → the deterministic 'und' fallback, score 0
    assert(got(6L) === ("und", 0L))
  }

  test("argmax tie-break is the lexicographically smaller language") {
    val s = spark
    import s.implicits._
    // 'que' carries weight 1 in BOTH es and fr — a doc whose only
    // profile hit is 'que' ties es/fr and must land on 'es'
    val d = Seq((1L, "quq quq que")).toDF("doc_id", "text")
    val got = TextOps.langIdModelOn(d).collect().head
    assert(got.getString(1) === "es")
    assert(got.getLong(2) === 1L)
  }

  test("c25 pipeline = mix output minus the contaminated train docs") {
    val sf = "/root/testdata/sf0.001"
    val piped = CurationOps.multilingualPipeline(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val mixed = CurationOps.temperatureMixLangid(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val contam = DedupOps.substringCrossOverlapOn(
        org.apache.spark.sql.SparkSession.active.read
          .parquet(s"$sf/documents.parquet"), "src0")
      .collect().map(_.getLong(0)).toSet
    assert(piped === mixed.diff(contam))
    assert(piped.intersect(contam).isEmpty)
    // the decontamination stage BINDS on this fixture: at least one
    // mixed doc is contaminated and actually dropped
    assert(mixed.intersect(contam).nonEmpty)
  }

  test("c24's mix flattens toward the rarest detected language") {
    val s = spark
    import s.implicits._
    // 40 English docs vs 5 Chinese: after √-temperature flattening the
    // en keep-rate is √(5/40) ≈ 0.354 while zh keeps everything, so
    // the en:zh ratio must compress from 8:1 to at most ~4:1
    val en = (0 until 40).map(i =>
      (i.toLong, s"the cat $i is jumping over one of the dogs"))
    val zh = (100 until 105).map(i => (i.toLong, "我的书在这里 我有朋友"))
    val d = (en ++ zh).toDF("doc_id", "text")
    val mixed = CurationOps.temperatureMixOn(
        TextOps.langIdModelOn(d)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("lang").as("source")))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed("zh") === 5L, s"zh (rarest) must keep all: $mixed")
    assert(mixed("en") < 40L && mixed("en") >= 5L,
      s"en must be damped but not emptied: $mixed")
    assert(mixed("en").toDouble / mixed("zh") <= 4.5,
      s"8:1 raw ratio must compress: $mixed")
  }

  test("t24 fertility equals the roll-up of t18 × t02 × t06 outputs") {
    val sf = "/root/testdata/sf0.001"
    val lang = TextOps.langIdModel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nt = TextOps.tokenCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val ns = TextOps.subwordCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val want = lang.keys.toSeq.groupBy(lang).view.mapValues { ids =>
      val (t, s) = (ids.map(nt).sum, ids.map(ns).sum)
      (ids.size.toLong, t, s, BigDecimal(s.toDouble / t)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = TextOps.fertilityByLang(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got == want && got.nonEmpty)
    // fixed-4 segmentation can never split below one subword per word
    assert(got.values.forall(_._4 >= 1.0))
  }

  test("t25 margin: top1−top2 of the t18 scores, und for no-match") {
    val got = TextOps.langIdMarginOn(multilingual).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    // same argmax as t18 on every doc
    val t18 = TextOps.langIdModelOn(multilingual).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    got.foreach { case (id, (lang, score, _)) =>
      assert((lang, score) == t18(id), s"doc $id")
    }
    // margin recomputed independently from the raw score table
    val sc = TextOps.langGramScores(multilingual).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    got.foreach { case (id, (_, _, margin)) =>
      val want = sc.get(id).map { rows =>
        val sorted = rows.sortBy(t => (-t._3, t._2)).map(_._3)
        sorted.head - (if (sorted.length > 1) sorted(1) else 0L)
      }.getOrElse(0L)
      assert(margin == want, s"doc $id")
    }
    // the gibberish doc matches nothing: und, zero margin
    assert(got(6L) == ("und", 0L, 0L))
    // real sentences decide with positive margin
    assert(got(1L)._3 > 0 && got(5L)._3 > 0)
  }
}
