package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t19 multi-merge BPE training: merge selection must follow weighted
  * counts with the (cnt desc, s1, s2) tie-break, application must be
  * leftmost-non-overlapping, and merged symbols must participate in
  * later rounds (the chaining that makes it TRAINING, not counting). */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def train(texts: Seq[String], merges: Int) = {
    val s = spark
    import s.implicits._
    TokenizerOps.bpeTrainOn(texts.toDF("text"), merges)
      .orderBy("merge_round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
  }

  test("merges chain: round 2 extends round 1's merged symbol") {
    // "abc" x3: round 1 merges (a,b) [counts: ab=3, bc=3, tie -> (a,b)];
    // round 2 must see the MERGED symbol and merge (ab, c)
    val got = train(Seq("abc abc abc"), 2)
    assert(got(0) === ((1, "a", "b", 3L)))
    assert(got(1) === ((2, "ab", "c", 3L)))
  }

  test("leftmost-non-overlapping application on same-symbol runs") {
    // "aaaa": pairs (a,a) count 3 BUT application merges positions
    // 1-2 and 3-4 only; round 2 then sees ("aa","aa") count 1.
    // "aaa": merges 1-2, leaves the trailing "a" -> round 2 pair
    // ("aa","a"). Corpus of one word each: round-2 top pair must be
    // the deterministic (aa,a) vs (aa,aa) tie-break on count 1 ->
    // s2 'a' < 'aa' picks ("aa","a").
    val got = train(Seq("aaaa aaa"), 2)
    assert(got(0) === ((1, "a", "a", 5L)))
    assert(got(1)._1 === 2)
    assert(got(1)._2 === "aa")
    assert(got(1)._3 === "a", s"tie must break to smaller s2: $got")
    assert(got(1)._4 === 1L)
  }

  test("counts are word-frequency weighted") {
    // "xy" appears 5 times as a word, "yz" twice inside rarer words:
    // (x,y) must win with weight 5
    val got = train(Seq("xy xy xy xy xy ayz byz"), 1)
    assert(got(0) === ((1, "x", "y", 5L)))
  }

  test("tie-break picks the lexicographically smallest pair") {
    // "cd" and "ab" both count 2 -> (a,b) wins on s1
    val got = train(Seq("cd ab cd ab"), 1)
    assert(got(0) === ((1, "a", "b", 2L)))
  }

  test("encode applies the trained merges: token counts shrink by the merge hits") {
    val s = spark
    import s.implicits._
    // corpus "abc abc abc de": merge 1 = (a,b) cnt 3, merge 2 =
    // (ab,c) cnt 3. Encoded: "abc" -> 1 symbol, "de" -> 2 symbols.
    // doc tokens: 3 words, chars 3+3+3+2=11, bpe 1+1+1+2 = 5... one
    // doc with all four words:
    val d = Seq((7L, "abc abc abc de")).toDF("doc_id", "text")
    val got = TokenizerOps.bpeEncodeOn(d, merges = 2).collect().head
    assert(got.getLong(0) === 7L)
    assert(got.getLong(1) === 4L)  // n_words
    assert(got.getLong(2) === 11L) // n_chars (pre-merge symbols)
    assert(got.getLong(3) === 5L)  // 3x"abc"->1 sym + "de"->2 syms
  }
}
