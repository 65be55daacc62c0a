package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d22 soft-dedup weights (cluster mass sums to 1, full corpus
  * coverage, d08 consistency) and m14 mime sniffing (planted
  * magic-vs-declaration classes land where the fixture puts them). */
class SoftDedupMimeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("d22: every doc weighted once; cluster mass ≈ 1; d08 labels agree") {
    val rows = DedupOps.softDedupWeights(spark, sf).collect()
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.length == nDocs, "one weight row per corpus doc")
    assert(rows.map(_.getLong(0)).distinct.length == nDocs)
    // per-cluster weight mass = size * round(1/size, 6) ≈ 1
    rows.groupBy(_.getLong(1)).foreach { case (_, members) =>
      val mass = members.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"cluster mass $mass")
      assert(members.map(_.getLong(2)).distinct.length == 1)
      assert(members.head.getLong(2) == members.length)
    }
    // docs inside d08 components carry the d08 label
    val d08 = DedupOps.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      d08.get(r.getLong(0)).foreach(lbl => assert(r.getLong(1) == lbl))
    }
    // singleton weight is exactly 1
    rows.filter(_.getLong(2) == 1L).foreach(r => assert(r.getDouble(3) == 1.0))
  }

  test("d24: every planted variant family forms one 3-member group") {
    val groups = DedupOps.canonicalDedup(spark, sf).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap // keeper -> n_docs
    val nBases = graft.sources.Tables.load(spark, sf, "documents")
      .filter("doc_id % 50 = 0").count()
    assert(nBases > 0 && groups.size == nBases,
      s"expected $nBases planted families, got ${groups.size}")
    groups.foreach { case (keeper, n) =>
      assert(keeper % 50 == 0, "keeper is the min-id clean doc")
      assert(n == 3L, "base + uppercase + punctuated variant")
    }
  }

  test("d22: the sigs-served form equals the inline gate form") {
    val inline = DedupOps.softDedupWeights(spark, sf).collect()
      .map(_.toSeq).toSet
    val served = DedupOps.softDedupWeightsFromSigs(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(inline == served && inline.nonEmpty)
  }

  test("m14: planted magic classes sniff correctly; only OggS-vs-wav mismatches") {
    val rows = MultimodalOps.mimeSniff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, declared, sniffed, ok) =>
      (id % 5) match {
        case 0 =>
          assert(sniffed == "image/x-portable-pixmap" && ok)
        case 1 =>
          assert(sniffed == "audio/wav" && ok)
        case 2 => // planted contradiction: declared wav, bytes Ogg
          assert(declared == "audio/wav" && sniffed == "audio/ogg" && !ok)
        case _ =>
          assert(sniffed == "application/octet-stream" && ok)
      }
    }
    assert(rows.exists(_._1 % 5 == 2), "fixture must plant the mismatch class")
  }
}
