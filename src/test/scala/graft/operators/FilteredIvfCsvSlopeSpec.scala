package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** s32 filtered IVF (label predicate binds; subset of the exact
  * filtered ranking), q143 malformed-CSV quarantine (plant rule
  * recovered exactly), g36 degree slope (two-point star closed
  * form). */
class FilteredIvfCsvSlopeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("s32: every neighbor carries the filter label; ranks contiguous") {
    val s = spark
    import s.implicits._
    val label1 = graft.sources.Tables.load(spark, sf, "embeddings")
      .filter("label = 1").select("vec_id").as[Long].collect().toSet
    val rows = SimilarityOps.ivfTopKFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => label1(r.getLong(2))),
      "all filtered-ANN neighbors must carry the label")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to ranks.length))
    }
  }

  test("q143: the quarantine split recovers the plant rule exactly") {
    val rows = graft.sources.SourceFormats.csvMalformed(spark, sf)
      .collect()
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .selectExpr("source", "doc_id % 41 = 0 AS bad").collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val planted = docs(r.getString(0))
      assert(r.getLong(1) == planted.count(!_.getBoolean(1)))
      assert(r.getLong(2) == planted.count(_.getBoolean(1)))
    }
  }

  test("g32i/g34i/g36i: edge-artifact serving equals the inline gate forms") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(GraphOps.richClubFromEdges(spark, sf)) ==
      rows(GraphOps.queries("g32_rich_club")(spark, sf)))
    assert(rows(GraphOps.featurePropagationFromEdges(spark, sf)) ==
      rows(GraphOps.queries("g34_feature_propagation")(spark, sf)))
    assert(rows(GraphOps.degreeSlopeFromEdges(spark, sf)) ==
      rows(GraphOps.degreeSlope(spark, sf)))
  }

  test("g36: a star's two-point degree histogram fits slope -1") {
    val s = spark
    import s.implicits._
    val star = (2L to 5L).map(i => (1L, i)).toDF("a", "b")
    val r = GraphOps.degreeSlopeOn(star).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == -1.0)
  }
}
