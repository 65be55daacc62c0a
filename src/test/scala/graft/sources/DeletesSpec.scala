package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The takedown contract: the merge-on-read (v2) and copy-on-write
  * (v3) reads both equal the table minus the takedown keys; v1 time
  * travel stays byte-stable across both commits; the CoW rewrite
  * touches ONLY affected files; and vacuum keeps every retained
  * version readable — superseded bytes drop only when v1/v2 retire. */
class DeletesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "source", "lang", "n_chars")
      .collect().map(_.toSeq).toSet

  test("merge-on-read and copy-on-write both equal table minus keys") {
    val dir = Deletes.writeTakedownVersions(spark, sfDir)
    val base = Tables.load(spark, sfDir, "documents")
    val want = rows(base.filter(col("doc_id") % Deletes.TakedownMod =!= 0))
    val all = rows(base)
    assert(want.nonEmpty && want != all,
      "fixture must actually take down some rows")
    assert(rows(Deletes.readAt(spark, dir, 2)) == want, "v2 merge-on-read")
    assert(rows(Deletes.readAt(spark, dir, 3)) == want, "v3 copy-on-write")
    // v1 time travel is untouched by both commits
    assert(rows(Deletes.readAt(spark, dir, 1)) == all, "v1 history intact")
  }

  test("incremental v3 stats equal a full rebuild, reusing v1 rows") {
    val dir = Deletes.writeTakedownVersions(spark, sfDir)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val inc = key(Deletes.statsManifestAt(spark, sfDir, 3))
    val full = key(ZoneMap.buildManifestFiles(
        spark, Deletes.filesOf(spark, dir, 3),
        Seq("n_chars"))
      .withColumn("file", org.apache.spark.sql.functions
        .element_at(org.apache.spark.sql.functions
          .split(org.apache.spark.sql.functions.col("file"), "/"), -1)))
    assert(inc.nonEmpty && inc == full,
      "O(affected) refresh must equal the full rebuild")
    // the unaffected files' stats rows are the v1 ARTIFACT's rows —
    // the increment never re-scanned them
    val v1 = key(Deletes.statsManifestAt(spark, sfDir, 1))
    val shared = inc.keySet & v1.keySet
    assert(shared.nonEmpty, "CoW must keep some unaffected files")
    shared.foreach(f => assert(inc(f) == v1(f), s"$f was re-scanned"))
    // v2 serves v1's stats (upper bounds under equality deletes)
    assert(key(Deletes.statsManifestAt(spark, sfDir, 2)) == v1)
  }

  test("positional deletes: merge-on-read, CoW, and equality all agree") {
    val dir = Deletes.writeTakedownPositionalVersions(spark, sfDir)
    val base = Tables.load(spark, sfDir, "documents")
    val want = rows(base.filter(col("doc_id") % Deletes.TakedownMod =!= 0))
    assert(rows(Deletes.readAtPos(spark, dir, 2)) == want,
      "v2 positional merge-on-read")
    assert(rows(Deletes.readAtPos(spark, dir, 3)) == want,
      "v3 positional copy-on-write")
    assert(rows(Deletes.readAtPos(spark, dir, 1)) == rows(base),
      "v1 history intact")
    // the two delete FORMS of the same offenders agree exactly
    val eqDir = Deletes.writeTakedownVersions(spark, sfDir)
    assert(rows(Deletes.readAt(spark, eqDir, 2)) == want)
    // the position manifest is (file, pos) pairs, one per offender —
    // the locating scan ran once; nothing is keyed
    val dels = spark.read.parquet(Deletes.posDeletesPath(dir, 2))
    assert(dels.columns.toSet == Set("file", "pos"))
    assert(dels.count() ==
      base.filter(col("doc_id") % Deletes.TakedownMod === 0).count())
  }

  test("positional CoW rewrites only affected files; vacuum honors retention") {
    val s = spark
    import s.implicits._
    val dir = FsUtil.qualified("target/tmp/deletes/spec_fixture_pos")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(dir), true)
    (1 to 3).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(
        Deletes.manifestPath(dir, v)), true)
      f.delete(new org.apache.hadoop.fs.Path(
        Deletes.posDeletesPath(dir, v)), true)
    }
    val base = (1L to 60L).map(i =>
      (i, s"src${i % 3}", "en", i * 10)).toDF(
      "doc_id", "source", "lang", "n_chars")
    Deletes.commitChainPositional(spark, dir, base,
      col("doc_id") % Deletes.TakedownMod === 0)
    def names(v: Int): Set[String] =
      spark.read.parquet(Deletes.manifestPath(dir, v))
        .select("file").collect().map(_.getString(0)).toSet
    val v1n = names(1); val v3n = names(3)
    assert((v1n & v3n).nonEmpty, "CoW must keep unaffected files")
    assert((v3n -- v1n).nonEmpty && (v1n -- v3n).nonEmpty,
      "CoW must replace the affected files")
    assert(Deletes.vacuumRetaining(spark, dir, Seq(1, 2, 3)).isEmpty)
    assert(Deletes.readAtPos(spark, dir, 1).count() == 60)
    assert(Deletes.readAtPos(spark, dir, 2).count() == 59)
    val dropped = Deletes.vacuumRetaining(spark, dir, Seq(3))
    assert(dropped.toSet == (v1n -- v3n), "vacuum drops only superseded")
    assert(Deletes.readAtPos(spark, dir, 3).count() == 59)
  }

  test("CoW rewrites only affected files; vacuum honors retention") {
    val s = spark
    import s.implicits._
    // the spec owns this fixture (the gate artifact must stay intact
    // for Verify): 60 docs in 8 files, takedown = doc_id % 53 == 0
    val dir = FsUtil.qualified("target/tmp/deletes/spec_fixture")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(dir), true)
    (1 to 3).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(
        Deletes.manifestPath(dir, v)), true)
    }
    val base = (1L to 60L).map(i =>
      (i, s"src${i % 3}", "en", i * 10)).toDF(
      "doc_id", "source", "lang", "n_chars")
    Deletes.commitChain(spark, dir, base,
      base.filter(col("doc_id") % Deletes.TakedownMod === 0)
        .select("doc_id"))
    def names(v: Int): Set[String] =
      spark.read.parquet(Deletes.manifestPath(dir, v))
        .select("file").collect().map(_.getString(0)).toSet
    val v1n = names(1)
    val v3n = names(3)
    // the rewrite replaced SOME files (the ones holding key 53) and
    // kept the rest byte-identical — file-level CoW, not a full pass
    val kept = v1n & v3n
    assert(kept.nonEmpty, "CoW must keep unaffected files")
    assert((v3n -- v1n).nonEmpty && (v1n -- v3n).nonEmpty,
      "CoW must replace the affected files")
    // retention=all: nothing to vacuum, every version still readable
    assert(Deletes.vacuumRetaining(spark, dir, Seq(1, 2, 3)).isEmpty)
    assert(Deletes.readAt(spark, dir, 1).count() == 60)
    assert(Deletes.readAt(spark, dir, 2).count() == 59)
    // retire v1/v2: exactly the superseded originals drop, and the
    // surviving latest version still reads correctly
    val dropped = Deletes.vacuumRetaining(spark, dir, Seq(3))
    assert(dropped.toSet == (v1n -- v3n), "vacuum drops only superseded")
    assert(Deletes.readAt(spark, dir, 3).count() == 59)
  }
}
