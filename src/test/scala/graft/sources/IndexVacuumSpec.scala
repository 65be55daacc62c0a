package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Index-artifact vacuum (s54): epoch supersession on disk. The spec
  * works in an ISOLATED root (never the real target/tmp/graph) so it
  * can plant epochs freely: liveness = newest per logical key, only
  * strictly-older fingerprints delete, non-convention directories are
  * invisible to the tool, and the pass is idempotent. */
class IndexVacuumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = "target/tmp/ivactest/graph"

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

  private def fs = new Path(FsUtil.qualified(root))
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def plant(name: String, mtime: Long): Unit = {
    val dir = new Path(FsUtil.qualified(root), name)
    fs.mkdirs(dir)
    val f = new Path(dir, "part-00000.parquet")
    val out = fs.create(f, true)
    out.write(Array.fill(64)(7.toByte)); out.close()
    fs.setTimes(f, mtime, -1)
  }

  test("supersession: the older fingerprint of a group is stale, the " +
      "newest lives, single-epoch groups and non-convention dirs are " +
      "safe; run deletes exactly the stale set and is idempotent") {
    fs.delete(new Path(FsUtil.qualified(root)), true)
    val t0 = System.currentTimeMillis() - 60000
    plant("beamx_sf0_001_n500_aaaa1111", t0)          // superseded
    plant("beamx_sf0_001_n500_bbbb2222", t0 + 30000)  // newest -> live
    plant("tombx_sf0_001_n500_m41_cccc3333", t0)      // single epoch
    plant("notanartifact", t0)                        // no fp suffix
    val rep = IndexVacuum.report(spark, root).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(rep.size == 3, "the non-convention dir must be invisible")
    assert(!rep("beamx_sf0_001_n500_aaaa1111"),
      "the older epoch must be marked stale")
    assert(rep("beamx_sf0_001_n500_bbbb2222"))
    assert(rep("tombx_sf0_001_n500_m41_cccc3333"),
      "a single-epoch group has nothing stale")
    // dry run deletes nothing
    val dry = IndexVacuum.run(spark, root, dryRun = true).head()
    assert(dry.getLong(2) == 1 && !dry.getBoolean(4))
    assert(fs.exists(new Path(FsUtil.qualified(root),
      "beamx_sf0_001_n500_aaaa1111")))
    // real run deletes exactly the stale epoch
    val real = IndexVacuum.run(spark, root).head()
    assert(real.getLong(0) == 3 && real.getLong(1) == 2 &&
      real.getLong(2) == 1 && real.getBoolean(4))
    assert(!fs.exists(new Path(FsUtil.qualified(root),
      "beamx_sf0_001_n500_aaaa1111")), "stale epoch must be deleted")
    assert(fs.exists(new Path(FsUtil.qualified(root),
      "beamx_sf0_001_n500_bbbb2222")), "live epoch must survive")
    assert(fs.exists(new Path(FsUtil.qualified(root), "notanartifact")),
      "non-convention dirs are never touched")
    // idempotent
    assert(IndexVacuum.run(spark, root).head().getLong(2) == 0)
  }

  test("mtime ties keep BOTH epochs — never delete on ambiguity") {
    fs.delete(new Path(FsUtil.qualified(root)), true)
    val t = System.currentTimeMillis() - 60000
    plant("beamy_sf0_001_n500_aaaa1111", t)
    plant("beamy_sf0_001_n500_bbbb2222", t)
    val rep = IndexVacuum.report(spark, root).collect()
    assert(rep.forall(_.getBoolean(5)), "tied epochs must all be live")
    assert(IndexVacuum.run(spark, root).head().getLong(2) == 0)
  }
}
