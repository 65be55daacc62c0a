package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** INDEX-ARTIFACT VACUUM — [[Vacuum]]'s discipline applied to the
  * fingerprint-keyed index artifacts under `target/tmp/graph`
  * (kNN edge frames, beam 2-hop frames, tombstone manifests, IVF and
  * stream fixtures …). Every artifact path embeds its source-corpus
  * fingerprint, so an in-place regeneration mints a NEW directory and
  * silently strands the old epoch on disk forever — the cache-side
  * half of this leak was closed by `Tables.evictStaleEpochs`
  * (ADVICE r15); this closes the disk-side half. At 100 TB an index
  * epoch is not pocket change: stranded ANN graphs are full
  * edge-frame copies.
  *
  * Liveness is EPOCH SUPERSESSION, no per-family source knowledge
  * needed (families fingerprint different tables): artifacts group by
  * logical key = directory name minus the trailing fingerprint token
  * (family + corpus + every dial); within a group the
  * newest-modified artifact(s) are live and strictly-older
  * fingerprints are superseded. A group with one epoch — the normal
  * state — has nothing stale; ties on modification time are ALL kept
  * (never delete on ambiguity). Directories that don't match the
  * `<prefix>_<hex-fp>` convention are not index artifacts and are
  * never touched.
  *
  * Scale shape: one directory listing (dir-count-sized), a
  * driver-side group-by over names, per-directory delete metadata
  * ops — data bytes are never read, the Delta-VACUUM shape. */
object IndexVacuum {

  val DefaultRoot = "target/tmp/graph"

  private val artifactRe = "^(.*)_([0-9a-f]{6,16})$".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private case class Art(
      name: String, group: String, fp: String,
      bytes: Long, modified: Long)

  private def list(spark: SparkSession, root: String): Seq[Art] = {
    val rootPath = new Path(FsUtil.qualified(root))
    val f = fs(spark, root)
    if (!f.exists(rootPath)) return Nil
    f.listStatus(rootPath).toSeq.filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case artifactRe(group, fp) =>
          val sum = f.getContentSummary(st.getPath)
          // epoch age = newest FILE inside (directory mtime churns on
          // listing/creation and would break tie semantics); an empty
          // artifact dir falls back to its own mtime
          val children = f.listStatus(st.getPath).map(_.getModificationTime)
          val newest =
            if (children.nonEmpty) children.max else st.getModificationTime
          Some(Art(st.getPath.getName, group, fp, sum.getLength, newest))
        case _ => None // not an index artifact — never touched
      }
    }
  }

  private def withLive(arts: Seq[Art]): Seq[(Art, Boolean)] = {
    val newestPerGroup = arts.groupBy(_.group)
      .map { case (g, as) => g -> as.map(_.modified).max }
    arts.map(a => (a, a.modified == newestPerGroup(a.group)))
  }

  /** One row per index artifact: (artifact, family, group_key, fp,
    * bytes, live). `live=false` marks a superseded epoch the next
    * [[run]] will delete. */
  def report(
      spark: SparkSession, root: String = DefaultRoot): DataFrame = {
    import spark.implicits._
    withLive(list(spark, root))
      .map { case (a, live) =>
        (a.name, a.group.takeWhile(_ != '_'), a.group, a.fp, a.bytes,
          live)
      }
      .toDF("artifact", "family", "group_key", "fp", "bytes", "live")
  }

  /** Delete every superseded epoch (unless `dryRun`); returns the
    * summary row (n_artifacts, n_groups, n_stale, bytes_stale,
    * deleted). Idempotent: a second run finds 0 stale. */
  def run(
      spark: SparkSession, root: String = DefaultRoot,
      dryRun: Boolean = false): DataFrame = {
    import spark.implicits._
    val flagged = withLive(list(spark, root))
    val stale = flagged.filter(!_._2).map(_._1)
    if (!dryRun) {
      val f = fs(spark, root)
      stale.foreach { a =>
        f.delete(new Path(FsUtil.qualified(root), a.name), true)
      }
    }
    Seq((flagged.size.toLong, flagged.map(_._1.group).distinct.size.toLong,
        stale.size.toLong, stale.map(_.bytes).sum, !dryRun))
      .toDF("n_artifacts", "n_groups", "n_stale", "bytes_stale",
        "deleted")
  }
}
