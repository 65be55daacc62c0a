package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for the repo-local fixture writers (bucketed
  * tables, z-partitioned blocks, materialized signature tables): all
  * path resolution and existence checks go through the Hadoop
  * `FileSystem` resolved FROM the path — the same abstraction the
  * compaction operator uses (SourceFormats q59) — so the layout
  * machinery is object-store-honest end to end. A `java.io.File`
  * check silently reports "missing" on any non-local scheme and the
  * writer would clobber a table readers hold open.
  */
object FsUtil {

  /** `rel` made absolute against the default (local) filesystem's
    * working directory — the qualified URI string Spark writers and the
    * catalog both accept. */
  def qualified(rel: String): String = {
    val p = new Path(rel)
    p.getFileSystem(new Configuration()).makeQualified(p).toString
  }

  /** Existence via the FileSystem the path itself resolves to. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** An sfDir (or any path-ish string) as a single filesystem-safe
    * token — ONE definition for every artifact writer that keys a
    * directory by its source path (bucketed tables, z-partitioned
    * blocks, signature tables, centroid models, plan caches), so the
    * sanitization can never drift between them. */
  def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")
}
