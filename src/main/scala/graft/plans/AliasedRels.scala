package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JOB-style REPEATED relations for the planner stack: the reference's
  * workload joins the same table many times under aliases (the JOB
  * corpus reaches ~17 relations over ~11 tables, `runtime_test.sh`),
  * and [[JoinTreeExecutor]] resolves equi-conditions by globally
  * unique column names — so an aliased relation is loaded with every
  * column SUFFIXED, and the graph's edges/filters reference the
  * suffixed names.
  *
  * Naming: `"orders@2"` loads `orders` with columns renamed
  * `o_orderkey → o_orderkey_a2` etc.; a plain name loads unchanged.
  * One suffix rule, applied identically at load ([[load]]), at truth
  * dump (tools/CardDump), and at profile time ([[profile]]), so the
  * three can never disagree about what a relation's columns are. */
object AliasedRels {

  /** "orders@2" → ("orders", "_a2"); plain names → (name, ""). */
  def split(rel: String): (String, String) = {
    val i = rel.indexOf('@')
    if (i < 0) (rel, "") else (rel.substring(0, i), "_a" + rel.substring(i + 1))
  }

  def baseOf(rel: String): String = split(rel)._1

  def load(spark: SparkSession, sfDir: String, rel: String): DataFrame = {
    val (base, suf) = split(rel)
    val df = graft.sources.Tables.load(spark, sfDir, base)
    if (suf.isEmpty) df else df.toDF(df.columns.map(_ + suf): _*)
  }

  def rowCount(spark: SparkSession, sfDir: String, rel: String): Long =
    graft.sources.Tables.rowCount(spark, sfDir, baseOf(rel))

  /** The base table's measured profile with column keys re-suffixed —
    * an alias has identical statistics to its base by construction,
    * so the ANALYZE pass runs once per TABLE, never per alias. */
  def profile(spark: SparkSession, sfDir: String,
      rel: String, hist: Boolean = false): StatsEstimator.Profile = {
    val (base, suf) = split(rel)
    val p =
      if (hist) StatsEstimator.profileTableHist(spark, sfDir, base)
      else StatsEstimator.profileTable(spark, sfDir, base)
    if (suf.isEmpty) p
    else p.copy(
      cols = p.cols.map { case (c, s) => (c + suf, s) },
      bounds = p.bounds.map { case (c, b) => (c + suf, b) })
  }
}
