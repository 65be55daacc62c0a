// Default-on readiness for EagerAggregation: run EVERY gate entry
// twice — rule globally enabled vs disabled — and compare results
// row-for-row. The rule is semantics-preserving by argument and
// spec-pinned on its gate shapes; this is the brute-force differential
// check over the whole 361-entry corpus before flipping the default:
// zero diffs = safe, and the fired list shows where the estimate-
// backed trigger actually engages outside q157.
//
// Usage: runMain graft.tools.EagerAggReadiness [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession

object EagerAggReadiness {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = graft.SparkEntry.queries
    var diffs = List.empty[String]
    var fired = List.empty[String]
    var failed = List.empty[String]
    def aggCount(name: String): Int =
      all(name)(spark, sfDir).queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size
    // row → occurrence count: a MULTISET compare, so diffs that only
    // change duplicate-row multiplicity are caught too (ADVICE r13 —
    // a Set compare was blind to them)
    def rowsOf(name: String): Map[Seq[Any], Int] =
      all(name)(spark, sfDir).collect()
        .map(_.toSeq.map {
          case d: Double => f"$d%.9g" // float-stable compare
          case f: Float => f"$f%.6g"
          case x => x
        }: Seq[Any])
        .groupBy(identity).map { case (k, v) => (k, v.length) }
    all.keys.toSeq.sorted.foreach { name =>
      try graft.operators.Persists.scoped {
        spark.conf.set("spark.graft.eagerAgg.enabled", "false")
        val off = rowsOf(name)
        val aggsOff = aggCount(name)
        spark.conf.set("spark.graft.eagerAgg.enabled", "true")
        val on = rowsOf(name)
        if (aggCount(name) > aggsOff) fired ::= name
        if (on != off) diffs ::= name
      } catch { case e: Throwable =>
        failed ::= s"$name: ${e.getMessage}"
      }
    }
    spark.conf.unset("spark.graft.eagerAgg.enabled")
    println(s"[eager-readiness] entries=${all.size} " +
      s"fired=${fired.size} diffs=${diffs.size} errors=${failed.size}")
    if (fired.nonEmpty)
      println(s"[eager-readiness] fired: ${fired.sorted.mkString(", ")}")
    if (diffs.nonEmpty)
      println(s"[eager-readiness] DIFFS: ${diffs.sorted.mkString(", ")}")
    failed.foreach(f => println(s"[eager-readiness] error $f"))
    spark.stop()
    if (diffs.nonEmpty) sys.exit(1)
  }
}
