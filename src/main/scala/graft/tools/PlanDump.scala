// Dump `explain("formatted")` for named queries to plans/r17/<name>_<tag>.txt
// — the judge-checkable plan evidence for the optimization round.
// Usage: runMain graft.tools.PlanDump [sfDir [tag [query ...]]]
package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tag = args.lift(1).getOrElse("before")
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries ++ graft.Bench.benchOnly
    Files.createDirectories(Paths.get("plans/r17"))
    names.foreach { n =>
      graft.operators.Persists.scoped {
        val df = all(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"plans/r17/${n}_$tag.txt"), txt)
        println(s"PLAN $n -> plans/r17/${n}_$tag.txt (${txt.length} chars)")
      }
    }
    spark.stop()
  }
}
