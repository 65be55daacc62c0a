package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r15 wrong #4: EXPERIMENT_r15.md §8 shipped as an empty
  * `<!-- generated at close -->` placeholder because the generator
  * never ran before the final commit. The close sequence ends with
  * `sbt test` — so make THAT the enforcement point: a surviving
  * placeholder, or a "Closing numbers" header with no generated
  * bullets under it, fails the suite red before anything can be
  * committed around it. */
class ClosingBlockSpec extends AnyFunSuite {

  private def experimentFiles: Seq[java.io.File] =
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("EXPERIMENT_r\\d+\\.md")).toSeq.sortBy(_.getName)

  test("no EXPERIMENT file carries an unexpanded close placeholder") {
    val bad = experimentFiles.filter(f =>
      java.nio.file.Files.readString(f.toPath)
        .contains("<!-- generated at close -->"))
    assert(bad.isEmpty,
      s"placeholder survived in: ${bad.map(_.getName).mkString(", ")} — " +
        "run tools/closing_block.py and replace it before committing")
  }

  test("every 'Closing numbers' section actually contains numbers") {
    val bad = experimentFiles.filter { f =>
      val text = java.nio.file.Files.readString(f.toPath)
      val idx = text.indexOf("Closing numbers")
      idx >= 0 && !text.substring(idx).contains("- **")
    }
    assert(bad.isEmpty,
      s"empty closing section in: ${bad.map(_.getName).mkString(", ")}")
  }
}
