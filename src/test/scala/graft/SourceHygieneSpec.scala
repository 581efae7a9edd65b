package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Guards against literal control bytes in Scala sources.
  *
  * The Write/Edit tooling used on this repo has emitted literal NUL and
  * BEL bytes into string literals several times (rounds 3, 8, 12). The
  * bytes are valid Scala, but `grep` then reports "binary file matches"
  * and hides the file from every text search. This spec is the
  * pre-commit check the round-12 verdict asked for: any control byte
  * other than \t \n \r in a .scala/.sbt file fails the build — write
  * `\uXXXX` escapes instead.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def offenders(root: String): Seq[(String, Int, Int)] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => { val n = p.toString; n.endsWith(".scala") || n.endsWith(".sbt") })
      .flatMap { p =>
        val bytes = Files.readAllBytes(p)
        bytes.iterator.zipWithIndex.collectFirst {
          case (b, i) if (b >= 0 && b < 9) || b == 11 || b == 12 || (b > 13 && b < 32) =>
            (p.toString, i, b.toInt)
        }
      }.toSeq

  test("no literal control bytes in any source file") {
    val bad = offenders("src") ++ offenders("build.sbt")
    assert(bad.isEmpty, s"control bytes found (use \\uXXXX escapes): $bad")
  }
}
