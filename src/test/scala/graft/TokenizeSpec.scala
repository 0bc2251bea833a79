package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Tokenize

class TokenizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 300 seeded random ASCII strings, all codepoints 0x00-0x7F (controls,
  // punctuation, letters, digits), lengths 0-60
  private def asciiCorpus: Seq[String] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(300) { _ =>
      val len = rnd.nextInt(61)
      // avoid raw codepoints that the DataFrame display chokes on? no —
      // full range, that is the point
      new String(Array.fill(len)(rnd.nextInt(0x80).toChar))
    } ++ Seq("", " ", "a", "NATION_1", "a\tbc\fd", "ü non-ascii kept")
  }

  test("alnumTokens == regex-class split for ASCII text") {
    val df = asciiCorpus.toDF("text")
    val mismatches = df.select(
        Tokenize.alnumTokens($"text").as("fast"),
        array_remove(split($"text", "[^A-Za-z0-9]+", -1), "").as("regex"),
        $"text")
      .filter(!($"fast" === $"regex"))
    val bad = mismatches.collect()
    // the ONLY allowed divergence is non-ASCII (by design)
    assert(bad.forall(_.getString(2).exists(_ > 0x7f)),
      bad.take(3).mkString("\n"))
  }

  test("wsTokens == RE2-\\s split (tab/newline/formfeed/CR/space) lowercased") {
    val df = asciiCorpus.toDF("text")
    val bad = df.select(
        Tokenize.wsTokens($"text").as("fast"),
        array_remove(split(lower($"text"), "[\\t\\n\\f\\r ]+", -1), "")
          .as("regex"),
        $"text")
      .filter(!($"fast" === $"regex"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("dedup invariant: equal normalized text <=> equal token sequence") {
    import graft.dedup.Dedup
    val df = asciiCorpus.toDF("text")
    val bad = df.select(Dedup.normalized($"text").as("n"),
        array_join(Tokenize.wsTokens($"text"), " ").as("j"))
      .filter($"n" =!= $"j").count()
    assert(bad === 0)
  }
}
