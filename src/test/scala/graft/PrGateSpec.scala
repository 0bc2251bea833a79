package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Transcripts
import graft.pipeline.Kg

/** The P/R ≥ 0.95 correctness gate (BASELINE.json north_rule): pipeline
  * triples vs an in-repo, obviously-correct reference implementation
  * (plain Scala loops over collected rows — the stand-in for the
  * unbuildable reference binary, SURVEY.md §5.2.1).
  */
class PrGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ntEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  test("triple extraction + linking P/R >= 0.95 vs reference semantics") {
    import spark.implicits._
    val rows = Transcripts(spark, TestSpark.sf0001)
      .select($"conv_id", $"turn_idx", $"role", $"text", $"tool",
        org.apache.spark.sql.functions.unix_micros($"ts".cast("timestamp")))
      .as[(String, Int, String, String, Option[String], Long)]
      .collect()

    // ---- reference implementation (naive, row-at-a-time) ----
    val NS = "http://graft.io/"
    val byConv = rows.groupBy(_._1)
    val expected = scala.collection.mutable.Set[(String, String, String, String)]()
    // gazetteer ⋈ canonical map, naive
    val surf2canon: Seq[(String, String)] = (0 until 25).flatMap { k =>
      val canon = s"${NS}alias/NATION_$k/0"
      Seq(s"NATION_$k" -> canon, s"nation $k" -> canon, s"Nation-$k" -> canon)
    }
    for ((conv, turns) <- byConv; (_, idx, role, text, tool, tsUs) <- turns) {
      val t = s"<${NS}conv/$conv/turn/$idx>"
      val c = s"<${NS}conv/$conv>"
      val g = s"<${NS}g/$conv>"
      def p(n: String) = s"<${NS}p/$n>"
      expected += ((t, "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", s"<${NS}Turn>", g))
      expected += ((t, p("role"), "\"" + ntEscape(role) + "\"", g))
      expected += ((t, p("text"), "\"" + ntEscape(text) + "\"", g))
      expected += ((t, p("ts"), "\"" + tsUs + "\"^^<http://www.w3.org/2001/XMLSchema#long>", g))
      expected += ((t, p("conv"), c, g))
      expected += ((c, p("hasTurn"), t, g))
      tool.foreach(tl => expected += ((t, p("tool"), "\"" + ntEscape(tl) + "\"", g)))
      val next = turns.map(_._2).filter(_ > idx)
      if (next.nonEmpty)
        expected += ((t, p("next"), s"<${NS}conv/$conv/turn/${next.min}>", g))
      def norm(x: String) = " " + x.map(ch =>
        if (ch.isDigit || (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')) ch
        else ' ') + " "
      for ((s, canon) <- surf2canon if norm(text).contains(norm(s)))
        expected += ((t, p("mentions"), s"<$canon>", g))
    }
    // alias/canonical triples in the entities graph
    for (k <- 0 until 25; v <- 0 until (if (k == 0) 4 else 3))
      expected += ((s"<${NS}alias/NATION_$k/$v>", s"<${NS}p/canonical>",
        s"<${NS}alias/NATION_$k/0>", s"<${NS}g/entities>"))

    // ---- engine output ----
    val got = Kg.canonicalTriples(spark, TestSpark.sf0001)
      .as[(String, String, String, String)].collect().toSet

    val tp = (got intersect expected).size.toDouble
    val precision = tp / got.size
    val recall = tp / expected.size
    info(f"precision=$precision%.4f recall=$recall%.4f " +
      f"(got=${got.size} expected=${expected.size})")
    assert(precision >= 0.95, f"precision $precision%.4f")
    assert(recall >= 0.95, f"recall $recall%.4f")
    // and in fact exact:
    assert(precision == 1.0 && recall == 1.0)
  }
}
