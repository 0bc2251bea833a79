package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rules.ConstructParser

/** SERVICE on local files: inner-group evaluation against the endpoint's
  * own dataset, §8.3 join into the outer group, SILENT tolerance, and
  * loud rejects for network schemes / variable endpoints.
  */
class ServiceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def outer = {
    import spark.implicits._
    Seq(
      ("<a>", "<http://ex.org/ref>", "<x>"),
      ("<b>", "<http://ex.org/ref>", "<y>"),
      ("<c>", "<http://ex.org/ref>", "<z>"))
      .toDF("subj", "pred", "obj")
  }

  private lazy val svcFile: String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_service_spec.nt")
    java.nio.file.Files.writeString(p,
      """<x> <http://ex.org/lbl> "ex" .
        |<y> <http://ex.org/lbl> "why" .
        |<q> <http://ex.org/lbl> "unrelated" .
        |""".stripMargin)
    p.toString
  }

  test("SERVICE <file:…> joins the file's solutions into the outer group") {
    val q =
      s"""PREFIX ex: <http://ex.org/>
         |SELECT ?s ?o ?lbl WHERE {
         |  ?s ex:ref ?o .
         |  SERVICE <file:$svcFile> { ?o ex:lbl ?lbl . }
         |}""".stripMargin
    val got = ConstructParser.parseSelect(q).run(outer).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // <c>/<z> has no service match → dropped by the join; <q> never
    // joins an outer solution
    assert(got === Set(("<a>", "<x>", "\"ex\""), ("<b>", "<y>", "\"why\"")))
  }

  test("SERVICE inside OPTIONAL keeps outer solutions without a match") {
    val q =
      s"""PREFIX ex: <http://ex.org/>
         |SELECT ?s ?lbl WHERE {
         |  ?s ex:ref ?o .
         |  OPTIONAL { SERVICE <file:$svcFile> { ?o ex:lbl ?lbl . } }
         |}""".stripMargin
    val got = ConstructParser.parseSelect(q).run(outer).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) "UNBOUND" else r.getString(1))).toSet
    assert(got === Set(("<a>", "\"ex\""), ("<b>", "\"why\""),
      ("<c>", "UNBOUND")))
  }

  test("SERVICE SILENT on an unreadable endpoint is the unit solution") {
    val q =
      s"""PREFIX ex: <http://ex.org/>
         |SELECT ?s ?o WHERE {
         |  ?s ex:ref ?o .
         |  SERVICE SILENT <file:/nonexistent/graft/nope.nt> { ?o ex:lbl ?lbl . }
         |}""".stripMargin
    val got = ConstructParser.parseSelect(q).run(outer).collect()
    assert(got.length === 3) // outer solutions pass through unchanged
    // …while the NON-silent form fails loudly
    val loud = q.replace("SERVICE SILENT", "SERVICE")
    val e = intercept[Exception](
      ConstructParser.parseSelect(loud).run(outer).collect())
    assert(e.getMessage.contains("SILENT"))
  }

  test("SERVICE SILENT as the SOLE element of a group still yields the " +
      "unit solution (OPTIONAL/UNION-branch shape)") {
    val q =
      s"""PREFIX ex: <http://ex.org/>
         |SELECT ?s ?lbl WHERE {
         |  ?s ex:ref ?o .
         |  OPTIONAL { SERVICE SILENT <file:/nonexistent/nope.nt> { ?o ex:lbl ?lbl . } }
         |}""".stripMargin
    val got = ConstructParser.parseSelect(q).run(outer).collect()
    // the optional group degrades to { mu0 }: outer rows pass, ?lbl unbound
    assert(got.length === 3 && got.forall(_.isNullAt(1)))
  }

  test("network schemes and variable endpoints reject loudly") {
    val e1 = intercept[Exception](ConstructParser.parseSelect(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s WHERE {
        |  ?s ex:ref ?o .
        |  SERVICE <http://dbpedia.org/sparql> { ?o ex:lbl ?lbl . }
        |}""".stripMargin).run(outer).collect())
    assert(e1.getMessage.contains("only local file: IRIs"))
    // variable endpoints PARSE now (fs:find dispatch), but a value that
    // is a network IRI still rejects loudly at run time
    import spark.implicits._
    val netRef = Seq(("<a>", "<http://ex.org/ref>",
      "<http://dbpedia.org/sparql>")).toDF("subj", "pred", "obj")
    val e2 = intercept[Exception](ConstructParser.parseSelect(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s WHERE {
        |  ?s ex:ref ?ep .
        |  SERVICE ?ep { ?o ex:lbl ?lbl . }
        |}""".stripMargin).run(netRef).collect())
    assert(e2.getMessage.contains("not a resolvable local file IRI"),
      s"got: ${e2.getMessage}")
  }
}
