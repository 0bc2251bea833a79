package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Script
import graft.pipeline.Script.{Query, Update}

class ScriptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("statement sequence: updates mutate the shared view state in order") {
    val result = Script.run(spark, Seq(
      // LOAD-style: bind the base table
      Update("acc", s => Seq((1, "a"), (2, "b")).toDF("k", "v")),
      // query-over-state, then an update DERIVED FROM the previous state
      Query(s => s.table("acc")),
      Update("acc", s => s.table("acc")
        .unionAll(s.table("acc").select($"k" + 10, upper($"v")))),
      // DELETE-style update
      Update("acc", s => s.table("acc").filter($"k" =!= 2)),
      Query(s => s.table("acc").orderBy("k"))
    )).get
    assert(result.as[(Int, String)].collect().toSeq ===
      Seq((1, "a"), (11, "A"), (12, "B")))
  }

  test("update materializes eagerly: later redefinition cannot change it") {
    Script.run(spark, Seq(
      Update("src", s => Seq(1).toDF("x")),
      Update("snap", s => s.table("src").select($"x" + 1 as "x")),
      Update("src", s => Seq(100).toDF("x")), // must NOT affect snap
      Query(s => s.table("snap"))
    )).get.as[Long].head match {
      case 2 => ()
      case other => fail(s"snapshot leaked through view rebind: $other")
    }
  }

  test("runSparql: LOAD INTO GRAPH, CLEAR GRAPH, SELECT statement, data ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-script")
    val nq = dir.resolve("d.nq").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nq),
      "<s1> <p> \"1\" .\n<s2> <p> \"2\" .\n")
    val script =
      s"""LOAD <file://$nq> INTO GRAPH <urn:in> ;
         |INSERT DATA { GRAPH <urn:tmp> { <x> <y> "z" . }
         |              <d1> <d2> "d3" . } ;
         |CLEAR GRAPH <urn:tmp> ;
         |DELETE DATA { <d1> <d2> "d3" . } ;
         |SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o . } }
         |GROUP BY ?g ORDER BY ?g
         |""".stripMargin
    val run = Script.runSparql(spark, script)
    // dataset: the two loaded quads only (tmp cleared, default-graph data quad deleted)
    assert(run.dataset.count() === 2)
    assert(run.dataset.select("graph").distinct().as[String].collect().toSeq
      === Seq("<urn:in>"))
    // the SELECT statement saw the final state
    val sel = run.lastQuery.get.collect()
    assert(sel.map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("<urn:in>", 2L)))
    // DELETE WHERE limited to patterns; a BIND inside fails loudly
    intercept[IllegalArgumentException](graft.rules.ConstructParser.parseScript(
      "DELETE WHERE { BIND(\"x\" AS ?v) }"))
    // variables are rejected in DATA blocks
    intercept[IllegalArgumentException](graft.rules.ConstructParser.parseScript(
      "INSERT DATA { <a> <b> ?v . }"))
  }

  test("graph management verbs + WITH/USING update scoping") {
    val script =
      """PREFIX ex: <http://ex.org/>
        |INSERT DATA {
        |  ex:a ex:p "1" .
        |  GRAPH <urn:g1> { ex:b ex:p "2" . }
        |} ;
        |COPY DEFAULT TO <urn:w> ;
        |ADD GRAPH <urn:g1> TO <urn:w> ;
        |MOVE GRAPH <urn:g1> TO <urn:m> ;
        |WITH <urn:w> DELETE { ?s ex:p ?v } INSERT { ?s ex:q ?v }
        |WHERE { ?s ex:p ?v } ;
        |INSERT { GRAPH <urn:u> { ?s ex:r ?v } }
        |USING <urn:m> WHERE { ?s ex:p ?v }""".stripMargin
    val ds = Script.runSparql(spark, script).dataset
    val got = ds.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet
    val A = "<http://ex.org/a>"; val B = "<http://ex.org/b>"
    val P = "<http://ex.org/p>"; val Q = "<http://ex.org/q>"
    val R = "<http://ex.org/r>"
    assert(got === Set(
      ("<urn:x-arq:DefaultGraph>", A, P, "\"1\""), // untouched original
      ("<urn:w>", A, Q, "\"1\""),                  // copied + WITH-rewritten
      ("<urn:w>", B, Q, "\"2\""),                  // added + WITH-rewritten
      ("<urn:m>", B, P, "\"2\""),                  // moved (g1 emptied)
      ("<urn:u>", B, R, "\"2\"")))                 // USING-scoped insert
  }

  test("COPY replaces the destination; ADD accumulates into it") {
    val script =
      """PREFIX ex: <http://ex.org/>
        |INSERT DATA {
        |  GRAPH <urn:s> { ex:x ex:p "s" . }
        |  GRAPH <urn:d> { ex:y ex:p "old" . }
        |} ;
        |COPY <urn:s> TO <urn:d>""".stripMargin
    val ds = Script.runSparql(spark, script).dataset
      .filter($"graph" === "<urn:d>")
    assert(ds.select("obj").as[String].collect().toSeq === Seq("\"s\""))
    val script2 =
      """PREFIX ex: <http://ex.org/>
        |INSERT DATA {
        |  GRAPH <urn:s> { ex:x ex:p "s" . }
        |  GRAPH <urn:d> { ex:y ex:p "old" . }
        |} ;
        |ADD <urn:s> TO <urn:d>""".stripMargin
    val ds2 = Script.runSparql(spark, script2).dataset
      .filter($"graph" === "<urn:d>")
    assert(ds2.select("obj").as[String].collect().toSet ===
      Set("\"s\"", "\"old\""))
  }

  test("env substitution: substituted text parses, unknown name fails") {
    import graft.rules.ConstructParser
    assert(ConstructParser.envSubst("GRAPH <env:G> {", Map("G" -> "urn:g"))
      === "GRAPH <urn:g> {")
    intercept[IllegalArgumentException](
      ConstructParser.envSubst("<env:MISSING>", Map()))
  }

  test("writeSplit: one independent resumable sink per rule group") {
    import graft.materialize.Materializer
    val out = java.nio.file.Files.createTempDirectory("graft-split").toString
    val a = Seq(("<s1>", "<p>", "\"1\"", "<g1>")).toDF("subj", "pred", "obj", "graph")
    val b = Seq(("<s2>", "<p>", "\"2\"", "<g2>")).toDF("subj", "pred", "obj", "graph")
    Materializer.writeSplit(Map("core" -> a, "mentions" -> b), out, nBuckets = 2)
    val backA = spark.read.parquet(s"$out/core/triples")
    val backB = spark.read.parquet(s"$out/mentions/triples")
    assert(backA.select("subj").as[String].collect().toSeq === Seq("<s1>"))
    assert(backB.select("subj").as[String].collect().toSeq === Seq("<s2>"))
    assert(Materializer.verifyCounts(spark, s"$out/core"))
    intercept[IllegalArgumentException](
      Materializer.writeSplit(Map("../evil" -> a), out))
  }

  test("test-zip-arrays.sparql shape: INSERT DATA xsd:json payload + " +
      "positional json:unnest zip, as one script") {
    // the reference script verbatim except its trailing comma (invalid
    // JSON; docs/examples/test-zip-arrays.sparql:235-257)
    val script =
      "INSERT DATA {\n" +
        "  eg:workload1 eg:workload \"\"\"{\n" +
        "    \"stopIds\": [ \"TRENTO_STATION_FTM\", \"TRENTO_NORD\"],\n" +
        "    \"stopNames\": [ \"Trento Staz.Ftm\", \"Trento Nord\" ]\n" +
        "  }\"\"\"^^xsd:json\n" +
        "}\n\n" +
        """SELECT ?s ?l
          |WHERE {
          |  ?x eg:workload ?o  .
          |  BIND(json:path(?o, "$.stopIds") AS ?stops)
          |  BIND(json:path(?o, "$.stopNames") AS ?stopNames)
          |
          |  ?stops json:unnest (?stop ?i) .
          |  ?stopNames json:unnest (?l ?i) .
          |
          |  BIND("http://qrowd-project.eu/resource/" AS ?ns)
          |  BIND(URI(CONCAT(?ns, 'stop-', ENCODE_FOR_URI(?stop))) AS ?s)
          |}""".stripMargin
    val got = graft.pipeline.Script.runSparql(spark, script).lastQuery.get
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("<http://qrowd-project.eu/resource/stop-TRENTO_STATION_FTM>",
        "Trento Staz.Ftm"),
      ("<http://qrowd-project.eu/resource/stop-TRENTO_NORD>",
        "Trento Nord")))
  }
}
