package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rules.Rml

/** RML/R2RML front end: mapping parse, term-map compilation, shared-scan
  * fusion (`optimize workload` done at plan-build), referencing object
  * maps, and loud rejects for the out-of-scope corners.
  */
class RmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String, content: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_rml_" + name)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  private lazy val baseDir = {
    tmp("people.csv",
      """id,name,team,city
        |1,Ada Lovelace,blue,London
        |2,Alan Turing,blue,London
        |3,Grace Hopper,red,New York
        |""".stripMargin)
    tmp("teams.csv",
      """team,motto
        |blue,First!
        |red,Onward
        |""".stripMargin)
    sys.props("java.io.tmpdir")
  }

  private val prefixes =
    """@prefix rr: <http://www.w3.org/ns/r2rml#> .
      |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
      |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
      |@prefix ex: <http://ex.org/> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |""".stripMargin

  test("templateParts: text/ref split with escaped braces") {
    assert(Rml.templateParts("http://e/{id}/x{y}") ===
      Seq(Left("http://e/"), Right("id"), Left("/x"), Right("y")))
    assert(Rml.templateParts("\\{a\\}{b}") === Seq(Left("{a}"), Right("b")))
    intercept[IllegalArgumentException](Rml.templateParts("oops {unclosed"))
    intercept[IllegalArgumentException](Rml.templateParts("no refs at all"))
  }

  test("end-to-end: classes, references, templates, datatype/language, " +
      "IRI-safe encoding, graph maps, join + same-source ref object maps") {
    val mapping = prefixes +
      """<#P> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/p/{id}" ;
        |                  rr:class ex:Person ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:name ;
        |    rr:objectMap [ rml:reference "name" ; rr:language "en" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:cityIri ;
        |    rr:objectMap [ rr:template "http://ex.org/city/{city}" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:team ;
        |    rr:objectMap [ rr:parentTriplesMap <#T> ;
        |      rr:joinCondition [ rr:child "team" ; rr:parent "team" ] ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:self ;
        |    rr:objectMap [ rr:parentTriplesMap <#P> ] ] .
        |
        |<#T> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/t/{team}" ;
        |     rr:graphMap [ rr:template "http://ex.org/g/{team}" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:motto ;
        |    rr:objectMap [ rml:reference "motto" ; rr:datatype xsd:string ] ] .
        |""".stripMargin
    val maps = Rml.parseMapping(mapping)
    assert(maps.size === 2)
    val got = Rml.compile(spark, maps, baseDir).collect()
      .map(r => (r.getString(3), r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val dg = Rml.DefaultGraph
    def person(k: Int) = s"<http://ex.org/p/$k>"
    val expected = Set(
      // classes
      (dg, person(1), "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://ex.org/Person>"),
      (dg, person(2), "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://ex.org/Person>"),
      (dg, person(3), "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://ex.org/Person>"),
      // language-tagged names
      (dg, person(1), "<http://ex.org/name>", "\"Ada Lovelace\"@en"),
      (dg, person(2), "<http://ex.org/name>", "\"Alan Turing\"@en"),
      (dg, person(3), "<http://ex.org/name>", "\"Grace Hopper\"@en"),
      // IRI templates percent-encode the space (R2RML §7.3)
      (dg, person(1), "<http://ex.org/cityIri>", "<http://ex.org/city/London>"),
      (dg, person(2), "<http://ex.org/cityIri>", "<http://ex.org/city/London>"),
      (dg, person(3), "<http://ex.org/cityIri>", "<http://ex.org/city/New%20York>"),
      // join-conditioned referencing object map
      (dg, person(1), "<http://ex.org/team>", "<http://ex.org/t/blue>"),
      (dg, person(2), "<http://ex.org/team>", "<http://ex.org/t/blue>"),
      (dg, person(3), "<http://ex.org/team>", "<http://ex.org/t/red>"),
      // same-source, no-join ref object map = same-row parent subject
      (dg, person(1), "<http://ex.org/self>", person(1)),
      (dg, person(2), "<http://ex.org/self>", person(2)),
      (dg, person(3), "<http://ex.org/self>", person(3)),
      // parent map's own triples land in its TEMPLATE graph
      ("<http://ex.org/g/blue>", "<http://ex.org/t/blue>",
        "<http://ex.org/motto>",
        "\"First!\"^^<http://www.w3.org/2001/XMLSchema#string>"),
      ("<http://ex.org/g/red>", "<http://ex.org/t/red>",
        "<http://ex.org/motto>",
        "\"Onward\"^^<http://www.w3.org/2001/XMLSchema#string>"))
    assert(got === expected)
  }

  test("RML2 namespace (w3id.org/rml) parses identically") {
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |@prefix ex: <http://ex.org/> .
        |<#P2> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |        rml:referenceFormulation rml:CSV ] ;
        |  rml:subjectMap [ rml:template "http://ex.org/p/{id}" ] ;
        |  rml:predicateObjectMap [ rml:predicate ex:team ;
        |    rml:objectMap [ rml:reference "team" ] ] .
        |""".stripMargin
    val got = Rml.compile(spark, Rml.parseMapping(mapping), baseDir)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(got === Set(
      ("<http://ex.org/p/1>", "\"blue\""),
      ("<http://ex.org/p/2>", "\"blue\""),
      ("<http://ex.org/p/3>", "\"red\"")))
  }

  test("maps sharing a logical source fuse onto ONE scan (optimize workload)") {
    val mapping = prefixes +
      """<#A> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/p/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:name ;
        |    rr:objectMap [ rml:reference "name" ] ] .
        |<#B> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/city/{city}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:inCity ;
        |    rr:objectMap [ rr:template "http://ex.org/p/{id}" ] ] .
        |""".stripMargin
    val df = Rml.compile(spark, Rml.parseMapping(mapping), baseDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "(?i)scan csv".r.findAllIn(plan).length
    assert(scans === 1, s"expected ONE fused csv scan, plan:\n$plan")
    assert(df.count() === 6) // A: 3 name triples; B: 3 distinct inCity triples
  }

  test("JSON logical source: top-level array iterator, strings only") {
    tmp("nums.json",
      """[{"id": 1, "label": "one"}, {"id": 2, "label": "two"}]""")
    val mapping = prefixes +
      """<#J> rml:logicalSource [ rml:source "graft_rml_nums.json" ;
        |       rml:referenceFormulation ql:JSONPath ; rml:iterator "$[*]" ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/n/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:label ;
        |    rr:objectMap [ rml:reference "label" ] ] .
        |""".stripMargin
    val got = Rml.compile(spark, Rml.parseMapping(mapping), baseDir)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    // primitivesAsString: the numeric id arrives as the string "1"
    assert(got === Set(
      ("<http://ex.org/n/1>", "\"one\""),
      ("<http://ex.org/n/2>", "\"two\"")))
  }

  test("XML logical source (ql:XPath): iterator rows, attribute + element " +
      "refs, absent node suppresses the triple, cross-row XPath join") {
    tmp("books.xml",
      """<lib>
        |  <book isbn="111"><t>Dune</t><shelf>A</shelf></book>
        |  <book isbn="222"><t>Ubik</t><shelf>B</shelf><note>signed</note></book>
        |  <book isbn="333"><t>Solaris</t><shelf>A</shelf></book>
        |</lib>""".stripMargin)
    tmp("shelves.csv", "shelf,room\nA,east\nB,west\n")
    val mapping = prefixes +
      """<#B> rml:logicalSource [ rml:source "graft_rml_books.xml" ;
        |       rml:referenceFormulation ql:XPath ;
        |       rml:iterator "/lib/book" ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/b/{@isbn}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:title ;
        |    rr:objectMap [ rml:reference "t" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:note ;
        |    rr:objectMap [ rml:reference "note" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:room ;
        |    rr:objectMap [ rr:parentTriplesMap <#S> ;
        |      rr:joinCondition [ rr:child "shelf" ; rr:parent "shelf" ] ] ] .
        |<#S> rml:logicalSource [ rml:source "graft_rml_shelves.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/room/{room}" ] .
        |""".stripMargin
    val got = Rml.compile(spark, Rml.parseMapping(mapping), baseDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set(
      ("<http://ex.org/b/111>", "<http://ex.org/title>", "\"Dune\""),
      ("<http://ex.org/b/222>", "<http://ex.org/title>", "\"Ubik\""),
      ("<http://ex.org/b/333>", "<http://ex.org/title>", "\"Solaris\""),
      // note absent for 111/333: those triples are SUPPRESSED, not ""
      ("<http://ex.org/b/222>", "<http://ex.org/note>", "\"signed\""),
      // XML child joined to a CSV parent across sources
      ("<http://ex.org/b/111>", "<http://ex.org/room>", "<http://ex.org/room/east>"),
      ("<http://ex.org/b/222>", "<http://ex.org/room>", "<http://ex.org/room/west>"),
      ("<http://ex.org/b/333>", "<http://ex.org/room>", "<http://ex.org/room/east>")))
  }

  test("XML reference matching MULTIPLE nodes yields one triple per value " +
      "(RML term sets)") {
    tmp("multi.xml",
      "<lib><book isbn=\"1\"><a>A</a><a>B</a></book>" +
        "<book isbn=\"2\"><a>C</a></book><book isbn=\"3\"/></lib>")
    val mapping = prefixes +
      """<#M> rml:logicalSource [ rml:source "graft_rml_multi.xml" ;
        |       rml:referenceFormulation ql:XPath ; rml:iterator "/lib/book" ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/b/{@isbn}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:author ;
        |    rr:objectMap [ rml:reference "a" ] ] .
        |""".stripMargin
    val got = Rml.compile(spark, Rml.parseMapping(mapping), baseDir).collect()
      .map(r => (r.getAs[String]("subj"), r.getAs[String]("obj"))).toSet
    // book 1: two author triples; book 2: one; book 3 (no <a>): suppressed
    assert(got === Set(
      ("<http://ex.org/b/1>", "\"A\""), ("<http://ex.org/b/1>", "\"B\""),
      ("<http://ex.org/b/2>", "\"C\"")))
  }

  test("XML logical source rejects: missing iterator, '.' in a reference") {
    tmp("one.xml", "<r><x a=\"1\"/></r>")
    val noIter = prefixes +
      """<#N> rml:logicalSource [ rml:source "graft_rml_one.xml" ;
        |       rml:referenceFormulation ql:XPath ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/{@a}" ] .
        |""".stripMargin
    val e1 = intercept[Exception](
      Rml.compile(spark, Rml.parseMapping(noIter), baseDir).collect())
    assert(e1.getMessage.contains("rml:iterator"))
    val dotRef = prefixes +
      """<#D> rml:logicalSource [ rml:source "graft_rml_one.xml" ;
        |       rml:referenceFormulation ql:XPath ; rml:iterator "/r/x" ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/{./@a}" ] .
        |""".stripMargin
    val e2 = intercept[Exception](
      Rml.compile(spark, Rml.parseMapping(dotRef), baseDir).collect())
    assert(e2.getMessage.contains("'.'"))
  }

  test("graph maps UNION per R2RML §11.1: subject + POM graphs combine; " +
      "rr:defaultGraph joins named graphs instead of vanishing") {
    val mapping = prefixes +
      """<#G> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/t/{team}" ;
        |     rr:graphMap [ rr:constant ex:gs ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:motto ;
        |    rr:objectMap [ rml:reference "motto" ] ;
        |    rr:graphMap [ rr:constant ex:gp ] ;
        |    rr:graphMap [ rr:constant rr:defaultGraph ] ] .
        |""".stripMargin
    val got = Rml.compile(spark, Rml.parseMapping(mapping), baseDir)
      .collect().filter(_.getString(1) == "<http://ex.org/motto>")
      .map(_.getString(3)).toSet
    // each motto triple lands in subject graph ∪ POM graphs ∪ default
    assert(got === Set("<http://ex.org/gs>", "<http://ex.org/gp>",
      Rml.DefaultGraph))
  }

  test("rml to sparql: emitted CONSTRUCT text runs through the text " +
      "front door and matches the direct compiler value-for-value") {
    val mapping = prefixes +
      """<#P> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/p/{id}" ;
        |                  rr:class ex:Person ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:name ;
        |    rr:objectMap [ rml:reference "name" ; rr:language "en" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:cityIri ;
        |    rr:objectMap [ rr:template "http://ex.org/city/{city}" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:self ;
        |    rr:objectMap [ rr:parentTriplesMap <#P> ] ] .
        |
        |<#S> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/seg/{team}" ;
        |    rr:graphMap [ rr:template "http://ex.org/g/{team}" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:label ;
        |    rr:objectMap [ rml:reference "team" ; rr:datatype xsd:string ] ] .
        |""".stripMargin
    val maps = Rml.parseMapping(mapping)
    val direct = Rml.compile(spark, maps, baseDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    val unit = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row()),
      org.apache.spark.sql.types.StructType(Nil))
    val old = sys.props.get("graft.sparql.base")
    sys.props("graft.sparql.base") = baseDir
    try {
      val viaText = maps.flatMap { m =>
        val text = Rml.toSparql(Seq(m))
        graft.rules.ConstructParser.parseConstruct(text).run(unit)
          .collect()
      }.map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
      assert(viaText === direct)
    } finally {
      old match {
        case Some(v) => sys.props("graft.sparql.base") = v
        case None => sys.props.remove("graft.sparql.base")
      }
    }
    // joins cannot be expressed in the emitted subset — loud reject
    val withJoin = Rml.parseMapping(prefixes +
      """<#A> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://e/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:t ;
        |    rr:objectMap [ rr:parentTriplesMap <#B> ;
        |      rr:joinCondition [ rr:child "team" ; rr:parent "team" ] ] ] .
        |<#B> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://e/t/{team}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:m ;
        |    rr:objectMap [ rml:reference "motto" ] ] .""".stripMargin)
    val e = intercept[Exception](Rml.toSparql(withJoin))
    assert(e.getMessage.contains("no-join form"))
  }

  test("loud rejects: formulation, iterator, sources, cross-source no-join") {
    def reject(mapping: String, frag: String): Unit = {
      val e = intercept[Exception](
        Rml.compile(spark, Rml.parseMapping(prefixes + mapping), baseDir)
          .collect())
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    reject(
      """<#X> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |  rml:referenceFormulation <http://semweb.mmlab.be/ns/ql#CSS3> ] ;
        |  rr:subjectMap [ rr:template "http://e/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:p ;
        |    rr:objectMap [ rml:reference "id" ] ] .""".stripMargin,
      "unsupported referenceFormulation")
    reject(
      """<#X> rml:logicalSource [ rml:source "graft_rml_nums.json" ;
        |  rml:referenceFormulation ql:JSONPath ; rml:iterator "$.items[*]" ] ;
        |  rr:subjectMap [ rr:template "http://e/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:p ;
        |    rr:objectMap [ rml:reference "id" ] ] .""".stripMargin,
      "top-level array iterator")
    reject(
      """<#X> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |  rml:referenceFormulation ql:CSV ; rml:query "SELECT 1" ] ;
        |  rr:subjectMap [ rr:template "http://e/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:p ;
        |    rr:objectMap [ rml:reference "id" ] ] .""".stripMargin,
      "not supported")
    reject(
      """<#X> rml:logicalSource [ rml:source "graft_rml_people.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://e/{id}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:p ;
        |    rr:objectMap [ rr:parentTriplesMap <#Y> ] ] .
        |<#Y> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://e/t/{team}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:q ;
        |    rr:objectMap [ rml:reference "motto" ] ] .""".stripMargin,
      "same logical source")
  }

  test("template literals carry rr:language / rr:datatype; R2RML §7.4.1 " +
      "default term type flips to Literal when they are present") {
    val mapping = prefixes +
      """<#T> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/t/{team}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:slogan ;
        |    rr:objectMap [ rr:template "go {team} go" ; rr:language "en" ] ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:code ;
        |    rr:objectMap [ rr:template "T-{team}" ; rr:datatype xsd:string ] ] .
        |""".stripMargin
    val maps = Rml.parseMapping(mapping)
    val got = Rml.compile(spark, maps, baseDir).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(got.contains(("<http://ex.org/slogan>", "\"go blue go\"@en")))
    assert(got.contains(("<http://ex.org/code>",
      "\"T-red\"^^<http://www.w3.org/2001/XMLSchema#string>")))
    // the emitted SPARQL text carries the same tags (STRLANG/STRDT)
    val text = Rml.toSparql(maps, Some(baseDir))
    val unit = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row()),
      org.apache.spark.sql.types.StructType(Nil))
    val viaText = graft.rules.ConstructParser.parseConstruct(text).run(unit)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(viaText === got)
    // rr:language on a non-Literal term type rejects loudly
    val e = intercept[Exception](Rml.parseMapping(prefixes +
      """<#X> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://e/{team}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:p ;
        |    rr:objectMap [ rr:template "x{team}" ; rr:language "en" ;
        |      rr:termType rr:IRI ] ] .""".stripMargin))
    assert(e.getMessage.contains("only valid on Literal"))
  }

  test("toSparql with baseDir anchors relative rml:source to the mapping " +
      "directory, matching compile()'s resolution") {
    val maps = Rml.parseMapping(prefixes +
      """<#T> rml:logicalSource [ rml:source "graft_rml_teams.csv" ;
        |       rml:referenceFormulation ql:CSV ] ;
        |  rr:subjectMap [ rr:template "http://ex.org/t/{team}" ] ;
        |  rr:predicateObjectMap [ rr:predicate ex:motto ;
        |    rr:objectMap [ rml:reference "motto" ] ] .""".stripMargin)
    val text = Rml.toSparql(maps, Some(baseDir))
    assert(text.contains(s"<$baseDir/graft_rml_teams.csv>"))
    // absolute path regardless of where the text later runs: no
    // graft.sparql.base needed for the equivalence to hold
    val unit = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row()),
      org.apache.spark.sql.types.StructType(Nil))
    val viaText = graft.rules.ConstructParser.parseConstruct(text).run(unit)
      .collect().map(_.getString(0)).toSet
    assert(viaText === Set("<http://ex.org/t/blue>", "<http://ex.org/t/red>"))
  }
}
