package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The reference's demo queries run VERBATIM from the embedded
  * byte-identical copies (resources/reference/demos): the movies CONSTRUCT
  * (docs/demos/movies/query.rq — 1-hop + 2-hop UNION star) and the
  * leaflet-graphql countries query (docs/demos/leaflet-graphql/
  * query-countries.rq — plain-group LATERAL over a UNION of GRAPH groups
  * with negated-property-set and any-edge path closures).
  */
class DemoQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def res(name: String): String = {
    val in = getClass.getResourceAsStream(s"/reference/demos/$name")
    require(in != null, name)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  test("movies query.rq VERBATIM: film star + second-hop object stars") {
    val wdt = "http://www.wikidata.org/prop/direct/"
    val wd = "http://www.wikidata.org/entity/"
    val quads = Seq(
      (s"<${wd}F1>", s"<${wdt}P31>", s"<${wd}Q11424>"), // a film
      (s"<${wd}F1>", s"<${wdt}P57>", s"<${wd}D1>"),     // director
      (s"<${wd}F1>", s"<${wdt}P1476>", "\"Title\""),
      (s"<${wd}D1>", s"<${wdt}P735>", "\"Given\""),     // 2nd hop star
      (s"<${wd}Other>", s"<${wdt}P735>", "\"X\"")       // unrelated
    ).toDF("subj", "pred", "obj")
      .withColumn("graph", lit("<urn:x-arq:DefaultGraph>"))
    val out = graft.rules.ConstructParser
      .parseConstruct(res("movies-query.rq")).run(quads)
      .select("subj", "pred", "obj").distinct()
      .as[(String, String, String)].collect().toSet
    // branch 1: the film's own star; branch 2: stars of the film's
    // OBJECTS (D1 and Q11424 — Q11424 has no triples); never Other's
    assert(out === Set(
      (s"<${wd}F1>", s"<${wdt}P31>", s"<${wd}Q11424>"),
      (s"<${wd}F1>", s"<${wdt}P57>", s"<${wd}D1>"),
      (s"<${wd}F1>", s"<${wdt}P1476>", "\"Title\""),
      (s"<${wd}D1>", s"<${wdt}P735>", "\"Given\"")))
  }

  test("query-countries.rq VERBATIM: plain-group LATERAL, per-graph " +
      "path closures — geometry subtree excluded, admin subtree included") {
    val geo = "http://www.opengis.net/ont/geosparql#"
    val coy = "https://schema.coypu.org/global#"
    val cg = "<https://data.coypu.org/countries/>"
    val ag = "<https://data.coypu.org/administrative-regions/>"
    val rdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    val quads = Seq(
      // countries graph: a country with a name and a geometry subtree
      (cg, "<urn:c1>", rdfType, s"<${coy}Country>"),
      (cg, "<urn:c1>", s"<${coy}name>", "\"Xland\""),
      (cg, "<urn:c1>", s"<${geo}hasGeometry>", "<urn:g1>"),
      (cg, "<urn:g1>", s"<${geo}asWKT>", "\"POINT(1 2)\""),
      // admin graph: a region subtree reachable via ANY edge
      (ag, "<urn:c1>", s"<${coy}hasRegion>", "<urn:r1>"),
      (ag, "<urn:r1>", s"<${coy}name>", "\"Region\"")
    ).toDF("graph", "subj", "pred", "obj")
    val out = graft.rules.ConstructParser
      .parseConstruct(res("query-countries.rq")).run(quads)
      .select("subj", "pred", "obj").distinct()
      .as[(String, String, String)].collect().toSet
    assert(out === Set(
      // countries graph, (!geo:hasGeometry)* from c1: zero steps = c1's
      // own star (incl. the hasGeometry EDGE itself) — but g1 is only
      // reachable THROUGH hasGeometry, so its star is excluded
      ("<urn:c1>", rdfType, s"<${coy}Country>"),
      ("<urn:c1>", s"<${coy}name>", "\"Xland\""),
      ("<urn:c1>", s"<${geo}hasGeometry>", "<urn:g1>"),
      // admin graph, (<p>|!<p>)* = any-edge closure from c1
      ("<urn:c1>", s"<${coy}hasRegion>", "<urn:r1>"),
      ("<urn:r1>", s"<${coy}name>", "\"Region\"")))
  }
}
