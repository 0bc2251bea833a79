package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graphql.GraphQl

/** GraphQL→query compiler: parsing, nested pattern compilation with
  * implicit/explicit joins, @bind, cardinality control, prefixes, and
  * loud rejects.
  */
class GraphQlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val quads = {
    import spark.implicits._
    Seq(
      ("<p1>", "<http://ex.org/type>", "<http://ex.org/Person>"),
      ("<p2>", "<http://ex.org/type>", "<http://ex.org/Person>"),
      ("<p1>", "<http://ex.org/name>", "\"Ada\""),
      ("<p2>", "<http://ex.org/name>", "\"Alan\""),
      ("<p1>", "<http://ex.org/knows>", "<p2>"),
      ("<p1>", "<http://ex.org/tag>", "\"b\""),
      ("<p1>", "<http://ex.org/tag>", "\"a\""),
      ("<p2>", "<http://ex.org/tag>", "\"c\"")
    ).toDF("subj", "pred", "obj")
  }

  test("parse: fields, directives, nested sets, comments, commas") {
    val q = GraphQl.parse(
      """# a comment
        |query Sample @prefix(map: {ex: "http://ex.org/"}, name: "x", iri: "http://x/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s") {
        |    id @bind(of: "?s"),
        |    tags @pattern(of: "?s ex:tag ?t", from: "s", to: "t") @many
        |  }
        |}""".stripMargin)
    assert(q.roots.size === 1)
    assert(q.roots.head.name === "people")
    assert(q.roots.head.children.map(_.name) === Seq("id", "tags"))
    assert(q.directives.head.name === "prefix")
  }

  test("nested query: implicit lateral joins, sorted arrays, @one guard") {
    val text =
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s") {
        |    id @bind(of: "?s")
        |    name @pattern(of: "?s ex:name ?n", from: "s", to: "n") @one
        |    tags @pattern(of: "?s ex:tag ?t", from: "s", to: "t")
        |    knows @pattern(of: "?s ex:knows ?k", from: "s", to: "k") {
        |      kname @pattern(of: "?k ex:name ?kn", from: "k", to: "kn") @one
        |    }
        |  }
        |}""".stripMargin
    val rows = GraphQl.compile(quads, text).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(rows("p1") ===
      """{"id":"p1","name":"Ada","tags":["a","b"],"knows":[{"kname":"Alan"}]}""")
    assert(rows("p2") ===
      """{"id":"p2","name":"Alan","tags":["c"],"knows":[]}""")
    // single-document envelope
    val doc = GraphQl.document(quads, text)
    assert(doc.startsWith("{\"data\":{\"people\":[{\"id\":\"p1\"") &&
      doc.endsWith("}]}}"))
  }

  test("@one with multiple matches raises loudly") {
    val text =
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s") {
        |    tag @pattern(of: "?s ex:tag ?t", from: "s", to: "t") @one
        |  }
        |}""".stripMargin
    val e = intercept[Exception](GraphQl.compile(quads, text).collect())
    assert(e.getMessage.contains("@one") ||
      e.getMessage.contains("is @one but matched") ||
      Option(e.getCause).exists(_.getMessage.contains("matched")))
  }

  test("unbound leaf values (OPTIONAL in the @pattern) become JSON null " +
      "instead of vanishing from arrays or crashing @one") {
    val text =
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s") {
        |    id @bind(of: "?s")
        |    nick @pattern(of: "?s ex:name ?n OPTIONAL { ?n ex:alias ?a }",
        |                  from: "s", to: "a") @one
        |    aliases @pattern(of: "?s ex:name ?n OPTIONAL { ?n ex:alias ?a }",
        |                     from: "s", to: "a")
        |  }
        |}""".stripMargin
    val rows = GraphQl.compile(quads, text).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    // ?a is unbound for every person: @one yields null (collect_list used
    // to drop the NULL and element_at(arr,1) threw under ANSI), @many
    // keeps one explicit null entry per solution
    assert(rows("p1") === """{"id":"p1","nick":null,"aliases":[null]}""")
    assert(rows("p2") === """{"id":"p2","nick":null,"aliases":[null]}""")
  }

  test("@join overrides the implicit parent-target join") {
    // root targets BOTH ?s and ?n; the child joins on ?s only via @join
    val text =
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  rows @pattern(of: "?s ex:name ?n", from: "s", to: ["s", "n"]) {
        |    tags @pattern(of: "?x ex:tag ?t", from: "x", to: "t")
        |         @join(parent: "s", this: "x")
        |  }
        |}""".stripMargin
    val got = GraphQl.compile(quads, text).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got("p1") === """{"tags":["a","b"]}""")
    assert(got("p2") === """{"tags":["c"]}""")
  }

  test("@one cascade sets the default cardinality for children") {
    val text =
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s")
        |         @one(self: false, cascade: true) {
        |    name @pattern(of: "?s ex:name ?n", from: "s", to: "n")
        |  }
        |}""".stripMargin
    val got = GraphQl.compile(quads, text).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    // name inherited @one → scalar, not array
    assert(got("p1") === """{"name":"Ada"}""")
  }

  test("@index turns a field into a JSON object keyed by the by-var " +
      "(docs/graphql/reference/index-directive.md shape)") {
    val text =
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s") {
        |    props @pattern(of: "?s ?p ?o", from: "s", to: "o")
        |          @index(by: "?p", oneIf: "false")
        |  }
        |}""".stripMargin
    val got = GraphQl.compile(quads, text).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got("p1") ===
      """{"props":{"http://ex.org/knows":["p2"],"http://ex.org/name":["Ada"],""" +
        """"http://ex.org/tag":["a","b"],"http://ex.org/type":["http://ex.org/Person"]}}""")
    assert(got("p2") ===
      """{"props":{"http://ex.org/name":["Alan"],"http://ex.org/tag":["c"],""" +
        """"http://ex.org/type":["http://ex.org/Person"]}}""")
    // oneIf: "true" errors when a key holds >1 value
    val e = intercept[Exception](GraphQl.compile(quads,
      text.replace("oneIf: \"false\"", "oneIf: \"true\"")).collect())
    assert(e.getMessage.contains("matched") ||
      Option(e.getCause).exists(_.getMessage.contains("matched")))
  }

  test("loud rejects: @index at root, unknown directives, mutations, no pattern") {
    def bad(t: String, frag: String): Unit = {
      val e = intercept[Exception](GraphQl.compile(quads, t).collect())
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    bad("""{ f @pattern(of: "?s ?p ?o", to: "o") @index(by: "?p") }""",
      "@index is only supported on child fields")
    bad(
      """query Q @prefix(name: "ex", iri: "http://ex.org/") {
        |  people @pattern(of: "?s ex:type ex:Person", from: "s", to: "s") {
        |    id @bind(of: "?s") @index(by: "?s")
        |  }
        |}""".stripMargin,
      "@index needs a @pattern field")
    bad("""{ f @pattern(of: "?s ?p ?o", to: "o") @frobnicate }""",
      "unknown directive")
    bad("""{ f }""", "needs @pattern or @bind")
    intercept[IllegalArgumentException](
      GraphQl.parse("mutation { f }"))
  }

  test("loud rejects: GraphQL-language features outside the documented " +
      "directive dialect (aliases, arguments, fragments, variables)") {
    def badParse(t: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](GraphQl.parse(t))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    badParse("""{ nick: f @pattern(of: "?s ?p ?o", to: "o") }""",
      "aliases are not supported")
    badParse("""{ f(first: 10) @pattern(of: "?s ?p ?o", to: "o") }""",
      "field arguments are not supported")
    badParse(
      """{ f @pattern(of: "?s ?p ?o", to: "o") { ...Parts } }""",
      "fragment spreads are not supported")
    badParse("""fragment Parts on Thing { id @bind(of: "?s") }""",
      "fragment definitions are not supported")
    badParse("""query Q($n: Int) { f @pattern(of: "?s ?p ?o", to: "o") }""",
      "operation variables are not supported")
    badParse("""{ ... on Thing { id @bind(of: "?s") } }""",
      "fragment spreads are not supported")
  }
}
