package graft

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.server.SparqlHttpServer

/** SPARQL 1.1 Protocol conformance of the `--server` endpoint
  * (SURVEY §2 row 9; the reference's serving sink,
  * SparqlIntegrateCmdImpls.java:801-863, flags
  * CmdSparqlIntegrateMain.java:57,134-141) — every test talks real HTTP
  * over loopback via `java.net.http.HttpClient`.
  */
class ServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val client = HttpClient.newHttpClient()

  private def fixture() = {
    import spark.implicits._
    Seq(
      ("<urn:g1>", "<urn:a>", "<urn:p>", "\"x\""),
      ("<urn:g1>", "<urn:a>", "<urn:q>", "\"hei\"@no"),
      ("<urn:g2>", "<urn:b>", "<urn:p>",
        "\"7\"^^<http://www.w3.org/2001/XMLSchema#integer>"),
      ("<urn:g2>", "_:n1", "<urn:p>", "\"line1\\nline2 \\\"q\\\"\""))
      .toDF("graph", "subj", "pred", "obj")
  }

  private def withServer[A](readOnly: Boolean = false,
      unsafe: Boolean = false)(body: (String, SparqlHttpServer) => A): A = {
    val srv = SparqlHttpServer.start(spark, fixture(), port = 0,
      readOnly = readOnly, unsafe = unsafe)
    try body(s"http://127.0.0.1:${srv.port}", srv) finally srv.stop()
  }

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  private def get(url: String, accept: String = "")
      : (Int, String, String) = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
    val req = (if (accept.nonEmpty) b.header("Accept", accept) else b).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    (r.statusCode(), r.body(),
      Option(r.headers().firstValue("Content-Type").orElse("")).getOrElse(""))
  }

  private def post(url: String, ct: String, body: String)
      : (Int, String) = {
    val req = HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", ct)
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    (r.statusCode(), r.body())
  }

  test("GET ?query= SELECT returns SRJ with typed terms, lang, datatype, " +
    "bnode, and escaped strings; reader round-trips it") {
    withServer() { (base, _) =>
      val (code, body, ct) = get(
        s"$base/sparql?query=${enc("SELECT ?s ?o WHERE { ?s <urn:p> ?o }")}")
      assert(code == 200 && ct.contains("sparql-results+json"))
      // wire shape: typed terms per the SRJ spec
      assert(body.contains(""""s":{"type":"uri","value":"urn:a"}"""))
      assert(body.contains(""""type":"bnode","value":"n1""""))
      assert(body.contains(
        """"datatype":"http://www.w3.org/2001/XMLSchema#integer""""))
      // JSON escaping of a lexical form with newline + quotes (to_json)
      assert(body.contains("line1\\nline2 \\\"q\\\""))
      // the engine's own SRJ reader parses the writer's output back to
      // the exact term strings the server serialized
      val tmp = java.nio.file.Files.createTempFile("srv", ".srj")
      java.nio.file.Files.writeString(tmp, body)
      val back = graft.sources.ResultSetIO.readSrj(spark, tmp.toString)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(back == Set(
        ("\"x\"", "<urn:a>"),
        ("\"7\"^^<http://www.w3.org/2001/XMLSchema#integer>", "<urn:b>"),
        ("\"line1\\nline2 \\\"q\\\"\"", "_:n1")))
    }
  }

  test("lang-tagged literal carries xml:lang on the wire") {
    withServer() { (base, _) =>
      val (_, body, _) = get(
        s"$base/sparql?query=${enc("SELECT ?o WHERE { ?s <urn:q> ?o }")}")
      assert(body.contains(""""xml:lang":"no""""))
      assert(body.contains(""""value":"hei""""))
    }
  }

  test("ASK returns the boolean SRJ document (and SRX on demand)") {
    withServer() { (base, _) =>
      val (c1, b1, _) = get(
        s"$base/sparql?query=${enc("ASK { <urn:a> <urn:p> ?o }")}")
      assert(c1 == 200 && b1 == """{"head":{},"boolean":true}""")
      val (c2, b2, _) = get(
        s"$base/sparql?query=${enc("ASK { <urn:nosuch> <urn:p> ?o }")}")
      assert(c2 == 200 && b2 == """{"head":{},"boolean":false}""")
      val (_, b3, ct3) = get(
        s"$base/sparql?query=${enc("ASK { <urn:a> <urn:p> ?o }")}",
        accept = "application/sparql-results+xml")
      assert(ct3.contains("sparql-results+xml") &&
        b3.contains("<boolean>true</boolean>"))
    }
  }

  test("Accept negotiation: SRX and TSV for bindings") {
    withServer() { (base, _) =>
      val q = enc("SELECT ?s ?o WHERE { ?s <urn:p> ?o }")
      val (_, xml, ctX) = get(s"$base/sparql?query=$q",
        accept = "application/sparql-results+xml")
      assert(ctX.contains("sparql-results+xml"))
      assert(xml.contains("""<variable name="s"/>"""))
      assert(xml.contains("""<binding name="s"><uri>urn:a</uri></binding>"""))
      assert(xml.contains(
        """<literal datatype="http://www.w3.org/2001/XMLSchema#integer">7</literal>"""))
      val (_, tsv, ctT) = get(s"$base/sparql?query=$q",
        accept = "text/tab-separated-values")
      assert(ctT.contains("tab-separated-values"))
      val lines = tsv.trim.split("\n")
      assert(lines.head == "?s\t?o")
      // TSV carries the engine's canonical N-Triples term strings
      assert(lines.contains(
        "<urn:b>\t\"7\"^^<http://www.w3.org/2001/XMLSchema#integer>"))
    }
  }

  test("CONSTRUCT serves N-Quads by default and TriG on Accept; " +
    "default-graph output drops the graph term") {
    withServer() { (base, _) =>
      val q = enc("CONSTRUCT WHERE { ?s <urn:p> ?o }")
      val (c1, nq, ct1) = get(s"$base/sparql?query=$q")
      assert(c1 == 200 && ct1.contains("n-quads"))
      // CONSTRUCT emits into the default graph -> 3-term lines
      assert(nq.linesIterator.forall(l =>
        l.isEmpty || l.split(" ").length >= 4)) // s p o .
      assert(nq.contains("<urn:a> <urn:p> \"x\" ."))
      assert(!nq.contains("urn:x-arq:DefaultGraph"))
      val (_, trig, ct2) = get(s"$base/sparql?query=$q",
        accept = "application/trig")
      assert(ct2.contains("trig") && trig.contains("<urn:a> <urn:p> \"x\""))
    }
  }

  test("POST form update mutates the served dataset; raw " +
    "application/sparql-update body too; read-only rejects with 403") {
    withServer() { (base, srv) =>
      val (c1, _) = post(s"$base/sparql",
        "application/x-www-form-urlencoded",
        s"update=${enc("INSERT DATA { <urn:new> <urn:p> \"z\" }")}")
      assert(c1 == 204)
      val (_, b, _) = get(
        s"$base/sparql?query=${enc("ASK { <urn:new> <urn:p> \"z\" }")}")
      assert(b.contains("true"))
      val (c2, _) = post(s"$base/sparql", "application/sparql-update",
        "DELETE DATA { <urn:new> <urn:p> \"z\" }")
      assert(c2 == 204)
      val (_, b2, _) = get(
        s"$base/sparql?query=${enc("ASK { <urn:new> <urn:p> \"z\" }")}")
      assert(b2.contains("false"))
    }
    withServer(readOnly = true) { (base, _) =>
      val (code, body) = post(s"$base/sparql",
        "application/x-www-form-urlencoded",
        s"update=${enc("INSERT DATA { <urn:new> <urn:p> \"z\" }")}")
      assert(code == 403 && body.contains("read-only"))
    }
  }

  test("LOAD over the protocol requires --unsafe (file-access gate)") {
    withServer() { (base, _) =>
      val (code, body) = post(s"$base/sparql", "application/sparql-update",
        "LOAD <file:/etc/hostname>")
      assert(code == 403 && body.contains("--unsafe"))
    }
  }

  test("POST raw application/sparql-query body; parse errors answer 400") {
    withServer() { (base, _) =>
      val (c1, b1) = post(s"$base/sparql", "application/sparql-query",
        "SELECT ?s WHERE { ?s <urn:p> ?o }")
      assert(c1 == 200 && b1.contains("urn:a"))
      val (c2, b2) = post(s"$base/sparql", "application/sparql-query",
        "SELEKT bogus")
      assert(c2 == 400 && b2.contains("parse error"))
      val (c3, _, _) = get(s"$base/sparql")
      assert(c3 == 400)
    }
  }

  test("POST /graphql: JSON envelope and raw body both answer the " +
    "{\"data\":…} document") {
    withServer() { (base, _) =>
      val gq = "{ thing @pattern(of: \"?s <urn:p> ?o\", from: \"s\", " +
        "to: \"s\") { id @bind(of: \"?s\"), val @bind(of: \"?o\") } }"
      val (c1, b1) = post(s"$base/graphql", "application/json",
        s"""{"query":${SparqlHttpServer.jsonString(gq)}}""")
      assert(c1 == 200 && b1.startsWith("""{"data":{"""), b1)
      val (c2, b2) = post(s"$base/graphql", "application/graphql", gq)
      assert(c2 == 200 && b2 == b1)
      val (c3, b3) = post(s"$base/graphql", "application/json",
        """{"notquery": 1}""")
      assert(c3 == 400 && b3.contains("errors"))
    }
  }

  test("index at /, 404 elsewhere, 405 on bad method") {
    withServer() { (base, _) =>
      val (c1, b1, _) = get(s"$base/")
      assert(c1 == 200 && b1.contains("/sparql"))
      val (c2, _, _) = get(s"$base/nosuch")
      assert(c2 == 404)
      val (c3, _) = post(s"$base/sparql?x", "text/plain", "")
      assert(c3 == 400) // POST with no query/update param
    }
  }

  test("Integrate --server: workloads run first, the endpoint serves the " +
    "final state, lastServer exposes the ephemeral port") {
    val code = Integrate.run(
      Array("--server", "--port", "0",
        "INSERT DATA { <urn:i1> <urn:p> \"from-cli\" }"),
      spark, System.out, System.err, awaitServer = false)
    assert(code == 0)
    val srv = Integrate.lastServer.get
    try {
      val (c, b, _) = get(s"http://127.0.0.1:${srv.port}/sparql?query=" +
        enc("SELECT ?o WHERE { <urn:i1> <urn:p> ?o }"))
      assert(c == 200 && b.contains("from-cli"))
    } finally srv.stop()
  }

  test("unbound OPTIONAL var drops out of the SRJ binding object") {
    import spark.implicits._
    val ds = Seq(("<urn:g>", "<urn:a>", "<urn:p>", "\"x\""))
      .toDF("graph", "subj", "pred", "obj")
    val srv = SparqlHttpServer.start(spark, ds, port = 0)
    try {
      val (_, body, _) = get(s"http://127.0.0.1:${srv.port}/sparql?query=" +
        enc("SELECT ?s ?m WHERE { ?s <urn:p> ?o . " +
          "OPTIONAL { ?s <urn:missing> ?m } }"))
      assert(body.contains(""""s":{"type":"uri","value":"urn:a"}"""))
      assert(!body.contains("\"m\":"), body)
    } finally srv.stop()
  }
}
