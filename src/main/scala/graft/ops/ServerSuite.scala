package graft.ops

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.server.SparqlHttpServer
import graft.sources.{RdfIO, ResultSetIO, SyntheticQuads}

/** Driver entries for the `--server` endpoint (SURVEY §2 row 9 — the
  * reference's serving sink, SparqlIntegrateCmdImpls.java:801-863): each
  * entry stands a real [[SparqlHttpServer]] up on an ephemeral loopback
  * port, exercises the SPARQL 1.1 Protocol over actual HTTP, and parses
  * the wire response back through the engine's own result-set/RDF
  * readers — so the protocol layer, the distributed serializers, and the
  * readers all sit under the DuckDB oracle gate as one loop.
  */
object ServerSuite {

  private lazy val client = HttpClient.newHttpClient()

  private def get(url: String, accept: String = ""): String = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
    val req = (if (accept.nonEmpty) b.header("Accept", accept) else b).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    require(resp.statusCode() == 200,
      s"GET $url -> ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  private def postForm(url: String, body: String): Int = {
    val req = HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()
    client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8)).statusCode()
  }

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  private def tmpWrite(suffix: String, body: String): String = {
    val p = Files.createTempFile("graft-server", suffix)
    p.toFile.deleteOnExit()
    Files.writeString(p, body)
    p.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SELECT over HTTP: GET /sparql?query=… → SRJ response → readSrj.
    // The SRJ writer is the distributed to_json path; round-tripping
    // through the engine's own reader pins writer==reader bit-for-bit.
    "server_select" -> ((s, dir) => {
      val quads = SyntheticQuads(s, dir).drop("idx")
      val srv = SparqlHttpServer.start(s, quads, port = 0)
      try {
        val q = "SELECT ?s ?o WHERE { ?s <http://www.example.org/idx> ?o }"
        val body = get(s"http://127.0.0.1:${srv.port}/sparql?query=${enc(q)}")
        ResultSetIO.readSrj(s, tmpWrite(".srj", body))
      } finally srv.stop()
    }),
    // Update over HTTP then CONSTRUCT over HTTP: POST update= mutates the
    // served dataset (the CLI's applyStmt path), the follow-up GET
    // observes the mutation; the N-Quads response parses back through
    // readRdfAuto. Proves the protocol's read-write loop end to end.
    "server_update_construct" -> ((s, dir) => {
      val quads = SyntheticQuads(s, dir).drop("idx")
      val srv = SparqlHttpServer.start(s, quads, port = 0)
      try {
        val upd = "INSERT { ?s <http://www.example.org/flag> \"y\" } " +
          "WHERE { ?s <http://www.example.org/idx> ?o }"
        val code = postForm(s"http://127.0.0.1:${srv.port}/sparql",
          s"update=${enc(upd)}")
        require(code == 204, s"update -> $code")
        val body = get(
          s"http://127.0.0.1:${srv.port}/sparql?query=${enc(
            "CONSTRUCT WHERE { ?s ?p ?o }")}",
          accept = "application/n-quads")
        RdfIO.readRdfAuto(s, tmpWrite(".nq", body))
          .select(col("subj"), col("pred"), col("obj"))
      } finally srv.stop()
    })
  )

  val oracles: Map[String, String] = Map(
    "server_select" ->
      s"""WITH ${SyntheticQuads.oracleCte}
         |SELECT subj AS s, obj AS o FROM quads""".stripMargin,
    // originals ∪ one flag triple per subject (CONSTRUCT output is a
    // quad SET; subj is unique per orderkey so no dedup arithmetic)
    "server_update_construct" ->
      s"""WITH ${SyntheticQuads.oracleCte}
         |SELECT subj, pred, obj FROM quads
         |UNION ALL
         |SELECT subj, '<http://www.example.org/flag>' AS pred,
         |       '"y"' AS obj FROM quads""".stripMargin
  )
}
