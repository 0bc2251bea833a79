package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UDF-macro registry — the reference defines macros as data (RDF) and
  * expands them into the query's expression tree before execution
  * (docs/sparql-extensions/macros.md:9-50, expansion
  * SparqlIntegrateCmdImpls.java:584-605). Same model here: a macro is a
  * named pure `Seq[Column] => Column`, applied at plan-build time — no
  * runtime UDF, no serialization, fully codegen'd.
  */
object Macros {

  private val registry = scala.collection.concurrent.TrieMap[String, Seq[Column] => Column](
    // the documented example macro: CONCAT('Hello ', STR(?x), '!')
    "greet" -> (args => concat(lit("Hello "), args.head.cast("string"), lit("!"))),
    "iriOf" -> (args => concat(lit("<"), args.head, lit(">"))),
    "pct"   -> (args => round(args(0) * 100.0 / args(1), 2))
  )

  def register(name: String, fn: Seq[Column] => Column): Unit =
    registry.put(name, fn)

  /** Expand a macro call into a Column tree (plan-build time). */
  def expand(name: String, args: Column*): Column =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown macro: $name"))(args)

  // ------------------------------------------------ text macros (RDF)

  /** A macro DEFINED AS DATA (the reference's `--macro macros.ttl`,
    * docs/examples/macro-example.sh): `eg:greet udf:simpleDefinition
    * ("CONCAT('Hello ', STR(?x), '!')" "x")` — a SPARQL expression body
    * plus parameter names, expanded into the caller's expression tree at
    * plan-build time by [[graft.rules.ConstructParser]]. `prefixes` are
    * the file's `sh:declare` entries, in scope for the body.
    */
  final case class TextMacro(body: String, params: Seq[String],
      prefixes: Map[String, String])

  private val textRegistry =
    scala.collection.concurrent.TrieMap[String, TextMacro]()

  def textMacro(iri: String): Option[TextMacro] = textRegistry.get(iri)

  private val UdfNs = "https://w3id.org/aksw/norse#udf."
  private val ShNs = "http://www.w3.org/ns/shacl#"
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private[graft] def litBody(term: String): String = {
    require(term.startsWith("\""), s"expected a literal, got $term")
    val close = term.lastIndexOf('"')
    val b = term.substring(1, close)
    val sb = new StringBuilder(b.length)
    var k = 0
    while (k < b.length) {
      val c = b.charAt(k)
      if (c == '\\' && k + 1 < b.length) {
        b.charAt(k + 1) match {
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t'); case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case o => sb.append('\\').append(o)
        }
        k += 2
      } else { sb.append(c); k += 1 }
    }
    sb.toString
  }

  /** Load `udf:simpleDefinition` macros (plus `sh:declare` prefix
    * declarations) from Turtle TEXT; returns how many were registered.
    * The mapping file is driver-side metadata, like RML mappings.
    */
  def loadTtl(ttl: String): Int = {
    val quads = graft.sources.TrigParser
      .parse(ttl, "<urn:x-arq:DefaultGraph>").toVector
    def objsOf(s: String, p: String): Seq[String] =
      quads.collect { case q if q.subj == s && q.pred == "<" + p + ">" => q.obj }
    // rdf:first/rdf:rest list walk
    def listOf(head: String): Seq[String] = {
      var node = head
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (node != "<" + RdfNs + "nil>") {
        val first = objsOf(node, RdfNs + "first")
        require(first.nonEmpty, s"malformed RDF list at $node")
        out += first.head
        val rest = objsOf(node, RdfNs + "rest")
        require(rest.nonEmpty, s"malformed RDF list at $node")
        node = rest.head
      }
      out.toSeq
    }
    // sh:declare [ sh:prefix "p" ; sh:namespace "ns" ] — file-global
    val declared = quads.collect {
      case q if q.pred == "<" + ShNs + "declare>" => q.obj
    }.flatMap { d =>
      for {
        p <- objsOf(d, ShNs + "prefix").headOption
        ns <- objsOf(d, ShNs + "namespace").headOption
      } yield litBody(p) ->
        (if (ns.startsWith("<")) ns.substring(1, ns.length - 1) else litBody(ns))
    }.toMap
    val defs = quads.filter(_.pred == "<" + UdfNs + "simpleDefinition>")
    defs.foreach { q =>
      require(q.subj.startsWith("<"),
        s"udf:simpleDefinition subject must be an IRI, got ${q.subj}")
      val items = listOf(q.obj)
      require(items.nonEmpty, s"${q.subj}: empty udf:simpleDefinition list")
      val body = litBody(items.head)
      val params = items.tail.map(litBody)
      textRegistry.put(q.subj.substring(1, q.subj.length - 1),
        TextMacro(body, params, declared))
    }
    defs.size
  }

  /** Load a macro file from disk (driver-side read). */
  def loadTtlFile(path: String): Int =
    loadTtl(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
