package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RDF term construction / N-Triples lexical encoding as pure `Column`
  * compositions (whole-stage-codegen friendly: every helper expands to
  * built-in Catalyst expressions, no UDFs on the hot path).
  *
  * Semantics follow the reference's term-to-lexical rules:
  *   - IRIs rendered `<iri>` (N-Triples)
  *   - literals `"lexical"` with `\` `"` `\n` `\r` `\t` escaped, optional
  *     `^^<datatype>`; graph-name crafting for literal/bnode subjects uses
  *     `urn:literal:<pct-encoded>` / `urn:bnode:<label>`
  *     (reference: NamedGraphStreamOps.java:23-30, RPT snapshot 2024-10-24).
  */
object RdfTerms {

  /** Escape a string for an N-Triples literal body. Backslash first.
    * Literal `replace` (codegen substring search), NOT regexp_replace —
    * the regex engine costs ~40× on hot text columns (see
    * [[graft.functions.Tokenize]]).
    */
  def ntEscape(c: Column): Column = {
    val bs = replace(c, lit("\\"), lit("\\\\"))
    val q  = replace(bs, lit("\""), lit("\\\""))
    val n  = replace(q, lit("\n"), lit("\\n"))
    val r  = replace(n, lit("\r"), lit("\\r"))
    replace(r, lit("\t"), lit("\\t"))
  }

  /** Inverse of [[ntEscape]]: decode an N-Triples literal body back to
    * its raw string. A \\u0001 sentinel protects literal backslashes so
    * `\\\\n` decodes to backslash-n, not newline (U+0001 itself cannot
    * round-trip — acceptable: ntEscape never emits it).
    */
  def ntUnescape(c: Column): Column = {
    val bs = replace(c, lit("\\\\"), lit("\u0001"))
    val q  = replace(bs, lit("\\\""), lit("\""))
    val n  = replace(q, lit("\\n"), lit("\n"))
    val r  = replace(n, lit("\\r"), lit("\r"))
    val t  = replace(r, lit("\\t"), lit("\t"))
    replace(t, lit("\u0001"), lit("\\"))
  }

  /** IRI-safe percent-encoding (R2RML §7.3 / RFC 3986 for the printable
    * ASCII range + the common C0 controls \n \r \t): chars outside
    * unreserved [A-Za-z0-9-._~] are %-encoded; non-ASCII stays as-is
    * (iunreserved — these are IRIs, not URIs; fn:encode-for-uri over
    * URIs would also encode the UTF-8 octets of non-ASCII — documented
    * IRI-flavored deviation). Literal `replace` chain, no regex; `%`
    * first so the encoding is injective.
    */
  val IriUnsafe: Seq[(String, String)] = Seq(
    "%" -> "%25", "\n" -> "%0A", "\r" -> "%0D", "\t" -> "%09",
    " " -> "%20", "!" -> "%21", "\"" -> "%22", "#" -> "%23",
    "$" -> "%24", "&" -> "%26", "'" -> "%27", "(" -> "%28", ")" -> "%29",
    "*" -> "%2A", "+" -> "%2B", "," -> "%2C", "/" -> "%2F", ":" -> "%3A",
    ";" -> "%3B", "<" -> "%3C", "=" -> "%3D", ">" -> "%3E", "?" -> "%3F",
    "@" -> "%40", "[" -> "%5B", "\\" -> "%5C", "]" -> "%5D", "^" -> "%5E",
    "`" -> "%60", "{" -> "%7B", "|" -> "%7C", "}" -> "%7D")

  def iriSafe(c: Column): Column =
    IriUnsafe.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to)) }

  /** Lexical form of an N-Triples term column: IRI body, literal body
    * (datatype/lang suffix stripped), bnode label as-is — the SPARQL
    * STR() shape, shared by the parser and the GraphQL compiler.
    */
  def termLexical(c0: Column): Column = {
    val c = c0.cast("string")
    // literal bodies carry N-Triples escapes — STR() must yield the RAW
    // lexical form or a later re-escape (STRDT of a json body with
    // quotes) doubles the backslashes
    when(c.startsWith("<"), regexp_extract(c, "^<(.*)>$", 1))
      .when(c.startsWith("\""), ntUnescape(
        regexp_extract(c, "(?s)^\"(.*)\"(?:@[A-Za-z0-9-]*|\\^\\^<[^>]*>)?$", 1)))
      .otherwise(c)
  }

  /** `<iri>` */
  def iri(c: Column): Column = concat(lit("<"), c, lit(">"))
  def iri(s: String): Column = lit("<" + s + ">")

  /** Plain string literal `"..."` (escaped). */
  def strLit(c: Column): Column = concat(lit("\""), ntEscape(c), lit("\""))

  /** Typed literal `"..."^^<dt>`. Lexical form must already be canonical. */
  def typedLit(c: Column, dt: String): Column =
    concat(lit("\""), ntEscape(c), lit("\"^^<" + dt + ">"))

  def longLit(c: Column): Column =
    typedLit(c.cast("string"), "http://www.w3.org/2001/XMLSchema#long")

  def intLit(c: Column): Column =
    typedLit(c.cast("string"), "http://www.w3.org/2001/XMLSchema#integer")

  // Common vocabulary
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Graph-name crafting for a subject term (ngs subjects semantics):
    * IRI as-is; blank node -> urn:bnode:label; literal -> urn:literal:enc.
    * Input is our N-Triples lexical string column.
    */
  def graphNameForSubject(term: Column): Column =
    when(term.startsWith("<"), term) // IRI: keep as-is (angle-bracketed)
      .when(term.startsWith("_:"),
        concat(lit("<urn:bnode:"), substring_index(term, "_:", -1), lit(">")))
      .otherwise( // literal: pct-encode the lexical form (quotes stripped)
        concat(lit("<urn:literal:"),
          url_encode(regexp_replace(term, "^\"|\"$", "")), lit(">")))
}
