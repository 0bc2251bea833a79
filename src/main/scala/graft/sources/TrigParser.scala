package graft.sources

import scala.collection.mutable.ArrayBuffer

/** TriG / Turtle document parser producing quads in the engine's canonical
  * N-Quads lexical form (IRIs `<expanded>`, literals `"escaped"` with
  * optional `@lang`/`^^<dt>`, blank nodes `_:label`).
  *
  * Covers the subset the reference's `ngs` front door feeds on
  * (NgsCmdImpls.java:289-305 probes TriG/Turtle/N-Quads content types):
  * `@prefix`/`PREFIX` + `@base`/`BASE` directives, prefixed names, the `a`
  * keyword, `;` predicate lists and `,` object lists, named-graph blocks
  * (`<g> { … }` and `GRAPH <g> { … }`), default-graph statements, short and
  * long (triple-quoted) string literals with full escape decoding, numeric
  * (`xsd:integer`/`decimal`/`double`) and boolean shorthand, lang tags and
  * `^^` datatypes, blank-node labels, anonymous blank nodes `[…]` (fresh
  * deterministic `_:genN` labels in document order; nesting and
  * subject-position `[…] .` included), RDF collections `(…)` as
  * rdf:first/rest/nil chains, and `#` comments.
  *
  * Written from the W3C TriG/Turtle grammars — no reference code consulted
  * for the implementation.
  */
object TrigParser {

  final case class Quad4(graph: String, subj: String, pred: String, obj: String)

  private val RdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
  /** Labels reserved for generated anonymous bnodes (see readBnode) —
    * includes already-escaped forms (v-prefixed) so the re-scoping stays
    * injective: `_:gen0` → `_:vgen0`, a verbatim `_:vgen0` → `_:vvgen0`.
    */
  private[sources] val ReservedLabel =
    java.util.regex.Pattern.compile("v*(?:gen|c\\d+g|fn\\d+r)\\d+")
  private val XsdInteger = "<http://www.w3.org/2001/XMLSchema#integer>"
  private val XsdDecimal = "<http://www.w3.org/2001/XMLSchema#decimal>"
  private val XsdDouble = "<http://www.w3.org/2001/XMLSchema#double>"
  private val XsdBoolean = "<http://www.w3.org/2001/XMLSchema#boolean>"

  /** `genPrefix` namespaces the fresh `_:genN` labels allocated for
    * anonymous bnodes — chunked parallel parsing gives each chunk its own
    * prefix so labels never collide across chunks (bnode labels are
    * document-scoped and arbitrary per RDF semantics).
    */
  def parse(doc: String, defaultGraph: String,
      genPrefix: String = "gen"): Iterator[Quad4] =
    new P(doc, defaultGraph, genPrefix).run()

  /** N-Triples-escape a decoded literal body. */
  def ntEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c => b.append(c)
    }
    b.toString
  }

  private final class P(s: String, defaultGraph: String, genPrefix: String = "gen") {
    private var i = 0
    private val n = s.length
    private var base = ""
    private val prefixes = scala.collection.mutable.HashMap[String, String]()
    private val out = ArrayBuffer[Quad4]()
    // anonymous-bnode state: fresh labels are allocated in strict document
    // order (deterministic — the oracle can re-derive them); curGraph is
    // the graph the enclosing statement writes to, so `[…]`-internal
    // triples land in the same graph as their parent statement
    private var gen = 0
    private var curGraph = defaultGraph
    private var lastWasAnon = false

    private def freshBnode(): String = { val l = "_:" + genPrefix + gen; gen += 1; l }

    def run(): Iterator[Quad4] = {
      skipWs()
      while (i < n) { statement(); skipWs() }
      out.iterator
    }

    private def fail(msg: String): Nothing = {
      val ctx = s.substring(math.max(0, i - 30), math.min(n, i + 30))
      throw new IllegalArgumentException(s"TriG parse error at offset $i: $msg near «$ctx»")
    }

    private def skipWs(): Unit = {
      while (i < n) {
        val c = s.charAt(i)
        if (c == '#') { while (i < n && s.charAt(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else return
      }
    }

    private def peek: Char = if (i < n) s.charAt(i) else '\u0000'

    private def expect(c: Char): Unit =
      if (peek == c) i += 1 else fail(s"expected '$c'")

    private def keywordAhead(kw: String): Boolean = {
      // case-insensitive keyword followed by a non-name char (directives
      // and GRAPH only — SPARQL-form TriG keywords are case-insensitive)
      if (i + kw.length > n) return false
      if (!s.regionMatches(true, i, kw, 0, kw.length)) return false
      val after = i + kw.length
      after >= n || !isLocalChar(s.charAt(after))
    }

    /** Case-SENSITIVE keyword: `a`, `true`, `false` are case-sensitive in
      * the Turtle grammar — `A` between two terms or `TRUE` in object
      * position must fail, not silently canonicalize.
      */
    private def keywordAheadCS(kw: String): Boolean = {
      if (i + kw.length > n) return false
      if (!s.regionMatches(false, i, kw, 0, kw.length)) return false
      val after = i + kw.length
      after >= n || !isLocalChar(s.charAt(after))
    }

    private def isLocalChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == ':' ||
        c == '%' || c == '.'

    private def statement(): Unit = {
      if (keywordAhead("@prefix") || keywordAhead("PREFIX")) {
        val sparqlForm = peek != '@'
        i += (if (sparqlForm) "PREFIX".length else "@prefix".length)
        skipWs()
        val pfx = readPrefixLabel()
        skipWs()
        val iri = resolve(readIriRef()) // relative prefix IRIs resolve too
        prefixes(pfx) = iri
        skipWs()
        if (!sparqlForm) expect('.')
      } else if (keywordAhead("@base") || keywordAhead("BASE")) {
        val sparqlForm = peek != '@'
        i += (if (sparqlForm) "BASE".length else "@base".length)
        skipWs()
        base = resolve(readIriRef()) // a relative BASE resolves against the prior one
        skipWs()
        if (!sparqlForm) expect('.')
      } else if (keywordAhead("GRAPH")) {
        i += "GRAPH".length
        skipWs()
        val g = readGraphName()
        skipWs()
        graphBlock(g)
      } else if (peek == '{') { // anonymous default-graph block
        graphBlock(defaultGraph)
      } else {
        // either `term { … }` (named graph block) or a triples statement
        val t = readTerm(subjectPos = true)
        val anon = lastWasAnon
        skipWs()
        if (peek == '{') graphBlock(t)
        else {
          // `[ po-list ] .` — a bnode property list may be a whole statement
          if (!(anon && peek == '.')) predicateObjectList(defaultGraph, t)
          skipWs()
          // EOF terminates the FINAL statement in place of '.' — a
          // leniency some emitters rely on (the reference's own
          // unsorted-tests/triples.ttl ships without the final dot)
          if (i < n) expect('.')
        }
      }
    }

    private def readGraphName(): String = readTerm(subjectPos = true)

    private def graphBlock(g: String): Unit = {
      expect('{')
      val prevGraph = curGraph
      curGraph = g
      skipWs()
      while (peek != '}') {
        val subj = readTerm(subjectPos = true)
        val anon = lastWasAnon
        skipWs()
        if (!(anon && (peek == '.' || peek == '}'))) predicateObjectList(g, subj)
        skipWs()
        if (peek == '.') { i += 1; skipWs() } // optional inside blocks
      }
      curGraph = prevGraph
      expect('}')
      skipWs()
      if (peek == '.') i += 1 // tolerate `} .`
    }

    private def predicateObjectList(g: String, subj: String): Unit = {
      var more = true
      while (more) {
        skipWs()
        val pred =
          if (keywordAheadCS("a")) { i += 1; RdfType }
          else readTerm(subjectPos = false)
        var moreObjs = true
        while (moreObjs) {
          skipWs()
          val obj = readTerm(subjectPos = false)
          out += Quad4(g, subj, pred, obj)
          skipWs()
          if (peek == ',') i += 1 else moreObjs = false
        }
        if (peek == ';') {
          i += 1
          skipWs()
          // a ';' may be trailing (before '.', '}', or a closing ']')
          if (peek == '.' || peek == '}' || peek == ';' || peek == ']') more = false
          else more = true
        } else more = false
      }
    }

    private val RdfFirst = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
    private val RdfRest = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
    private val RdfNil = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"

    /** `[ po-list? ]` — fresh bnode; inner triples go to the current graph. */
    private def readAnonBnode(): String = {
      expect('[')
      val label = freshBnode()
      skipWs()
      if (peek != ']') predicateObjectList(curGraph, label)
      skipWs()
      expect(']')
      label
    }

    /** `( item… )` — rdf:first/rest chain; `()` is rdf:nil. */
    private def readCollection(): String = {
      expect('(')
      val items = ArrayBuffer[String]()
      skipWs()
      while (peek != ')') { items += readTerm(subjectPos = false); skipWs() }
      i += 1 // ')'
      if (items.isEmpty) RdfNil
      else {
        val nodes = items.map(_ => freshBnode())
        items.indices.foreach { k =>
          out += Quad4(curGraph, nodes(k), RdfFirst, items(k))
          out += Quad4(curGraph, nodes(k), RdfRest,
            if (k + 1 < nodes.length) nodes(k + 1) else RdfNil)
        }
        nodes.head
      }
    }

    /** Read one RDF term, returning its canonical N-Quads lexical form. */
    private def readTerm(subjectPos: Boolean): String = {
      skipWs()
      lastWasAnon = false
      peek match {
        case '<' => "<" + resolve(readIriRef()) + ">"
        case '"' | '\'' => readLiteral()
        case '_' => readBnode()
        case '[' => val l = readAnonBnode(); lastWasAnon = true; l
        case '(' => readCollection()
        case c if c.isDigit || c == '+' || c == '-' ||
            (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit) =>
          readNumber()
        case _ if keywordAheadCS("true") => i += 4; "\"true\"^^" + XsdBoolean
        case _ if keywordAheadCS("false") => i += 5; "\"false\"^^" + XsdBoolean
        case _ => readPrefixedName()
      }
    }

    /** RFC 3986 §5 reference resolution against `@base` (the reference
      * resolves relative IRIs per RFC 3986 via Jena's IRIx; re-implemented
      * from the RFC's merge + remove_dot_segments algorithms).
      */
    private def resolve(ref: String): String = {
      if (hasScheme(ref)) return ref // absolute IRI
      if (base.isEmpty) return ref   // no base declared: keep verbatim
      val ci = base.indexOf(':')
      if (ci <= 0 || !hasScheme(base)) fail(s"@base <$base> is not an absolute IRI")
      val scheme = base.substring(0, ci)
      val rest = base.substring(ci + 1)
      val (authority, pathQF) =
        if (rest.startsWith("//")) {
          val pi = rest.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
          if (pi < 0) (rest, "") else (rest.take(pi), rest.substring(pi))
        } else ("", rest)
      val basePath = pathQF.takeWhile(c => c != '?' && c != '#')
      if (ref.startsWith("//")) scheme + ":" + ref
      else if (ref.startsWith("#"))
        base.takeWhile(_ != '#') + ref // fragment replaces fragment
      else if (ref.startsWith("?"))
        scheme + ":" + authority + basePath + ref
      else if (ref.startsWith("/"))
        scheme + ":" + authority + removeDotSegments(ref)
      else {
        // merge (RFC 3986 §5.3): base path up to its last '/', then ref
        val merged =
          if (authority.nonEmpty && basePath.isEmpty) "/" + ref
          else basePath.take(basePath.lastIndexOf('/') + 1) + ref
        scheme + ":" + authority + removeDotSegments(merged)
      }
    }

    private def hasScheme(iri: String): Boolean = {
      if (iri.isEmpty || !iri.charAt(0).isLetter) return false
      var j = 1
      while (j < iri.length) {
        val c = iri.charAt(j)
        if (c == ':') return true
        if (!(c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return false
        j += 1
      }
      false
    }

    /** remove_dot_segments, RFC 3986 §5.2.4 verbatim. */
    private def removeDotSegments(path: String): String = {
      var in = path
      val out = new StringBuilder
      def popOut(): Unit = {
        val j = out.lastIndexOf("/")
        out.setLength(if (j < 0) 0 else j)
      }
      while (in.nonEmpty) {
        if (in.startsWith("../")) in = in.substring(3)
        else if (in.startsWith("./")) in = in.substring(2)
        else if (in.startsWith("/./")) in = "/" + in.substring(3)
        else if (in == "/.") in = "/"
        else if (in.startsWith("/../")) { in = "/" + in.substring(4); popOut() }
        else if (in == "/..") { in = "/"; popOut() }
        else if (in == "." || in == "..") in = ""
        else {
          val j = in.indexOf('/', 1)
          if (j < 0) { out.append(in); in = "" }
          else { out.append(in.take(j)); in = in.substring(j) }
        }
      }
      out.toString
    }

    private def readIriRef(): String = {
      expect('<')
      val j = s.indexOf('>', i)
      if (j < 0) fail("unterminated IRI")
      val iri = s.substring(i, j)
      i = j + 1
      iri
    }

    private def readPrefixLabel(): String = {
      val start = i
      while (i < n && s.charAt(i) != ':') {
        if (s.charAt(i).isWhitespace) fail("bad prefix label")
        i += 1
      }
      val pfx = s.substring(start, i)
      expect(':')
      pfx
    }

    private def readPrefixedName(): String = {
      val start = i
      while (i < n && s.charAt(i) != ':' && isLocalChar(s.charAt(i))) i += 1
      if (peek != ':') fail(s"expected prefixed name")
      val pfx = s.substring(start, i)
      i += 1 // ':'
      val lstart = i
      while (i < n && isLocalChar(s.charAt(i))) {
        // a '.' ends the local name unless followed by another local char
        // (so `ex:n0.` terminates the statement correctly)
        if (s.charAt(i) == '.' &&
            (i + 1 >= n || !isLocalChar(s.charAt(i + 1)) || s.charAt(i + 1) == '.'))
          return finishPrefixed(pfx, lstart)
        i += 1
      }
      finishPrefixed(pfx, lstart)
    }

    private def finishPrefixed(pfx: String, lstart: Int): String = {
      val local = s.substring(lstart, i)
      val ns = prefixes.getOrElse(pfx, fail(s"undeclared prefix '$pfx:'"))
      "<" + ns + local + ">"
    }

    private def readBnode(): String = {
      if (i + 1 >= n || s.charAt(i + 1) != ':') fail("expected _:label")
      i += 2
      val start = i
      while (i < n && (Character.isLetterOrDigit(s.charAt(i)) ||
        s.charAt(i) == '_' || s.charAt(i) == '-')) i += 1
      if (i == start) fail("empty blank node label")
      val label = s.substring(start, i)
      // a verbatim label inside the fresh-label namespace (genN / c<k>gN)
      // is deterministically re-scoped with a 'v' prefix — bnode labels
      // are arbitrary per RDF semantics, and without this a document's
      // own `_:gen0` would silently merge with a generated anonymous node
      "_:" + (if (TrigParser.ReservedLabel.matcher(label).matches) "v" + label
      else label)
    }

    private def readNumber(): String = {
      val start = i
      if (peek == '+' || peek == '-') i += 1
      var sawDot = false
      var sawExp = false
      while (i < n && (s.charAt(i).isDigit ||
          (s.charAt(i) == '.' && !sawDot && !sawExp &&
            i + 1 < n && s.charAt(i + 1).isDigit) ||
          ((s.charAt(i) == 'e' || s.charAt(i) == 'E') && !sawExp))) {
        if (s.charAt(i) == '.') sawDot = true
        if (s.charAt(i) == 'e' || s.charAt(i) == 'E') {
          sawExp = true
          i += 1
          if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        } else i += 1
      }
      val lex = s.substring(start, i)
      val dt = if (sawExp) XsdDouble else if (sawDot) XsdDecimal else XsdInteger
      "\"" + lex + "\"^^" + dt
    }

    private def readLiteral(): String = {
      val q = peek
      val long = i + 2 < n && s.charAt(i + 1) == q && s.charAt(i + 2) == q
      val body = if (long) readLongString(q) else readShortString(q)
      // suffix: @lang or ^^datatype
      if (peek == '@') {
        val start = i
        i += 1
        while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '-')) i += 1
        "\"" + ntEscape(body) + "\"" + s.substring(start, i)
      } else if (peek == '^' && i + 1 < n && s.charAt(i + 1) == '^') {
        i += 2
        val dt = readTerm(subjectPos = false) // IRI or prefixed name
        "\"" + ntEscape(body) + "\"^^" + dt
      } else "\"" + ntEscape(body) + "\""
    }

    private def readShortString(q: Char): String = {
      expect(q)
      val b = new StringBuilder
      while (i < n && s.charAt(i) != q) {
        val c = s.charAt(i)
        if (c == '\n') fail("newline in short string literal")
        if (c == '\\') { i += 1; b.append(decodeEscape()) }
        else { b.append(c); i += 1 }
      }
      expect(q)
      b.toString
    }

    private def readLongString(q: Char): String = {
      i += 3
      val b = new StringBuilder
      def atClose: Boolean = i + 2 <= n - 1 &&
        s.charAt(i) == q && s.charAt(i + 1) == q && s.charAt(i + 2) == q
      while (i < n && !atClose) {
        val c = s.charAt(i)
        if (c == '\\') { i += 1; b.append(decodeEscape()) }
        else { b.append(c); i += 1 }
      }
      if (!atClose) fail("unterminated long string")
      i += 3
      b.toString
    }

    /** Decode the char after a backslash (cursor ON that char). */
    private def decodeEscape(): String = {
      if (i >= n) fail("dangling escape")
      val c = s.charAt(i)
      i += 1
      c match {
        case 't' => "\t"
        case 'n' => "\n"
        case 'r' => "\r"
        case 'b' => "\b"
        case 'f' => "\f"
        case '"' => "\""
        case '\'' => "'"
        case '\\' => "\\"
        case 'u' =>
          if (i + 4 > n) fail("bad \\u escape")
          val cp = Integer.parseInt(s.substring(i, i + 4), 16)
          i += 4
          new String(Character.toChars(cp))
        case 'U' =>
          if (i + 8 > n) fail("bad \\U escape")
          val cp = Integer.parseInt(s.substring(i, i + 8), 16)
          i += 8
          new String(Character.toChars(cp))
        case other => fail(s"unknown escape \\$other")
      }
    }
  }
}
