package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.RdfTerms

/** SPARQL CONSTRUCT text → [[Rule]] compiler — the reference's front door
  * is "run this SPARQL statement text" (SparqlIntegrateCmdImpls.java:
  * 207,337-345); this makes the rule layer driveable by query text
  * instead of hand-built Scala.
  *
  * Semantics follow `sbs map -s` (SbsCmdImpls.java:204-228): the incoming
  * BINDING STREAM (a DataFrame, one var per column) REPLACES the query's
  * WHERE pattern; the WHERE clause may add `BIND(expr AS ?v)` derived
  * bindings and `FILTER(...)` conditions on top. A template triple with
  * any unbound (NULL) term is suppressed, per SPARQL CONSTRUCT semantics
  * (the compiled [[RuleCompiler]] already enforces this per triple).
  *
  * Grammar subset:
  *   PREFIX decls;
  *   CONSTRUCT { tmpl… | GRAPH term { tmpl… } … }
  *   WHERE { BIND(expr AS ?v)… FILTER(expr)… }
  * Expressions: ?var, "string", integer, IRIs (<…> or pfx:local),
  *   IRI(e), CONCAT(e…), STR(e), STRDT(e, iri), BOUND(?v), !e, e = e,
  *   e && e.
  *
  * Everything compiles to Catalyst `Column`s at parse time — the macro
  * model (SparqlIntegrateCmdImpls.java:584-605): no interpretation at
  * runtime, plans stay in whole-stage codegen.
  */
object ConstructParser {

  /** A compiled expression: `term=true` means the Column already holds a
    * final N-Triples lexical term (`<iri>`, `"lit"^^…`); `term=false`
    * means a RAW value (plain string/number) that becomes a plain literal
    * if used in a template position.
    */
  private final case class E(c: Column, term: Boolean)

  def parse(text: String): Seq[Rule] = new P(text).query()

  /** `<env:VAR>` IRI substitution (SparqlIntegrateCmdImpls.java:196-207;
    * NodeEnvsubst in SparqlStmtProcessor.java:48): every `<env:NAME>` IRI
    * in the statement text is replaced from the given map BEFORE parsing
    * — plan-build-time config injection, nothing at runtime. Unknown
    * names fail loudly (a silently-unsubstituted endpoint is worse).
    */
  def envSubst(text: String, env: Map[String, String]): String =
    "<env:([A-Za-z0-9_]+)>".r.replaceAllIn(text, m =>
      java.util.regex.Matcher.quoteReplacement("<" + env.getOrElse(m.group(1),
        throw new IllegalArgumentException(
          s"env substitution: ${m.group(1)} is not defined")) + ">"))

  def parse(text: String, env: Map[String, String]): Seq[Rule] =
    parse(envSubst(text, env))

  /** Parse a statement SEQUENCE (the reference's `.sparql` file model:
    * several CONSTRUCT statements in order, PREFIX declarations carrying
    * over across statements — SparqlScriptProcessor behavior, tested by
    * the reference's namespace-test.sparql). Returns one rule set per
    * statement; run them in order with [[RuleCompiler]] / `pipeline.Script`.
    */
  def parseSequence(text: String): Seq[Seq[Rule]] = {
    val p = new P(text)
    val out = scala.collection.mutable.ArrayBuffer[Seq[Rule]]()
    while (p.hasMore) out += p.query(expectEnd = false)
    require(out.nonEmpty, "empty statement sequence")
    out.toSeq
  }

  private final class P(s: String) {
    private var i = 0
    private val n = s.length
    private val prefixes = scala.collection.mutable.HashMap[String, String]()
    private var binds = scala.collection.mutable.LinkedHashMap[String, E]()
    private var filters = scala.collection.mutable.ArrayBuffer[Column]()

    def hasMore: Boolean = { skipWs(); i < n }

    def query(expectEnd: Boolean = true): Seq[Rule] = {
      binds = scala.collection.mutable.LinkedHashMap[String, E]()
      filters = scala.collection.mutable.ArrayBuffer[Column]()
      skipWs()
      while (kw("PREFIX")) {
        skipWs()
        val pfx = until(':'); i += 1
        skipWs()
        prefixes(pfx) = iriRef()
        skipWs()
      }
      if (!kw("CONSTRUCT")) fail("expected CONSTRUCT")
      skipWs()
      val templates = templateBlock()
      skipWs()
      if (!kw("WHERE")) fail("expected WHERE")
      skipWs()
      whereBlock()
      skipWs()
      if (peek == ';') i += 1 // optional statement separator
      skipWs()
      if (expectEnd && i < n) fail("trailing input")
      // resolve templates now that all BINDs are known
      val where = filters.reduceOption(_ && _).getOrElse(lit(true))
      Seq(Rule("construct", where, templates.map { case (st, pt, ot, gt) =>
        TripleTemplate(termOf(st), termOf(pt), termOf(ot), termOf(gt))
      }))
    }

    // ---------------------------------------------------------- templates

    /** Raw template terms collected before resolution (graph included). */
    private type T = (Tok, Tok, Tok, Tok)
    private sealed trait Tok
    private case class VarT(name: String) extends Tok
    private case class IriT(iri: String) extends Tok
    private case class StrT(v: String) extends Tok
    private case class NumT(lex: String) extends Tok

    private def templateBlock(): Seq[T] = {
      expect('{')
      val out = scala.collection.mutable.ArrayBuffer[T]()
      val DefaultG = IriT("urn:x-arq:DefaultGraph")
      skipWs()
      while (peek != '}') {
        if (kw("GRAPH")) {
          skipWs()
          val g = tok()
          skipWs(); expect('{'); skipWs()
          while (peek != '}') {
            val (a, b, c) = tripleTail()
            out += ((a, b, c, g))
            skipWs()
          }
          expect('}')
        } else {
          val (a, b, c) = tripleTail()
          out += ((a, b, c, DefaultG))
        }
        skipWs()
      }
      expect('}')
      out.toSeq
    }

    private def tripleTail(): (Tok, Tok, Tok) = {
      val a = tok(); skipWs()
      val b = if (kw("a")) IriT(RdfTerms.RdfType) else tok()
      skipWs()
      val c = tok(); skipWs()
      if (peek == '.') i += 1
      (a, b, c)
    }

    private def tok(): Tok = {
      skipWs()
      peek match {
        case '?' => VarT(varName())
        case '<' => IriT(iriRef())
        case '"' => StrT(stringLit())
        case c if c.isDigit || c == '-' => NumT(number())
        case _ => IriT(prefixedIri())
      }
    }

    /** Template token → final term Column. */
    private def termOf(t: Tok): Column = t match {
      case IriT(iri) => lit("<" + iri + ">")
      case StrT(v) => lit("\"" + TrigEscape(v) + "\"")
      case NumT(lex) =>
        lit("\"" + lex + "\"^^<http://www.w3.org/2001/XMLSchema#integer>")
      case VarT(v) => binds.get(v) match {
        case Some(E(c, true)) => c
        case Some(E(c, false)) => RdfTerms.strLit(c.cast("string"))
        case None => RdfTerms.strLit(col(v).cast("string"))
      }
    }

    private def TrigEscape(v: String): String =
      v.flatMap {
        case '\\' => "\\\\"; case '"' => "\\\""
        case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
        case c => c.toString
      }

    // -------------------------------------------------------------- where

    private def whereBlock(): Unit = {
      expect('{')
      skipWs()
      while (peek != '}') {
        if (kw("BIND")) {
          skipWs(); expect('(')
          val e = expr()
          skipWs()
          if (!kw("AS")) fail("expected AS in BIND")
          skipWs()
          val v = varName()
          skipWs(); expect(')')
          binds(v) = e
        } else if (kw("FILTER")) {
          skipWs(); expect('(')
          filters += boolOf(expr())
          skipWs(); expect(')')
        } else fail("expected BIND or FILTER (the binding stream replaces the pattern)")
        skipWs()
        if (peek == '.') { i += 1; skipWs() }
      }
      expect('}')
    }

    private def boolOf(e: E): Column = e.c

    // -------------------------------------------------------- expressions

    private def expr(): E = {
      var left = cmp()
      skipWs()
      while (peek == '&' && i + 1 < n && s.charAt(i + 1) == '&') {
        i += 2
        val right = cmp()
        left = E(left.c && right.c, term = false)
        skipWs()
      }
      left
    }

    private def cmp(): E = {
      val left = unary()
      skipWs()
      if (peek == '=') { i += 1; val r = unary(); E(left.c === r.c, term = false) }
      else if (peek == '!' && i + 1 < n && s.charAt(i + 1) == '=') {
        i += 2; val r = unary(); E(left.c =!= r.c, term = false)
      } else left
    }

    private def unary(): E = {
      skipWs()
      if (peek == '!') { i += 1; val e = unary(); E(!e.c, term = false) }
      else primary()
    }

    private def primary(): E = {
      skipWs()
      peek match {
        case '?' =>
          val v = varName()
          binds.getOrElse(v, E(col(v), term = false))
        case '"' => E(lit(stringLit()), term = false)
        case '<' => E(lit("<" + iriRef() + ">"), term = true)
        case '(' => i += 1; val e = expr(); skipWs(); expect(')'); e
        case c if c.isDigit || c == '-' => E(lit(number()).cast("string"), term = false)
        case _ if kw("IRI") || kw("URI") =>
          val args = argList()
          require(args.size == 1, "IRI takes 1 argument")
          E(concat(lit("<"), raw(args.head), lit(">")), term = true)
        case _ if kw("CONCAT") =>
          val args = argList()
          E(concat(args.map(raw): _*), term = false)
        case _ if kw("STRDT") =>
          val args = argList() // (raw lexical, datatype iri term)
          require(args.size == 2, "STRDT takes 2 arguments")
          E(concat(lit("\""), RdfTerms.ntEscape(raw(args.head)),
            lit("\"^^"), args(1).c), term = true)
        case _ if kw("STR") =>
          val args = argList()
          require(args.size == 1, "STR takes 1 argument")
          E(raw(args.head), term = false)
        case _ if kw("BOUND") =>
          val args = argList()
          require(args.size == 1, "BOUND takes 1 argument")
          E(args.head.c.isNotNull, term = false)
        case c if Character.isLetter(c) || c == '_' =>
          E(lit("<" + prefixedIri() + ">"), term = true) // e.g. xsd:long
        case _ => fail("unsupported expression")
      }
    }

    /** Raw string value of an expression (IRIs keep their <…>-free form
      * only when built by IRI(); terms passed to CONCAT/STR are used as
      * their string value).
      */
    private def raw(e: E): Column = e.c.cast("string")

    private def argList(): Seq[E] = {
      skipWs(); expect('(')
      val out = scala.collection.mutable.ArrayBuffer[E]()
      skipWs()
      if (peek != ')') {
        out += expr()
        skipWs()
        while (peek == ',') { i += 1; out += expr(); skipWs() }
      }
      expect(')')
      out.toSeq
    }

    // --------------------------------------------------------- lexer bits

    private def fail(msg: String): Nothing = {
      val ctx = s.substring(math.max(0, i - 25), math.min(n, i + 25))
      throw new IllegalArgumentException(
        s"CONSTRUCT parse error at offset $i: $msg near «$ctx»")
    }

    private def skipWs(): Unit = {
      while (i < n) {
        val c = s.charAt(i)
        if (c == '#') { while (i < n && s.charAt(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else return
      }
    }

    private def peek: Char = if (i < n) s.charAt(i) else ' '

    private def expect(c: Char): Unit =
      if (peek == c) i += 1 else fail(s"expected '$c'")

    private def kw(w: String): Boolean = {
      if (i + w.length > n || !s.regionMatches(true, i, w, 0, w.length)) return false
      val after = i + w.length
      val ok = after >= n || !(Character.isLetterOrDigit(s.charAt(after)) ||
        s.charAt(after) == '_' || s.charAt(after) == ':')
      if (ok) i += w.length
      ok
    }

    private def until(c: Char): String = {
      val start = i
      while (i < n && s.charAt(i) != c) i += 1
      s.substring(start, i)
    }

    private def varName(): String = {
      expect('?')
      val start = i
      while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')) i += 1
      if (i == start) fail("empty variable name")
      s.substring(start, i)
    }

    private def iriRef(): String = {
      expect('<')
      val v = until('>')
      expect('>')
      v
    }

    private def prefixedIri(): String = {
      val start = i
      while (i < n && s.charAt(i) != ':' &&
        (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')) i += 1
      if (peek != ':') fail("expected prefixed name")
      val pfx = s.substring(start, i)
      i += 1
      val lstart = i
      while (i < n && (Character.isLetterOrDigit(s.charAt(i)) ||
        s.charAt(i) == '_' || s.charAt(i) == '-' || s.charAt(i) == '/')) i += 1
      val ns = prefixes.getOrElse(pfx, fail(s"undeclared prefix '$pfx:'"))
      ns + s.substring(lstart, i)
    }

    private def stringLit(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < n && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          if (i + 1 >= n) fail("dangling escape")
          i += 1
          s.charAt(i) match {
            case 'n' => b.append('\n'); i += 1
            case 't' => b.append('\t'); i += 1
            case 'r' => b.append('\r'); i += 1
            case 'b' => b.append('\b'); i += 1
            case 'f' => b.append('\f'); i += 1
            case '"' => b.append('"'); i += 1
            case '\'' => b.append('\''); i += 1
            case '\\' => b.append('\\'); i += 1
            case 'u' =>
              if (i + 5 > n) fail("bad \\u escape")
              b.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 5
            case o => fail(s"unsupported escape \\$o") // never drop silently
          }
        } else { b.append(s.charAt(i)); i += 1 }
      }
      expect('"')
      b.toString
    }

    private def number(): String = {
      val start = i
      if (peek == '-') i += 1
      while (i < n && s.charAt(i).isDigit) i += 1
      s.substring(start, i)
    }
  }
}
