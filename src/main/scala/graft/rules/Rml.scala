package graft.rules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.RdfTerms
import graft.sources.TrigParser

/** (R2)RML → Spark compiler: the reference's headline KG-construction
  * workload (`rpt rmltk rml to sparql` + `optimize workload` + `sansa
  * query`, docs/rml/index.md:10-41; the rml2exec command itself is
  * commented out upstream, CmdRml2Exec.java:1-4, with the compiler in the
  * external rmltk dependency — re-expressed here from the public RML /
  * R2RML vocabularies, not ported).
  *
  * Spark-first design: a mapping file is DRIVER-SIDE METADATA (a few KB
  * of Turtle), parsed once with [[TrigParser]]; every triples map
  * compiles to [[Rule]] templates — pure Catalyst column expressions —
  * and all maps sharing one logical source FUSE onto a single scan with
  * a single explode ([[RuleCompiler.compile]]), which is the shared-scan
  * grouping the reference calls `optimize workload`
  * (docs/rml/index.md:23-28) done at plan-build time. Referencing object
  * maps (rr:parentTriplesMap) become equi-joins between the child and
  * parent scans — broadcastable by AQE when the parent side is small —
  * or, when child and parent share the logical source and there is no
  * join condition, collapse into the shared scan (same-row semantics per
  * R2RML §8.4, no join at all).
  *
  * Supported subset (everything else fails LOUDLY, never silently):
  * logical sources over CSV files (header row), JSON files (top-level
  * array iterator `$[*]`, all primitives read as strings — mirroring the
  * reference's deliberate choice to register JSON *without* natural
  * mappings, CmdRml2Exec.java:62-63) and XML files (`ql:XPath`: the
  * rml:iterator selects row nodes, references are relative XPaths, see
  * [[readXml]]); subject/predicate/object/graph
  * maps via rr:template / rml:reference / rr:column / rr:constant with
  * rr:termType, rr:datatype, rr:language, rr:class and the
  * rr:subject/rr:predicate/rr:object/rr:graph constant shortcuts; both
  * the classic namespaces (rr:, rml:, ql:) and the RML2 namespace
  * (http://w3id.org/rml/).
  */
object Rml {

  // ---------------------------------------------------------------- model

  final case class LogicalSource(
      source: String, formulation: String, iterator: Option[String])

  sealed trait TermGen
  /** rr:template — `{ref}` parts interpolate column values (IRI-safe
    * percent-encoded in IRI context, R2RML §7.3).
    */
  final case class TemplateGen(template: String, termType: String,
      datatype: Option[String], language: Option[String]) extends TermGen
  /** rml:reference / rr:column — the column's value as-is. */
  final case class RefGen(ref: String, termType: String,
      datatype: Option[String], language: Option[String]) extends TermGen
  /** rr:constant — an already-formatted N-Triples term. */
  final case class ConstGen(term: String) extends TermGen
  /** rr:parentTriplesMap + rr:joinCondition* (child, parent). */
  final case class RefObjectGen(parentMap: String,
      joins: Seq[(String, String)]) extends TermGen

  final case class Pom(predicates: Seq[TermGen], objects: Seq[TermGen],
      graphs: Seq[TermGen])

  final case class TriplesMap(
      id: String,
      source: LogicalSource,
      subject: TermGen,
      classes: Seq[String],
      graphs: Seq[TermGen],
      poms: Seq[Pom])

  val DefaultGraph = "<urn:x-arq:DefaultGraph>"
  private val RdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

  // -------------------------------------------------------------- parsing

  private val Namespaces = Seq(
    "http://www.w3.org/ns/r2rml#",
    "http://semweb.mmlab.be/ns/rml#",
    "http://semweb.mmlab.be/ns/ql#",
    "http://w3id.org/rml/")

  /** `<ns-iri>` → local name for the RML/R2RML vocabularies; anything
    * else keeps its full term form.
    */
  private def local(term: String): String =
    if (term.startsWith("<") && term.endsWith(">")) {
      val iri = term.substring(1, term.length - 1)
      Namespaces.find(iri.startsWith)
        .map(ns => iri.substring(ns.length)).getOrElse(term)
    } else term

  /** Decoded body of an N-Triples literal term ("..."[@lang|^^<dt>]). */
  private def litBody(term: String): String = {
    require(term.startsWith("\""),
      s"expected a literal in the RML mapping, got $term")
    val close = {
      var k = 1; var esc = false; var at = -1
      while (at < 0 && k < term.length) {
        val c = term.charAt(k)
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') at = k
        k += 1
      }
      require(at > 0, s"unterminated literal in RML mapping: $term"); at
    }
    val b = term.substring(1, close)
    // reverse of TrigParser.ntEscape
    val sb = new StringBuilder(b.length)
    var k = 0
    while (k < b.length) {
      val c = b.charAt(k)
      if (c == '\\' && k + 1 < b.length) {
        b.charAt(k + 1) match {
          case '\\' => sb.append('\\'); case '"' => sb.append('"')
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t'); case o => sb.append('\\').append(o)
        }
        k += 2
      } else { sb.append(c); k += 1 }
    }
    sb.toString
  }

  /** Parse a mapping document (Turtle text) into its triples maps —
    * driver-side metadata work, deterministic order by map id.
    */
  def parseMapping(ttl: String): Seq[TriplesMap] = {
    val quads = TrigParser.parse(ttl, DefaultGraph, genPrefix = "rml").toSeq
    // subject → (normalized predicate local name → object terms, in order)
    val idx: Map[String, Seq[(String, String)]] =
      quads.groupBy(_.subj).map { case (s, qs) =>
        s -> qs.map(q => (local(q.pred), q.obj))
      }
    def props(s: String): Seq[(String, String)] = idx.getOrElse(s, Nil)
    def objs(s: String, p: String): Seq[String] =
      props(s).collect { case (`p`, o) => o }
    def obj1(s: String, p: String): Option[String] = objs(s, p).headOption

    def termType(node: String, default: String): String =
      obj1(node, "termType").map(local) match {
        case Some(t @ ("IRI" | "Literal" | "BlankNode")) => t
        case Some(other) => throw new IllegalArgumentException(
          s"unsupported rr:termType $other")
        case None => default
      }

    /** A term map node in `pos` ∈ subject|predicate|object|graph. */
    def termMap(node: String, pos: String): TermGen = {
      val defaultType = if (pos == "object") "Literal" else "IRI"
      (obj1(node, "template"), obj1(node, "reference")
          .orElse(obj1(node, "column")), obj1(node, "constant"),
          obj1(node, "parentTriplesMap")) match {
        case (Some(t), None, None, None) =>
          val dt = obj1(node, "datatype").map(d => d.substring(1, d.length - 1))
          val lang = obj1(node, "language").map(litBody)
          // R2RML §7.4.1: rr:language / rr:datatype make an object map a
          // literal by default (otherwise templates default to IRI)
          val deflt =
            if (pos == "object" && (dt.nonEmpty || lang.nonEmpty)) "Literal"
            else "IRI"
          val tt = termType(node, deflt)
          require(tt == "Literal" || (dt.isEmpty && lang.isEmpty),
            s"rr:language / rr:datatype are only valid on Literal term " +
              s"maps (at $node in $pos, termType $tt)")
          TemplateGen(litBody(t), tt, dt, lang)
        case (None, Some(r), None, None) =>
          RefGen(litBody(r), termType(node, defaultType),
            obj1(node, "datatype").map(d => d.substring(1, d.length - 1)),
            obj1(node, "language").map(litBody))
        case (None, None, Some(c), None) =>
          ConstGen(c) // IRI/bnode/literal term, already N-Triples-formatted
        case (None, None, None, Some(p)) =>
          require(pos == "object",
            s"rr:parentTriplesMap is only valid in an object map")
          val joins = objs(node, "joinCondition").map { jc =>
            (litBody(obj1(jc, "child").getOrElse(throw new IllegalArgumentException(
              "rr:joinCondition needs rr:child"))),
              litBody(obj1(jc, "parent").getOrElse(throw new IllegalArgumentException(
                "rr:joinCondition needs rr:parent"))))
          }
          RefObjectGen(p, joins)
        case _ => throw new IllegalArgumentException(
          s"a term map needs exactly one of rr:template / rml:reference / " +
            s"rr:column / rr:constant / rr:parentTriplesMap (at $node in $pos)")
      }
    }

    /** Shortcut (rr:subject/predicate/object/graph) + map form. */
    def termMaps(s: String, shortcut: String, mapProp: String,
        pos: String): Seq[TermGen] =
      objs(s, shortcut).map(t => ConstGen(t): TermGen) ++
        objs(s, mapProp).map(termMap(_, pos))

    val tmSubjects = idx.keys.filter(s => props(s).exists(_._1 == "logicalSource"))
    tmSubjects.toSeq.sorted.map { tmId =>
      val lsNode = obj1(tmId, "logicalSource").get
      val srcTerm = obj1(lsNode, "source").getOrElse(
        throw new IllegalArgumentException(s"$tmId: logicalSource needs rml:source"))
      require(srcTerm.startsWith("\""),
        s"$tmId: only plain file-path rml:source literals are supported " +
          s"(got $srcTerm — DCAT/SPARQL-service/database sources are out of scope)")
      require(obj1(lsNode, "query").isEmpty && obj1(lsNode, "tableName").isEmpty,
        s"$tmId: rml:query / rr:tableName logical sources are not supported")
      val formulation = obj1(lsNode, "referenceFormulation").map(local)
        .getOrElse("CSV")
      val ls = LogicalSource(litBody(srcTerm), formulation,
        obj1(lsNode, "iterator").map(litBody))

      val subjShort = objs(tmId, "subject").map(t => ConstGen(t): TermGen)
      val subjMaps = objs(tmId, "subjectMap")
      val subjects = subjShort ++ subjMaps.map(termMap(_, "subject"))
      require(subjects.size == 1,
        s"$tmId: exactly one subject map required, got ${subjects.size}")
      val classes = subjMaps.flatMap(sm => objs(sm, "class"))
      val graphs = subjMaps.flatMap(sm =>
        termMaps(sm, "graph", "graphMap", "graph"))

      val poms = objs(tmId, "predicateObjectMap").map { pomId =>
        val preds = termMaps(pomId, "predicate", "predicateMap", "predicate")
        val os = termMaps(pomId, "object", "objectMap", "object")
        require(preds.nonEmpty && os.nonEmpty,
          s"$tmId: a predicateObjectMap needs ≥1 predicate and ≥1 object")
        Pom(preds, os, termMaps(pomId, "graph", "graphMap", "graph"))
      }
      TriplesMap(tmId, ls, subjects.head, classes, graphs, poms)
    }
  }

  // ------------------------------------------------------------ compiling

  /** IRI-safe percent-encoding of a template value (R2RML §7.3) —
    * shared with the SPARQL layer's ENCODE_FOR_URI.
    */
  private def iriSafe(c: Column): Column = RdfTerms.iriSafe(c)

  /** Split "a {x} b {y}" into Left(text) / Right(ref) parts. `\{`/`\}`
    * escape braces in literal text.
    */
  private[graft] def templateParts(tpl: String): Seq[Either[String, String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Either[String, String]]()
    val txt = new StringBuilder
    var k = 0
    while (k < tpl.length) {
      tpl.charAt(k) match {
        case '\\' if k + 1 < tpl.length &&
            (tpl.charAt(k + 1) == '{' || tpl.charAt(k + 1) == '}') =>
          txt.append(tpl.charAt(k + 1)); k += 2
        case '{' =>
          val close = tpl.indexOf('}', k)
          require(close > k, s"unclosed {ref} in template: $tpl")
          if (txt.nonEmpty) { out += Left(txt.toString); txt.clear() }
          out += Right(tpl.substring(k + 1, close))
          k = close + 1
        case c => txt.append(c); k += 1
      }
    }
    if (txt.nonEmpty) out += Left(txt.toString)
    require(out.exists(_.isRight), s"template has no {ref}: $tpl")
    out.toSeq
  }

  /** Compile one term map to a Column producing an N-Triples term (NULL
    * when any referenced value is NULL — the triple is then suppressed,
    * R2RML §11.1 / RuleCompiler's NULL filter).
    */
  private def genCol(g: TermGen, colFn: String => Column): Column = g match {
    case ConstGen(t) => lit(t)
    case TemplateGen(tpl, tt, dt, lang) =>
      val parts = templateParts(tpl)
      def joined(enc: Column => Column): Column =
        concat(parts.map {
          case Left(text) => lit(text)
          case Right(ref) => enc(colFn(ref).cast("string"))
        }: _*)
      tt match {
        case "IRI" => concat(lit("<"), joined(iriSafe), lit(">"))
        case "Literal" => (dt, lang) match {
          case (Some(d), _) => RdfTerms.typedLit(joined(identity), d)
          case (None, Some(l)) =>
            concat(RdfTerms.strLit(joined(identity)), lit("@" + l))
          case (None, None) => RdfTerms.strLit(joined(identity))
        }
        case "BlankNode" => concat(lit("_:"), joined(iriSafe))
      }
    case RefGen(ref, tt, dt, lang) =>
      val v = colFn(ref).cast("string")
      tt match {
        case "IRI" => RdfTerms.iri(v)
        case "BlankNode" => concat(lit("_:"), iriSafe(v))
        case "Literal" => (dt, lang) match {
          case (Some(d), _) => RdfTerms.typedLit(v, d)
          case (None, Some(l)) => concat(RdfTerms.strLit(v), lit("@" + l))
          case (None, None) => RdfTerms.strLit(v)
        }
      }
    case _: RefObjectGen => throw new IllegalStateException(
      "referencing object maps compile as joins, not term columns")
  }

  private def readSource(spark: SparkSession, ls: LogicalSource,
      baseDir: String, refs: Seq[String]): DataFrame = {
    val path =
      if (ls.source.matches("^(/|[a-zA-Z]+:).*")) ls.source
      else baseDir + "/" + ls.source
    ls.formulation match {
      case "CSV" =>
        spark.read.option("header", "true").csv(path)
      case "JSONPath" =>
        val it = ls.iterator.getOrElse("$[*]")
        require(it == "$[*]",
          s"only the top-level array iterator \"$$[*]\" is supported for " +
            s"JSON logical sources (got \"$it\")")
        // primitivesAsString: every value is a string — the reference's
        // non-natural JSON mapping choice (CmdRml2Exec.java:62-63)
        spark.read.option("multiLine", "true")
          .option("primitivesAsString", "true").json(path)
      case "XPath" =>
        val it = ls.iterator.getOrElse(throw new IllegalArgumentException(
          "an XML logical source needs an rml:iterator (the row XPath)"))
        readXml(spark, path, it, refs)
      case other => throw new IllegalArgumentException(
        s"unsupported referenceFormulation $other — supported: ql:CSV, " +
          "ql:JSONPath with iterator \"$[*]\", ql:XPath")
    }
  }

  /** XML logical source (RML spec §5, `ql:XPath`): the iterator XPath
    * selects row nodes; each rml:reference is a RELATIVE XPath evaluated
    * against the row node (absent node = NULL, so the triple is
    * suppressed — distinct from an empty string value). One column per
    * referenced expression, named by the expression verbatim.
    *
    * Scale shape: document-parallel — `wholetext` gives one task per
    * FILE (a directory/glob source fans out), and the DOM+XPath work
    * runs inside `mapPartitions` on executors, exactly the per-partition
    * imperative slot the TriG parser uses. Intra-document parallelism is
    * out of scope (XML has no safe split points without a schema).
    */
  private def readXml(spark: SparkSession, path: String, iterator: String,
      refs: Seq[String]): DataFrame = {
    import spark.implicits._
    refs.foreach(r => require(!r.contains("."),
      s"""XPath reference "$r": references containing '.' are not """ +
        "supported (they collide with Spark column resolution)"))
    val rows = spark.read.option("wholetext", "true").text(path)
      .as[String]
      .mapPartitions { docs =>
        val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        // no DTDs / external entities: mapping sources are data, and an
        // executor must never do network or file fetches behind a parse
        dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl",
          true)
        dbf.setXIncludeAware(false)
        dbf.setExpandEntityReferences(false)
        val xpf = javax.xml.xpath.XPathFactory.newInstance()
        docs.flatMap { docText =>
          val dom = dbf.newDocumentBuilder().parse(new org.xml.sax.InputSource(
            new java.io.StringReader(docText)))
          val xp = xpf.newXPath()
          val nodes = xp.evaluate(iterator, dom,
              javax.xml.xpath.XPathConstants.NODESET)
            .asInstanceOf[org.w3c.dom.NodeList]
          (0 until nodes.getLength).iterator.flatMap { i =>
            val node = nodes.item(i)
            // RML term maps generate term SETS: a reference matching k
            // nodes yields k values, and the triples of a row are the
            // cross product of its term sets. The row model here carries
            // one value per (row, ref), so a multi-valued row expands to
            // one output row per COMBINATION — the generated triples are
            // exactly RML's (the output is a graph, a set, so the extra
            // multiplicity from unrelated refs collapses at
            // materialization). Loudly bounded: a pathological row must
            // not explode a task.
            val valueSets: Seq[Seq[String]] = refs.map { r =>
              val hits = xp.evaluate(r, node,
                  javax.xml.xpath.XPathConstants.NODESET)
                .asInstanceOf[org.w3c.dom.NodeList]
              if (hits.getLength == 0) Seq(null) // absent → NULL → suppress
              else (0 until hits.getLength).map(hits.item(_).getTextContent)
            }
            require(valueSets.map(_.size.toLong).product <= 10000L,
              s"XPath iterator row expands to more than 10000 reference " +
                s"combinations (${refs.zip(valueSets.map(_.size)).mkString(", ")})" +
                " — refine rml:iterator")
            valueSets.foldLeft(Seq(Seq.empty[String])) { (acc, vs) =>
              for { a <- acc; v <- vs } yield a :+ v
            }
          }
        }
      }
    refs.zipWithIndex.foldLeft(rows.toDF("vals")) { case (df, (r, k)) =>
      df.withColumn(r, col("vals")(k))
    }.drop("vals")
  }

  /** Which rml:reference / template `{ref}` expressions each logical
    * source must expose as columns — needed up front by [[readXml]]
    * (CSV/JSON sources carry their own column structure and ignore it).
    * Join-condition child refs charge the child's source, parent refs the
    * parent's.
    */
  private def refsBySource(
      maps: Seq[TriplesMap]): Map[LogicalSource, Seq[String]] = {
    val mapById = maps.map(m => m.id -> m).toMap
    def refsOfGen(g: TermGen): Seq[String] = g match {
      case TemplateGen(t, _, _, _) =>
        templateParts(t).collect { case Right(r) => r }
      case RefGen(r, _, _, _) => Seq(r)
      case _ => Nil
    }
    val pairs = scala.collection.mutable.ArrayBuffer[(LogicalSource, String)]()
    maps.foreach { tm =>
      def add(g: TermGen): Unit =
        refsOfGen(g).foreach(r => pairs += ((tm.source, r)))
      add(tm.subject); tm.graphs.foreach(add)
      tm.poms.foreach { pom =>
        pom.predicates.foreach(add); pom.graphs.foreach(add)
        pom.objects.foreach {
          case RefObjectGen(pm, joins) =>
            joins.foreach { case (c, p) =>
              pairs += ((tm.source, c))
              mapById.get(pm).foreach(par => pairs += ((par.source, p)))
            }
          case o => add(o)
        }
      }
    }
    pairs.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).distinct.sorted.toSeq
    }
  }

  private def graphCols(tm: TriplesMap, pom: Option[Pom],
      colFn: String => Column): Seq[Column] = {
    // R2RML §11.1: a POM's triples land in the UNION of the subject
    // map's graph maps and the POM's own graph maps (not an override);
    // an explicit rr:defaultGraph constant contributes the default graph
    // ALONGSIDE any named graph maps; no graph maps at all = default
    val gs = tm.graphs ++ pom.map(_.graphs).getOrElse(Nil)
    val (defaults, named) = gs.partition {
      case ConstGen(t) => local(t) == "defaultGraph"
      case _ => false
    }
    if (gs.isEmpty || named.isEmpty) Seq(lit(DefaultGraph))
    else named.map(genCol(_, colFn)) ++
      (if (defaults.nonEmpty) Seq(lit(DefaultGraph)) else Nil)
  }

  /** Fixed templates for one triples map over its (possibly shared) scan:
    * class triples + every non-referencing predicate×object×graph combo.
    */
  private def templatesFor(tm: TriplesMap,
      colFn: String => Column): Seq[TripleTemplate] = {
    val s = genCol(tm.subject, colFn)
    val classTriples = for {
      c <- tm.classes
      g <- graphCols(tm, None, colFn)
    } yield TripleTemplate(s, lit(RdfType), lit(c), g)
    val pomTriples = for {
      pom <- tm.poms
      o <- pom.objects if !o.isInstanceOf[RefObjectGen]
      p <- pom.predicates
      g <- graphCols(tm, Some(pom), colFn)
    } yield TripleTemplate(s, genCol(p, colFn), genCol(o, colFn), g)
    classTriples ++ pomTriples
  }

  /** Compile a whole mapping into one `(subj, pred, obj, graph)` frame.
    *
    * Plan shape: one scan per DISTINCT logical source (maps sharing a
    * source fuse into a single scan + single explode), plus one equi-join
    * per referencing object map with join conditions; a final
    * `dropDuplicates` makes the output a set (the upstream builder's
    * `setDistinct(true)`, CmdRml2Exec.java:73). At 100 TB the distinct is
    * the only shuffle for join-free mappings.
    */
  def compile(spark: SparkSession, maps: Seq[TriplesMap],
      baseDir: String): DataFrame = {
    require(maps.nonEmpty, "mapping has no triples maps")
    val mapById = maps.map(m => m.id -> m).toMap
    val bySource: Seq[(LogicalSource, Seq[TriplesMap])] =
      maps.groupBy(_.source).toSeq.sortBy(_._1.source)
    val allRefs = refsBySource(maps)
    val scans: Map[LogicalSource, DataFrame] =
      bySource.map { case (ls, _) =>
        ls -> readSource(spark, ls, baseDir, allRefs.getOrElse(ls, Nil))
      }.toMap

    // shared-scan branches: all fixed templates of all maps per source.
    // A no-join referencing object map over the SAME source is same-row
    // semantics (R2RML §8.4 "joint query" degenerate case) — it folds
    // into the shared scan as parent-subject-over-child-row.
    val scanBranches = bySource.flatMap { case (ls, group) =>
      val df = scans(ls)
      val colFn = (n: String) => df(n)
      val rules = group.map { tm =>
        val sameRow = for {
          pom <- tm.poms
          o <- pom.objects.collect { case r: RefObjectGen => r }
          parent = mapById.getOrElse(o.parentMap,
            throw new IllegalArgumentException(
              s"${tm.id}: unknown rr:parentTriplesMap ${o.parentMap}"))
          if o.joins.isEmpty
        } yield {
          require(parent.source == tm.source,
            s"${tm.id}: a referencing object map without rr:joinCondition " +
              "needs child and parent on the same logical source")
          for {
            p <- pom.predicates
            g <- graphCols(tm, Some(pom), colFn)
          } yield TripleTemplate(genCol(tm.subject, colFn), genCol(p, colFn),
            genCol(parent.subject, colFn), g)
        }
        Rule(tm.id, lit(true), templatesFor(tm, colFn) ++ sameRow.flatten)
      }.filter(_.templates.nonEmpty)
      if (rules.isEmpty) None else Some(RuleCompiler.compile(df, rules))
    }

    // join branches: one per referencing object map WITH conditions
    val joinBranches = for {
      tm <- maps
      pom <- tm.poms
      ro <- pom.objects.collect { case r: RefObjectGen => r }
      if ro.joins.nonEmpty
    } yield {
      val parent = mapById.getOrElse(ro.parentMap,
        throw new IllegalArgumentException(
          s"${tm.id}: unknown rr:parentTriplesMap ${ro.parentMap}"))
      val c = scans(tm.source).alias("c")
      val p = scans(parent.source).alias("p")
      val cond = ro.joins.map { case (cc, pc) =>
        col("c." + cc) === col("p." + pc) }.reduce(_ && _)
      val joined = c.join(p, cond)
      val cFn = (n: String) => col("c." + n)
      val pFn = (n: String) => col("p." + n)
      val templates = for {
        pr <- pom.predicates
        g <- graphCols(tm, Some(pom), cFn)
      } yield TripleTemplate(genCol(tm.subject, cFn), genCol(pr, cFn),
        genCol(parent.subject, pFn), g)
      RuleCompiler.compile(joined, Seq(Rule(tm.id + "→" + parent.id,
        lit(true), templates)))
    }

    (scanBranches ++ joinBranches).reduce(_ unionByName _)
      .dropDuplicates(Seq("subj", "pred", "obj", "graph"))
  }

  // ------------------------------------------------------- rml to sparql

  /** The reference's `rmltk rml to sparql` step (docs/rml/index.md:17-21)
    * re-expressed: ONE SPARQL CONSTRUCT statement per triples map,
    * runnable by THIS engine's own text front door — `csv:parse` streams
    * the logical source, `json:path` extracts row fields, and
    * ENCODE_FOR_URI applies exactly the template encoding [[compile]]
    * uses (both share [[RdfTerms.iriSafe]]), so the emitted text is
    * value-equivalent to the direct compiler (asserted in RmlSpec).
    * Subset: CSV sources; referencing object maps only in the
    * same-source no-join form — cross-source joins need [[compile]].
    * The emitted text is SET-equivalent to [[compile]]: compile ends
    * with a dropDuplicates (RDF graphs are sets, the upstream builder's
    * setDistinct) while a CONSTRUCT statement emits one row per
    * solution — apply `.dropDuplicates` / the materializer's dedup
    * stage to the text path's output before counting.
    */
  def toSparql(maps: Seq[TriplesMap], baseDir: Option[String] = None): String =
    maps.map(toSparqlOne(_, maps.map(m => m.id -> m).toMap, baseDir))
      .mkString("\n\n")

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"; case '"' => "\\\""
      case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
      case c => c.toString
    } + "\""

  private def toSparqlOne(tm: TriplesMap,
      byId: Map[String, TriplesMap], baseDir: Option[String]): String = {
    require(tm.source.formulation == "CSV",
      s"${tm.id}: rml to sparql emits csv:parse sources only " +
        s"(got ${tm.source.formulation}) — use compile() for JSON")
    val colVar = scala.collection.mutable.LinkedHashMap[String, String]()
    def varFor(ref: String): String = colVar.getOrElseUpdate(ref, {
      // loud gate: a quote/bracket/backslash would corrupt the emitted
      // json:path string (the direct compiler has no such limit)
      require(ref.matches("[A-Za-z0-9_ .\\-]+"),
        s"${tm.id}: column reference '$ref' contains characters the " +
          "rml-to-sparql json:path emitter cannot quote — use compile()")
      val base = "c_" + ref.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
      // distinct refs must stay distinct vars even when sanitization
      // collides ("a b" vs "a.b")
      if (colVar.valuesIterator.contains(base)) base + "_" + colVar.size
      else base
    })
    // extra BINDs for composed terms, in emission order
    val binds = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var gen = 0
    def bindOf(expr: String): String = {
      gen += 1; val v = s"t$gen"; binds += (v -> expr); v
    }
    /** Template-position text for one term map (a var, a constant term,
      * or a fresh BIND over the row fields).
      */
    def termText(g: TermGen): String = g match {
      case ConstGen(term) => term
      case RefGen(ref, "Literal", None, None) => "?" + varFor(ref)
      case RefGen(ref, "Literal", Some(dt), _) =>
        "?" + bindOf(s"STRDT(?${varFor(ref)}, <$dt>)")
      case RefGen(ref, "Literal", None, Some(lang)) =>
        "?" + bindOf(s"STRLANG(?${varFor(ref)}, ${q(lang)})")
      case RefGen(ref, "IRI", _, _) =>
        "?" + bindOf(s"IRI(?${varFor(ref)})")
      case TemplateGen(tpl, tt, dt, lang) =>
        require(tt == "IRI" || tt == "Literal",
          s"${tm.id}: rr:termType $tt templates are not expressible in " +
            "the emitted SPARQL subset (no BNODE(expr)) — use compile()")
        val parts = templateParts(tpl).map {
          case Left(text) => q(text)
          case Right(ref) if tt == "IRI" =>
            s"ENCODE_FOR_URI(?${varFor(ref)})"
          case Right(ref) => "?" + varFor(ref)
        }
        val body =
          if (parts.size == 1) parts.head
          else "CONCAT(" + parts.mkString(", ") + ")"
        if (tt == "IRI") "?" + bindOf(s"IRI($body)")
        else (dt, lang) match {
          case (Some(d), _) => "?" + bindOf(s"STRDT($body, <$d>)")
          case (None, Some(l)) => "?" + bindOf(s"STRLANG($body, ${q(l)})")
          case (None, None) => "?" + bindOf(body)
        }
      case RefObjectGen(parent, joins) =>
        val p = byId.getOrElse(parent, throw new IllegalArgumentException(
          s"${tm.id}: unknown rr:parentTriplesMap $parent"))
        require(joins.isEmpty && p.source == tm.source,
          s"${tm.id}: rml to sparql supports referencing object maps " +
            "only in the same-source no-join form — use compile() for joins")
        termText(p.subject)
      case other => throw new IllegalArgumentException(
        s"${tm.id}: unsupported term map for rml to sparql: $other")
    }
    // (graphTermText or None=default, subject, predicate, object)
    val triples = scala.collection.mutable.ArrayBuffer[(Option[String], String, String, String)]()
    val subjT = termText(tm.subject)
    def graphsText(pom: Option[Pom]): Seq[Option[String]] = {
      val gs = tm.graphs ++ pom.map(_.graphs).getOrElse(Nil)
      val (defaults, named) = gs.partition {
        case ConstGen(t) => local(t) == "defaultGraph"
        case _ => false
      }
      if (gs.isEmpty || named.isEmpty) Seq(None)
      else named.map(g => Some(termText(g))) ++
        (if (defaults.nonEmpty) Seq(None) else Nil)
    }
    val subjGraphs = graphsText(None)
    for (c <- tm.classes; g <- subjGraphs)
      triples += ((g, subjT, "a", c))
    for (pom <- tm.poms) {
      // hoist graph/term texts so fresh BINDs mint once per POM, not per
      // graph x predicate x object combination
      val pomGraphs = graphsText(Some(pom))
      for (o <- pom.objects; p <- pom.predicates) {
        val oT = termText(o)
        val pT = termText(p)
        for (g <- pomGraphs) triples += ((g, subjT, pT, oT))
      }
    }
    val byGraph = triples.groupBy(_._1).toSeq.sortBy(_._1.getOrElse(""))
    val tmpl = byGraph.map { case (g, ts) =>
      val body = ts.map(t => s"  ${t._2} ${t._3} ${t._4} .").mkString("\n")
      g match {
        case None => body
        case Some(gt) => s"  GRAPH $gt {\n$body\n  }"
      }
    }.mkString("\n")
    val rowBinds = colVar.map { case (ref, v) =>
      s"""  BIND(json:path(?__row, ${q("$['" + ref + "']")}) AS ?$v)"""
    }.mkString("\n")
    val extraBinds = binds.map { case (v, e) => s"  BIND($e AS ?$v)" }
      .mkString("\n")
    // compile() resolves a relative rml:source against the mapping file's
    // directory, while the emitted text is resolved by the engine against
    // graft.sparql.base / cwd — anchor it here so the documented
    // compile/toSparql value-equivalence holds wherever the text runs
    val srcPath = tm.source.source match {
      case abs if abs.matches("^(/|[a-zA-Z]+:).*") => abs
      case rel => baseDir.map(_ + "/" + rel).getOrElse(rel)
    }
    s"""CONSTRUCT {
       |$tmpl
       |}
       |WHERE {
       |  <$srcPath> csv:parse (?__row "excel -h") .
       |$rowBinds
       |$extraBinds
       |}""".stripMargin
  }

  /** Parse + compile a mapping file in one step. */
  def execute(spark: SparkSession, mappingPath: String): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(mappingPath)), java.nio.charset.StandardCharsets.UTF_8)
    val dir = java.nio.file.Paths.get(mappingPath).toAbsolutePath.getParent.toString
    compile(spark, parseMapping(text), dir)
  }
}
