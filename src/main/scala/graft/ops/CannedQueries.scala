package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's canned classpath queries (`rpt cpcat <name>.rq`,
  * docs/integrate/canned-queries.md; definitions under
  * rdf-processing-toolkit-cli/src/main/resources/ .rq files) — shipped as
  * named SPARQL texts runnable through the text front door, plus the
  * tree/gtree transformation as a DISTRIBUTED operation.
  *
  * Divergences, both documented:
  * - `rename.rq` upstream binds ?y through `FILTER(?y = URI(...))` — a
  *   filter over an otherwise-unbound var, which per SPARQL is an error
  *   (false), so the canned text here uses the equivalent BIND.
  * - `tree.rq`/`gtree.rq` upstream use `IF(EXISTS {...},
  *   norse:bnode.asGiven(?x), ?x)` — EXISTS as a scalar subexpression is
  *   a per-row correlated probe; [[tree]] computes the SAME result
  *   set-at-a-time (intermediate nodes = subjects ∩ objects via two
  *   distinct-joins — shuffles on the node key, no per-row work), with
  *   deterministic bnode labels derived from the replaced term (md5).
  */
object CannedQueries {

  val texts: Map[String, String] = Map(
    "spo.rq" -> "CONSTRUCT WHERE { ?s ?p ?o }",
    "gspo.rq" -> "CONSTRUCT WHERE { GRAPH ?g { ?s ?p ?o } }",
    "spogspo.rq" ->
      """CONSTRUCT {
        |  GRAPH ?g { ?s ?p ?o }
        |}
        |WHERE {
        |    {
        |      BIND(<urn:x-arq:DefaultGraph> AS ?g)
        |      ?s ?p ?o
        |    }
        |  UNION
        |    {
        |      GRAPH ?g { ?s ?p ?o }
        |    }
        |}""".stripMargin,
    "count.rq" ->
      "SELECT (COUNT(*) AS ?c) { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }",
    "s.rq" -> "SELECT DISTINCT ?s { ?s ?p ?o }",
    "rename.rq" ->
      """DELETE { ?a ?b ?x . ?x ?c ?d }
        |INSERT { ?a ?b ?y . ?y ?c ?d }
        |WHERE {
        |  ?a ?b ?x . ?x ?c ?d
        |  FILTER(?x = URI(sys:getenv('FROM')))
        |  BIND(URI(sys:getenv('TO')) AS ?y)
        |}""".stripMargin)

  def apply(name: String): String = texts.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown canned query '$name' — available: ${texts.keys.toSeq.sorted.mkString(", ")}"))

  /** The VERBATIM embedded reference resource (byte-identical copy under
    * resources/reference/canned — what `Integrate cpcat` prints, and what
    * the runnable canned entries parse so conformance is against the
    * reference's own bytes, not a re-typed copy). Per-file status:
    * spo/gspo/spogspo/count/s/property-joins/test-transpose/path-test run
    * verbatim; rename runs via the documented [[texts]] variant (upstream
    * binds ?y through a FILTER over an unbound var); tree/gtree run as
    * the distributed [[tree]] (norse:bnode.asGiven + scalar EXISTS);
    * env-test runs verbatim with a LOCAL file
    * endpoint (CannedRqSpec); bnode-test hardcodes a network SPARQL
    * endpoint — scoped out with the other egress forms.
    */
  def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/reference/canned/$name")
    require(in != null, s"no embedded canned resource '$name'")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** tree.rq / gtree.rq: replace every INTERMEDIATE node (a term that
    * appears both as a subject and as an object — per graph when
    * `perGraph`) with a deterministic blank node `_:n<md5(term)>`.
    * Plan: two distinct projections joined on the node key (the
    * intermediate set), then two left joins back onto the triples —
    * every shuffle is keyed, nothing quadratic, no driver collection.
    */
  def tree(quads: DataFrame, perGraph: Boolean = false): DataFrame = {
    val keyCols = if (perGraph) Seq("graph") else Nil
    def nodes(c: String) =
      quads.select((keyCols :+ c).map(col): _*)
        .withColumnRenamed(c, "node").distinct()
    val inter = nodes("subj").join(nodes("obj"), keyCols :+ "node")
      .withColumn("bn", concat(lit("_:n"), md5(col("node"))))
    def swap(df: DataFrame, side: String) =
      df.join(
        inter.withColumnRenamed("node", side).withColumnRenamed("bn", "__bn"),
        keyCols :+ side, "left")
        .withColumn(side, coalesce(col("__bn"), col(side))).drop("__bn")
    swap(swap(quads, "subj"), "obj").select(quads.columns.map(col): _*)
  }
}
