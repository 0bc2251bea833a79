package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL basic-graph-pattern algebra over a triple/quad DataFrame —
  * the reference executes these inside Jena ARQ (BGP conjunction =
  * equi-join on shared variables, OPTIONAL = left outer, MINUS = anti,
  * EXISTS = semi, UNION = union; SparqlIntegrateCmdImpls.java:1036,
  * algebra at :673-677). Here each triple pattern is a filtered
  * projection of the triple table and the join structure is handed to
  * Catalyst, which reorders/broadcasts like any relational plan.
  */
object Bgp {

  /** One triple pattern: constants filter, variables project.
    * Each position is Left(constant term) or Right(varName).
    */
  def pattern(triples: DataFrame,
      s: Either[String, String],
      p: Either[String, String],
      o: Either[String, String]): DataFrame =
    bindPositions(triples, Seq("subj" -> s, "pred" -> p, "obj" -> o))

  /** Quad pattern — a triple pattern inside `GRAPH g { … }` (SPARQL 1.1
    * §13.3): the graph position filters/binds like any other.
    */
  def quadPattern(quads: DataFrame,
      g: Either[String, String],
      s: Either[String, String],
      p: Either[String, String],
      o: Either[String, String]): DataFrame =
    bindPositions(quads,
      Seq("graph" -> g, "subj" -> s, "pred" -> p, "obj" -> o))

  private[ops] def bindPositions(df: DataFrame,
      bind: Seq[(String, Either[String, String])]): DataFrame = {
    val filtered = bind.foldLeft(df) {
      case (df, (c, Left(const))) => df.filter(col(c) === const)
      case (df, _) => df
    }
    // a variable repeated within one pattern (e.g. ?x ?p ?x) is an
    // implicit equality constraint in SPARQL: filter on it and project
    // the variable ONCE (a duplicate column name would silently corrupt
    // downstream joins)
    val vars = bind.collect { case (c, Right(v)) => (c, v) }
    val eqFilters = vars.groupBy(_._2).values.filter(_.size > 1)
      .flatMap(g => g.tail.map(t => col(g.head._1) === col(t._1)))
    val constrained = eqFilters.foldLeft(filtered)(_ filter _)
    val projected = vars.groupBy(_._2).map(_._2.head)
      .toSeq.sortBy(t => vars.indexOf(t))
      .map { case (c, v) => col(c).as(v) }
    constrained.select(projected: _*)
  }

  private def shared(a: DataFrame, b: DataFrame): Seq[String] =
    a.columns.intersect(b.columns).toSeq

  /** Conjunction: natural equi-join on shared variables (disjoint
    * domains = cartesian product, per SPARQL join semantics).
    */
  def join(a: DataFrame, b: DataFrame): DataFrame = {
    val s = shared(a, b)
    if (s.isEmpty) a.crossJoin(b) else a.join(b, s, "inner")
  }

  /** OPTIONAL { … }: left outer on shared vars; with disjoint domains
    * every pairing is compatible, but left rows survive an empty right.
    */
  def optional(a: DataFrame, b: DataFrame): DataFrame = {
    val s = shared(a, b)
    if (s.isEmpty) a.join(b, lit(true), "left_outer")
    else a.join(b, s, "left_outer")
  }

  /** FILTER EXISTS { … }: left semi. Disjoint domains: keep all rows iff
    * the subpattern has ANY solution (1-row probe, broadcast).
    */
  def exists(a: DataFrame, b: DataFrame): DataFrame = {
    val s = shared(a, b)
    if (s.isEmpty) a.join(broadcast(b.limit(1)), lit(true), "left_semi")
    else a.join(b, s, "left_semi")
  }

  /** FILTER NOT EXISTS { … }: left anti. Disjoint domains: drop ALL rows
    * iff the subpattern has any solution.
    */
  def notExists(a: DataFrame, b: DataFrame): DataFrame = {
    val s = shared(a, b)
    if (s.isEmpty) a.join(broadcast(b.limit(1)), lit(true), "left_anti")
    else a.join(b, s, "left_anti")
  }

  /** MINUS { … }: left anti on shared vars — but per SPARQL 1.1 §8.3 a
    * MINUS whose domains share NO variable removes nothing (unlike
    * FILTER NOT EXISTS, which tests plain satisfiability).
    */
  def minus(a: DataFrame, b: DataFrame): DataFrame = {
    val s = shared(a, b)
    if (s.isEmpty) a else a.join(b, s, "left_anti")
  }

  /** UNION: union of solution headers, missing vars unbound. */
  def union(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}
