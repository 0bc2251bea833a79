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

  /** Conjunction: natural equi-join on shared variables. */
  def join(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a.columns.intersect(b.columns).toSeq, "inner")

  /** OPTIONAL { … }: left outer on shared vars. */
  def optional(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a.columns.intersect(b.columns).toSeq, "left_outer")

  /** FILTER EXISTS { … }: left semi. */
  def exists(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a.columns.intersect(b.columns).toSeq, "left_semi")

  /** MINUS { … }: left anti on shared vars. */
  def minus(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, a.columns.intersect(b.columns).toSeq, "left_anti")

  /** UNION: union of solution headers, missing vars unbound. */
  def union(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}
