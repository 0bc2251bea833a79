package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A CONSTRUCT-style extraction rule: WHERE-condition + triple templates,
  * everything a pure Catalyst `Column` expression.
  *
  * This is the Spark-first re-expression of the reference's SPARQL
  * CONSTRUCT statement sequences (SparqlIntegrateCmdImpls.java:337-345) and
  * its macro model (macros expand to expression trees before execution —
  * SparqlIntegrateCmdImpls.java:584-605): rules are *data compiled to
  * expressions at plan-build time*, never interpreted at runtime. A rule
  * whose `where` is false, or any template producing a NULL term, emits
  * nothing for that row (SPARQL semantics: an unbound variable in a
  * CONSTRUCT template suppresses the triple).
  */
final case class TripleTemplate(s: Column, p: Column, o: Column, g: Column)

/** `templates` emit a fixed number of triples per row; `dynamic` (if set)
  * is an array<struct<s,p,o,g>> column contributing a VARIABLE number of
  * triples per row — the CONSTRUCT-with-lateral case (e.g. one triple per
  * gazetteer surface matched in the row's text).
  */
final case class Rule(
    name: String,
    where: Column,
    templates: Seq[TripleTemplate],
    dynamic: Option[Column] = None)

object RuleCompiler {

  /** Compile a rule set against one input scan.
    *
    * All rules share a single scan (the `rmltk optimize workload` idea —
    * reference docs/rml/index.md:23-28 — done Spark-first): each rule
    * becomes a conditional `array(struct(s,p,o,g)...)`, arrays are
    * concatenated and exploded ONCE, so the physical plan is
    * scan → project → generate(explode) → filter, fully inside
    * whole-stage codegen, with no unions and no repeated scans.
    * Column pruning then reduces the scan to exactly the columns the
    * templates reference.
    */
  def compile(input: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val emptyArr = array().cast("array<struct<s:string,p:string,o:string,g:string>>")
    val perRule: Seq[Column] = rules.map { r =>
      val fixed =
        if (r.templates.isEmpty) None
        else Some(array(r.templates.map(t =>
          struct(t.s.as("s"), t.p.as("p"), t.o.as("o"), t.g.as("g"))): _*))
      // dynamic arrays are NULL-guarded: concat propagates NULL, which
      // would silently drop ALL rules' triples for the row — a NULL
      // dynamic expression must suppress only its own rule's output
      val triples = (fixed, r.dynamic) match {
        case (Some(f), Some(d)) => concat(f, coalesce(d, emptyArr))
        case (Some(f), None) => f
        case (None, Some(d)) => coalesce(d, emptyArr)
        case (None, None) => emptyArr
      }
      when(r.where, triples).otherwise(emptyArr)
    }
    val all = if (perRule.size == 1) perRule.head else concat(perRule: _*)
    input
      .select(explode(all).as("t"))
      .select(col("t.s").as("subj"), col("t.p").as("pred"),
        col("t.o").as("obj"), col("t.g").as("graph"))
      // NULL term anywhere => template had an unbound value => no triple
      .filter(col("subj").isNotNull && col("pred").isNotNull &&
        col("obj").isNotNull && col("graph").isNotNull)
  }
}
