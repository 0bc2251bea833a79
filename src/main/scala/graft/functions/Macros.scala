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
}
