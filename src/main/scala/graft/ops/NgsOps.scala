package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.RdfTerms

/** Named-graph-stream operators (`ngs`) re-expressed over a quad DataFrame
  * (columns graph, subj, pred, obj). The reference processes one named
  * graph per stream record (NgsCmdImpls.java:81); here a "record" is the
  * set of rows sharing `graph`, and stream position becomes explicit
  * ordering by graph name.
  *
  * Scale: per-graph predicates are windows over the graph key (one
  * shuffle, partial agg map-side). head/tail/while never globally sort the
  * quads — they rank the (much smaller) distinct-graph table and semi-join
  * back, broadcasting when the selected set is small.
  */
object NgsOps {

  /** `ngs filter` — keep graphs where the ASK condition holds on ANY row
    * of the graph (`drop=true` negates, like --drop).
    * (reference NgsCmdImpls.java:88-104)
    */
  def askFilter(quads: DataFrame, cond: Column, drop: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("graph"))
    val ok = max(when(cond, 1).otherwise(0)).over(w) === 1
    quads.withColumn("__ok", if (drop) !ok else ok)
      .filter(col("__ok")).drop("__ok")
  }

  /** `ngs head -n N` (NgsCmdImpls.java:107-126). The N-graph set is tiny →
    * TakeOrdered on the distinct-graph table + broadcast semi join.
    */
  def headGraphs(quads: DataFrame, n: Int): DataFrame = {
    val keep = quads.select("graph").distinct().orderBy("graph").limit(n)
    quads.join(broadcast(keep), Seq("graph"), "left_semi")
  }

  /** `ngs tail -n +N` — skip the first N graphs (NgsCmdImpls.java:128-144). */
  def tailGraphs(quads: DataFrame, skip: Int): DataFrame = {
    val drop = quads.select("graph").distinct().orderBy("graph").limit(skip)
    quads.join(broadcast(drop), Seq("graph"), "left_anti")
  }

  /** `ngs sort` — order graphs by a per-graph aggregate key; emits
    * (graph, key, rank). `-u` dedup and `-m` merge fall out of groupBy.
    * (reference delegates to /usr/bin/sort — NgsCmdImpls.java:309-330;
    * Spark's shuffle sort replaces the child-process external sort.)
    */
  def sortGraphs(quads: DataFrame, keyAgg: Column, descending: Boolean = false,
      random: Option[Long] = None): DataFrame = {
    val keyed = quads.groupBy(col("graph")).agg(keyAgg.as("key"))
    val ord = random match {
      case Some(seed) => Seq(rand(seed).asc)
      case None =>
        if (descending) Seq(col("key").desc, col("graph").asc)
        else Seq(col("key").asc, col("graph").asc)
    }
    keyed.withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
  }

  /** `ngs subjects` — regroup triples into one named graph per subject,
    * graph name crafted from the subject term
    * (NamedGraphStreamOps.java:23-30 rules; order-insensitive, which is
    * strictly stronger than the reference's consecutive-run grouping).
    */
  def subjects(triples: DataFrame): DataFrame =
    triples.select(
      RdfTerms.graphNameForSubject(col("subj")).as("graph"),
      col("subj"), col("pred"), col("obj"))

  /** `ngs wc` — graph + quad counts (NgsCmdImpls.java:382-421). */
  def wc(quads: DataFrame): DataFrame =
    quads.agg(countDistinct(col("graph")).as("n_graphs"),
      count(lit(1)).as("n_quads"))

  /** `ngs map --graph g` — project every quad into one constant graph
    * (NgsCmdImpls.java:151-204).
    */
  def mapToGraph(quads: DataFrame, g: String): DataFrame =
    quads.withColumn("graph", lit(g))

  /** `ngs while` — emit graphs (in graph order) while the ASK condition
    * holds; first failing graph stops the stream (NgsCmdImpls.java:366-380).
    * `until=true` emits while the condition does NOT hold.
    */
  def whileGraphs(quads: DataFrame, cond: Column, until: Boolean = false): DataFrame = {
    val c = if (until) !cond else cond
    val perGraph = quads.groupBy(col("graph"))
      .agg(max(when(c, 1).otherwise(0)).as("__ok"))
    val ranked = perGraph
      .withColumn("__rank", row_number().over(Window.orderBy(col("graph"))))
    val firstBad = ranked.filter(col("__ok") === 0)
      .agg(coalesce(min(col("__rank")), lit(Long.MaxValue)).as("__stop"))
    val keep = ranked.join(broadcast(firstBad),
        col("__rank") < col("__stop"), "left_semi")
      .select("graph")
    quads.join(broadcast(keep), Seq("graph"), "left_semi")
  }
}
