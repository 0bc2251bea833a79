package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.Checkpoints.TruncateOps

/** Ordered statement-sequence runner — the reference's `integrate` model:
  * a `.sparql` file is an ordered list of queries/updates sharing ONE
  * mutable dataset (docs/integrate/index.md:17-60; LOAD→INSERT
  * materialization SparqlIntegrateCmdImpls.java:363-379).
  *
  * Spark-first: the "mutable dataset" is the temp-view catalog. An
  * [[Script.Update]] materializes its result eagerly (localCheckpoint —
  * swap for a reliable checkpoint / staged Iceberg table on a cluster)
  * and (re)binds a view, so later statements observe the state as of
  * their position in the sequence; [[Script.Query]] evaluates against the
  * current views. `run` returns the last Query's result (the reference
  * streams each query's output to the sink as it executes).
  */
object Script {

  sealed trait Stmt
  /** Materialize `f`'s result NOW and (re)bind it as view `name`. */
  final case class Update(name: String, f: SparkSession => DataFrame) extends Stmt
  /** Evaluate a query against the current view state. */
  final case class Query(f: SparkSession => DataFrame) extends Stmt

  def run(spark: SparkSession, stmts: Seq[Stmt]): Option[DataFrame] = {
    var last: Option[DataFrame] = None
    stmts.foreach {
      case Update(name, f) =>
        f(spark).truncateLineage(true).createOrReplaceTempView(name)
      case Query(f) =>
        last = Some(f(spark))
    }
    last
  }

  /** Run a CONSTRUCT statement-sequence TEXT over one binding stream and
    * union the statements' outputs — the reference's `integrate` shape:
    * every CONSTRUCT's triples stream to the same sink in order
    * (SparqlIntegrateCmdImpls.java:337-345,865-884), prefixes carrying
    * over between statements.
    */
  def runConstructSequence(bindings: DataFrame, text: String): DataFrame =
    graft.rules.ConstructParser.parseSequence(text)
      .map(rules => graft.rules.RuleCompiler.compile(bindings, rules))
      .reduce(_ unionByName _)

  /** Result of a whole-script run: the final dataset state and the last
    * query statement's output (if the script had one).
    */
  final case class SparqlRun(dataset: DataFrame, lastQuery: Option[DataFrame])

  /** Execute a full `.sparql` script TEXT — the reference's end-to-end
    * `integrate` entry (docs/integrate/index.md:17-60): LOAD / INSERT
    * DATA / DELETE DATA / INSERT…WHERE / DELETE…WHERE / CLEAR GRAPH
    * mutate one quad dataset in statement order; CONSTRUCT/SELECT
    * statements query the state as of their position.
    *
    * Spark-first: the dataset is a quad DataFrame; every update
    * materializes eagerly (`localCheckpoint` — the reference applies
    * updates eagerly too, SparqlIntegrateCmdImpls.java:363-379; swap for
    * a reliable checkpoint / staged Iceberg table on a cluster so the
    * state survives executor loss). DELETEs are anti-joins on the quad
    * key, never row-at-a-time.
    */
  def runSparql(spark: SparkSession, text: String,
      initial: Option[DataFrame] = None): SparqlRun = {
    var ds = emptyQuads(spark, initial)
    var last: Option[DataFrame] = None
    graft.rules.ConstructParser.parseScript(text).foreach { stmt =>
      val (next, out) = applyStmt(spark, ds, stmt)
      ds = next
      out.foreach(o => last = Some(o.df))
    }
    SparqlRun(ds, last)
  }

  /** A query statement's output: quads (CONSTRUCT/DESCRIBE — route to the
    * RDF sink) vs a binding table (SELECT/ASK — route to the result-set
    * sink). The split mirrors the reference's output-mode selection
    * (SPARQLResultExProcessorBuilder: quad vs bindings mode).
    */
  sealed trait StmtOutput { def df: DataFrame }
  final case class QuadsOutput(df: DataFrame) extends StmtOutput
  final case class TableOutput(df: DataFrame) extends StmtOutput

  private def emptyQuads(spark: SparkSession,
      initial: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    initial.getOrElse(
      Seq.empty[(String, String, String, String)]
        .toDF("graph", "subj", "pred", "obj"))
  }

  /** Execute ONE script statement against the current dataset state.
    * Returns the new state and, for query statements, the output frame —
    * the single execution step [[runSparql]] folds and the integrate CLI
    * streams per statement (SparqlIntegrateCmdImpls.java:865-884 streams
    * each statement's result to the sink as it executes).
    */
  def applyStmt(spark: SparkSession, dsIn: DataFrame,
      stmt: graft.rules.ConstructParser.ScriptStmt)
      : (DataFrame, Option[StmtOutput]) = {
    import graft.rules.ConstructParser._
    import spark.implicits._
    val QuadCols = Seq("graph", "subj", "pred", "obj")
    def quadsDf(rows: Seq[(String, String, String, String)]): DataFrame =
      rows.toDF(QuadCols: _*)
    def anti(ds: DataFrame, del: DataFrame): DataFrame =
      ds.join(del.select(QuadCols.map(col): _*), QuadCols, "left_anti")
    def ckpt(df: DataFrame): DataFrame = df.truncateLineage(true)

    val ds = dsIn
    // a query whose WHERE has no triple patterns evaluates over the UNIT
    // solution (SPARQL §18.2's Z = {μ0}; e.g. example.sparql's url:text +
    // json:unnest chain) — the quad table would wrongly multiply (or, if
    // empty, kill) a pattern-less BIND/property-function chain
    def seedC(q: graft.rules.ConstructParser.ParsedConstruct): DataFrame =
      if (q.usesQuads) ds else graft.rules.ConstructParser.unitFrame(spark)
    def seedS(q: graft.rules.ConstructParser.ParsedSelect): DataFrame =
      if (q.usesQuads) ds else graft.rules.ConstructParser.unitFrame(spark)
    stmt match {
      case LoadStmt(path, g) =>
        // resolve like every other file IRI in the engine: relative paths
        // against graft.sparql.base, graft.fileAliases prefix remap
        val loaded = graft.sources.RdfIO.readRdfAuto(spark,
          graft.rules.ConstructParser.resolveFileIri(path))
        (ckpt(ds.unionByName(
          g.fold(loaded)(gi => loaded.withColumn("graph", lit(gi))))), None)
      case InsertDataStmt(rows) =>
        (ckpt(ds.unionByName(quadsDf(rows))), None)
      case DeleteDataStmt(rows) =>
        (ckpt(anti(ds, quadsDf(rows))), None) // constant side: broadcast anti
      case InsertWhereStmt(q) =>
        (ckpt(ds.unionByName(
          q.run(seedC(q)).select(QuadCols.map(col): _*))), None)
      case DeleteWhereStmt(q) =>
        (ckpt(anti(ds, q.run(seedC(q)))), None)
      case ModifyStmt(del, ins) =>
        // one WHERE binds both templates against the PRE-update dataset;
        // the group is evaluated once and shared (lazy localCheckpoint)
        val (dels, inss) = graft.rules.ConstructParser.runModify(del, ins, ds)
        (ckpt(anti(ds, dels).unionByName(inss.select(QuadCols.map(col): _*))),
          None)
      case ClearGraphStmt(g) =>
        (ckpt(ds.filter(col("graph") =!= g)), None)
      // graph management (SPARQL Update §3.2.5-3.2.7) as pure relational
      // rewrites over the quad frame: filter + relabel + union — no
      // row-at-a-time copying, the same shape at any scale
      case AddGraphStmt(src, dst) =>
        // RDF graphs are sets: the rebuilt destination dedupes, so a quad
        // already present in dst (or a repeated ADD) does not double up
        (if (src == dst) ds
         else ckpt(ds.where(col("graph") =!= dst).unionByName(
           ds.where(col("graph") === dst).unionByName(
             ds.where(col("graph") === src).withColumn("graph", lit(dst)))
             .distinct())), None)
      case CopyGraphStmt(src, dst) =>
        (if (src == dst) ds
         else ckpt(ds.where(col("graph") =!= dst).unionByName(
           ds.where(col("graph") === src).withColumn("graph", lit(dst)))),
          None)
      case MoveGraphStmt(src, dst) =>
        (if (src == dst) ds
         else ckpt(
           ds.where(col("graph") =!= dst && col("graph") =!= src).unionByName(
             ds.where(col("graph") === src).withColumn("graph", lit(dst)))),
          None)
      case QueryStmt(q) => (ds, Some(QuadsOutput(q.run(seedC(q)))))
      case DescribeQueryStmt(q) => (ds, Some(QuadsOutput(q.run(ds))))
      case SelectQueryStmt(q) => (ds, Some(TableOutput(q.run(seedS(q)))))
    }
  }
}
