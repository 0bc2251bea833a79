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
    import graft.rules.ConstructParser._
    import spark.implicits._
    val QuadCols = Seq("graph", "subj", "pred", "obj")
    def quadsDf(rows: Seq[(String, String, String, String)]): DataFrame =
      rows.toDF(QuadCols: _*)
    def anti(ds: DataFrame, del: DataFrame): DataFrame =
      ds.join(del.select(QuadCols.map(col): _*), QuadCols, "left_anti")
    def ckpt(df: DataFrame): DataFrame = df.truncateLineage(true)

    var ds = initial.getOrElse(
      Seq.empty[(String, String, String, String)].toDF(QuadCols: _*))
    var last: Option[DataFrame] = None
    parseScript(text).foreach {
      case LoadStmt(path, g) =>
        val loaded = graft.sources.RdfIO.readRdfAuto(spark, path)
        ds = ckpt(ds.unionByName(
          g.fold(loaded)(gi => loaded.withColumn("graph", lit(gi)))))
      case InsertDataStmt(rows) =>
        ds = ckpt(ds.unionByName(quadsDf(rows)))
      case DeleteDataStmt(rows) =>
        ds = ckpt(anti(ds, quadsDf(rows))) // constant side: broadcast anti
      case InsertWhereStmt(q) =>
        ds = ckpt(ds.unionByName(q.run(ds).select(QuadCols.map(col): _*)))
      case DeleteWhereStmt(q) =>
        ds = ckpt(anti(ds, q.run(ds)))
      case ModifyStmt(del, ins) =>
        // one WHERE binds both templates against the PRE-update dataset;
        // the group is evaluated once and shared (lazy localCheckpoint)
        val (dels, inss) = graft.rules.ConstructParser.runModify(del, ins, ds)
        ds = ckpt(anti(ds, dels).unionByName(inss.select(QuadCols.map(col): _*)))
      case ClearGraphStmt(g) =>
        ds = ckpt(ds.filter(col("graph") =!= g))
      // graph management (SPARQL Update §3.2.5-3.2.7) as pure relational
      // rewrites over the quad frame: filter + relabel + union — no
      // row-at-a-time copying, the same shape at any scale
      case AddGraphStmt(src, dst) =>
        // RDF graphs are sets: the rebuilt destination dedupes, so a quad
        // already present in dst (or a repeated ADD) does not double up
        if (src != dst) ds = ckpt(ds.where(col("graph") =!= dst).unionByName(
          ds.where(col("graph") === dst).unionByName(
            ds.where(col("graph") === src).withColumn("graph", lit(dst)))
            .distinct()))
      case CopyGraphStmt(src, dst) =>
        if (src != dst) ds = ckpt(ds.where(col("graph") =!= dst).unionByName(
          ds.where(col("graph") === src).withColumn("graph", lit(dst))))
      case MoveGraphStmt(src, dst) =>
        if (src != dst) ds = ckpt(
          ds.where(col("graph") =!= dst && col("graph") =!= src).unionByName(
            ds.where(col("graph") === src).withColumn("graph", lit(dst))))
      case QueryStmt(q) => last = Some(q.run(ds))
      case SelectQueryStmt(q) => last = Some(q.run(ds))
    }
    SparqlRun(ds, last)
  }
}
