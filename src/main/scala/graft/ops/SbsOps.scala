package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binding-stream operators (`sbs`) — a binding stream is just a DataFrame
  * whose columns are the projection variables (SbsCmdImpls.java:65-112).
  */
object SbsOps {

  /** `sbs filter` — keep bindings where ALL expressions evaluate true
    * (SbsCmdImpls.java:178-202).
    */
  def filter(bindings: DataFrame, conds: Seq[Column]): DataFrame =
    bindings.filter(conds.reduce(_ && _))

  /** `sbs map -s 'SELECT … GROUP BY …'` — the incoming stream replaces the
    * query pattern; aggregation happens streaming (SbsCmdImpls.java:204-228).
    * Catalyst's partial+final HashAggregate is the streaming group-by.
    */
  def mapGroupBy(bindings: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    bindings.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Multi-source union: header = union of variable lists, missing vars
    * unbound/NULL (SbsCmdImpls.java:129-167).
    */
  def unionHeaders(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_.unionByName(_, allowMissingColumns = true))

  /** `sbs split` — partition bindings into separate files by key (the
    * reference registers the command but ships no implementation,
    * CmdSbsSplit.java; here it is Spark's native partitioned write: one
    * directory per key value, written in ONE distributed job — no
    * per-key query loop). Returns the distinct key count.
    */
  def splitWrite(bindings: DataFrame, keyCol: String, dir: String,
      format: String = "parquet"): Long = {
    bindings.write.mode("overwrite").format(format)
      .partitionBy(keyCol).save(dir)
    bindings.select(keyCol).distinct().count()
  }
}
