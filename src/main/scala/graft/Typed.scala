package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts
import graft.rules.TranscriptRules

/** One turn of a conversation transcript (the input_hint row type). */
case class Turn(conv_id: String, turn_idx: Int, role: String, text: String,
    tool: Option[String], ts: java.sql.Timestamp)

/** One quad of the constructed graph. */
case class Quad(subj: String, pred: String, obj: String, graph: String)

/** Typed Dataset API boundary: case-class views over the pipeline for
  * callers that want compile-time field checks; internals stay `Column`
  * expressions (untyped) for codegen (SURVEY.md §7.1 design stance).
  */
object Typed {

  def turns(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    Transcripts(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .as[Turn]
  }

  def triples(spark: SparkSession, sfDir: String): Dataset[Quad] = {
    import spark.implicits._
    TranscriptRules.triples(Transcripts(spark, sfDir)).as[Quad]
  }

  def canonicalTriples(spark: SparkSession, sfDir: String): Dataset[Quad] = {
    import spark.implicits._
    pipeline.Kg.canonicalTriples(spark, sfDir).as[Quad]
  }
}
