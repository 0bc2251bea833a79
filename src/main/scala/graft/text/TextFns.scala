package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RollingHash

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID heuristic, document fingerprinting. All per-row
  * column expressions — embarrassingly parallel, no shuffle.
  */
object TextFns {

  def tokenCount(text: Column): Column = size(split(text, " ")).cast("long")

  /** GPT-2-style BPE pre-tokenizer pattern (the public regex shape:
    * contractions | letter runs | digit runs | punctuation runs |
    * whitespace runs, each with an optional leading space). Counting its
    * matches approximates subword-token counts closely enough for corpus
    * budgeting without a vocab file.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("long")

  /** Quality facets: char length, alpha ratio, stopword ratio, mean token
    * length — the usual cheap heuristics for corpus filtering.
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val toks = tokenCount(t)
    val alpha = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val stops = Seq("the", "a", "of", "and", "to", "in")
    val stopHits = stops.map(s =>
      size(filter(split(t, " "), x => x === s))).reduce(_ + _)
    docs.select(col("doc_id"),
      length(t).as("n_chars"),
      toks.as("n_tokens"),
      round(alpha / greatest(length(t), lit(1)), 4).as("alpha_ratio"),
      round(stopHits.cast("double") / greatest(toks, lit(1)), 4).as("stop_ratio"),
      round((length(t) - toks + 1).cast("double") / greatest(toks, lit(1)), 4)
        .as("mean_tok_len"))
  }

  /** n-gram/stopword language-ID heuristic: count marker-token hits per
    * language, argmax with deterministic tie order en>de>fr>es.
    */
  def langId(docs: DataFrame): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "a", "of", "and"),
      "de" -> Seq("der", "die", "und", "nicht"),
      "fr" -> Seq("le", "la", "et", "les"),
      "es" -> Seq("el", "la", "y", "los"))
    val toks = split(col("text"), " ")
    val scores = markers.map { case (lang, ms) =>
      lang -> ms.map(m => size(filter(toks, x => x === m))).reduce(_ + _)
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("score"),
          struct(sc.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    docs.select(col("doc_id"), best.getField("lang").as("pred_lang"),
      best.getField("score").cast("long").as("score"))
  }

  /** Document fingerprint via the native codegen RollingHash expression,
    * over the SAME normalization dedup uses (one canonical definition).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      RollingHash(graft.dedup.Dedup.normalized(col("text"))).as("fingerprint"))
}
