package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hot-path tokenization. Java's regex engine costs ~40× a literal split
  * on this workload (a `split(text, "[^A-Za-z0-9]+")` over the ×16 corpus
  * measured 69 s vs 4 s for translate+split): `translate` is a codegen
  * char loop and `split` on a single literal char takes Pattern.split's
  * non-regex fastpath.
  *
  * Semantics: identical to the regex class for ASCII text (the corpus and
  * oracle domain — the DuckDB oracles keep the regex form and the
  * correctness gate checks equality); non-ASCII codepoints stay inside
  * tokens rather than splitting them.
  */
object Tokenize {

  /** Every ASCII non-alphanumeric char (controls included — built
    * programmatically so no raw control bytes land in this source file).
    */
  val AsciiSeps: String =
    (0x00 to 0x7f).map(_.toChar).filterNot(_.isLetterOrDigit).mkString

  private val AsciiSpaces: String = " " * AsciiSeps.length

  /** Alphanumeric word tokens (word-boundary semantics; empty tokens from
    * leading/trailing/run separators removed).
    */
  def alnumTokens(text: Column): Column =
    array_remove(
      split(translate(text, AsciiSeps, AsciiSpaces), " ", -1), "")

  // RE2 \s (what the DuckDB oracles use): tab/newline/formfeed/CR/space
  // - deliberately NOT Java \s (which adds \u000B); all dedup
  // normalization routes through here so Spark and oracle agree
  private val WsSeps = "\t\n\f\r"

  /** Lowercased whitespace-delimited tokens (the dedup normalization:
    * same token sequence as `split(regexp_replace(trim(lower(text)),
    * "\\s+", " "), " ")`).
    */
  def wsTokens(text: Column): Column =
    array_remove(
      split(translate(lower(text), WsSeps, " " * WsSeps.length), " ", -1), "")
}
