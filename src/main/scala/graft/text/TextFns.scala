package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RollingHash

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID, document fingerprinting. Everything except
  * langId is a per-row column expression (embarrassingly parallel, no
  * shuffle); langId shuffles only on doc_id-keyed aggregations plus
  * broadcast profile joins.
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

  /** Top-80 character trigrams per language, rank-ordered (count desc,
    * trigram asc) — generated from authored sample paragraphs under the
    * SAME normalization [[langId]] applies, so profile extraction and
    * classification are self-consistent. Literal constants: deterministic,
    * broadcastable, and mirrored verbatim into the DuckDB oracle by
    * [[langIdOracle]].
    */
  private[graft] val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "da" -> Seq("er ", "en ", " de", "et ", " ve", " og", "men", "mme", "n s", "og ", "r o", "ver", " da", " er", " ha", " i ", " me", " sk", "ag ", "dag", "de ", "der", "det", "e f", "le ", "or ", "r e", "ske", "t d", "te ", " al", " at", " by", " en", " fo", " hu", " hv", " ik", " li", " ma", " om", " os", " ov", " sa", "amm", "ang", "ar ", "at ", "ave", "den", "e a", "e b", "e g", "e h", "e s", "e v", "ege", "em ", "for", "g d", "g o", "ge ", "get", "hav", "i d", "ikk", "ke ", "kke", "lig", "lle", "man", "n v", "nde", "ne ", "nen", "nge", "nne", "om ", "os ", "ove"),
    "de" -> Seq("en ", "er ", "ie ", "nd ", " di", " un", "che", "die", "hen", "sch", "und", "as ", "ch ", "der", "e s", "ein", "n i", "ten", " al", " da", " me", " wa", " üb", "ach", "ber", "d d", "das", "ele", "es ", "ges", "ich", "iel", "ist", "le ", "n d", "n s", "nen", "r d", "r u", "s w", "st ", "übe", " de", " ei", " er", " es", " fr", " ge", " ha", " is", " ni", " sc", " si", " so", " sp", " st", " ta", " vi", " we", " wi", "adt", "ag ", "all", "alt", "dt ", "e f", "e g", "e m", "e w", "ede", "ehe", "ess", "h h", "in ", "ind", "ine", "lle", "lte", "n u", "ne "),
    "en" -> Seq(" th", "the", "he ", " an", "e a", "re ", "ver", "and", "ay ", "e t", "en ", "er ", "ing", "nd ", "ng ", "y t", " a ", " ar", " be", " ha", " ma", " sh", " to", " we", "any", "are", "at ", "day", "e s", "e w", "ery", "eve", "for", "hin", "in ", "is ", "ld ", "le ", "t t", "thi", " da", " ev", " fo", " ho", " in", " is", " it", " li", " of", " pl", " se", " su", " wh", " wo", "a b", "as ", "e c", "eat", "ed ", "hat", "her", "hil", "hou", "it ", "ke ", "ll ", "man", "n a", "n t", "ny ", "of ", "pla", "r a", "ry ", "s a", "tha", "wor", "y w", "yth", " ab"),
    "es" -> Seq("as ", "os ", " de", " el", "el ", " ha", " mu", " y ", "a p", "an ", "do ", "la ", " ca", " lo", " pa", " so", " un", "a h", "ar ", "asa", "en ", "es ", "lla", "n e", "o a", "que", "s a", "ue ", "ía ", " al", " an", " dí", " en", " es", " he", " ju", " la", " ma", " no", " pe", " qu", " to", "a c", "a d", "abl", "ada", "ant", "ara", "cas", "cha", "de ", "del", "día", "e h", "ell", "ent", "has", "ien", "l m", "lo ", "los", "mos", "muc", "n c", "n d", "n m", "ndo", "nte", "odo", "oso", "par", "pre", "ra ", "s c", "s e", "s l", "s n", "sa ", "to ", "tod"),
    "fr" -> Seq("lle", "le ", " de", "de ", "ent", "nt ", "es ", "ill", "ns ", " la", " le", "la ", "our", "ur ", " et", " qu", "et ", "jou", "les", "t d", " au", " be", " en", " jo", " pa", " vi", "ais", "and", "ant", "dan", "e g", "e j", "e l", "e s", "eil", "ell", "ien", "mai", "ne ", "ous", "par", "que", "s e", "s l", "s t", "son", "t c", "ue ", "us ", " ce", " da", " el", " es", " ge", " ja", " ma", " me", " no", " pe", " po", " re", " so", " su", " te", " to", " tr", " un", "a m", "a p", "ans", "auc", "ava", "bea", "ce ", "cou", "e a", "e b", "e m", "e n", "e t"),
    "it" -> Seq("no ", "te ", "ent", "la ", "o m", "re ", " di", " e ", " gi", " mo", " so", "a c", "e s", "gio", "ior", " ch", " ci", " ma", " no", " pe", " su", " è ", "ano", "che", "di ", "e c", "e d", "e i", "e l", "ell", "he ", "i g", "lla", "men", "mol", "nde", "ni ", "nti", "olt", "orn", "per", "se ", "son", "to ", " be", " ca", " il", " la", " og", " pa", " qu", " tu", " un", "a g", "a p", "and", "are", "ata", "cas", "cit", "de ", "do ", "e n", "e p", "e è", "end", "er ", "ess", "ggi", "gli", "i a", "i e", "i s", "il ", "itt", "l m", "le ", "lte", "na ", "ndo"),
    "nl" -> Seq("en ", "er ", "de ", " de", "n d", " he", " we", "et ", " da", " en", " ve", "eer", "het", "ver", " wa", " ze", "ag ", "e d", "e m", "e v", "ijn", "in ", "is ", "n e", "n i", "n o", "n z", "nde", "ove", "te ", " al", " ee", " er", " ge", " hu", " in", " is", " me", " mo", " no", " on", " ov", " st", " te", " vo", " vr", " zi", " zo", "aar", "all", "an ", "ass", "at ", "daa", "dag", "der", "e s", "e w", "eel", "een", "el ", "ere", "ete", "g e", "hui", "ien", "iet", "je ", "jn ", "ken", "lle", "n h", "n s", "oie", "om ", "ooi", "oud", "r h", "s g", "s v"),
    "pl" -> Seq("dzi", " do", " ni", " wi", "ie ", " i ", "nie", "wie", "zie", " je", " na", "ch ", "dy ", "e w", "ego", "em ", "est", "iel", "jes", "o d", "odz", "rze", "st ", "szy", " ba", " dz", " mi", " mo", " o ", " po", " si", " to", " w ", " ws", " za", " św", "a d", "a n", "ad ", "as ", "ast", "awi", "ci ", "cze", "d m", "dom", "eci", "gdy", "go ", "i b", "ias", "ich", "iec", "ię ", "ięk", "ka ", "kie", "m n", "mia", "nad", "o w", "pod", "rac", "rzy", "się", "ste", "stk", "tki", "to ", "wia", "wsz", "y d", "y w", "ym ", "yst", "zap", "zia", "zym", "zys", "ę w"),
    "pt" -> Seq("as ", "os ", " e ", " mu", "de ", "do ", "que", "to ", " de", " o ", " pa", " pe", " qu", " to", "a c", "a p", "am ", "ant", "ara", "e a", "mui", "nte", "nto", "o m", "par", "ra ", "s e", "s p", "tas", "uit", " a ", " an", " as", " br", " ca", " ci", " di", " es", " ma", " na", " os", " so", " um", "a a", "a g", "a t", "ada", "ade", "and", "ar ", "asa", "bri", "cas", "cid", "con", "da ", "dad", "dia", "dos", "ece", "ela", "ent", "ia ", "ida", "im ", "ita", "ito", "lha", "m d", "na ", "nca", "ndo", "nti", "o e", "o o", "odo", "qua", "ria", "s a", "s c"),
    "sv" -> Seq("en ", " de", "et ", "ar ", "den", "er ", " oc", " vä", "ag ", "ch ", "de ", "n v", "och", " al", " fö", " ha", " st", " va", "ade", "dag", "det", "för", "la ", "om ", "r a", "sta", "t o", "tt ", "är ", " at", " da", " en", " i ", " li", " må", " om", " so", " vi", " är", " öv", "a a", "all", "att", "cke", "e f", "em ", "g f", "ga ", "h d", "har", "ker", "lla", "mån", "n l", "n s", "nga", "or ", "r d", "r e", "r i", "r o", "r ö", "t v", "ta ", "tad", "tar", "var", "ver", "ång", "ör ", "öve", " ar", " av", " ba", " bä", " du", " fi", " fl", " fr", " få"))

  /** Profile depth = the out-of-place penalty for a doc trigram missing
    * from a language's profile (Cavnar–Trenkle).
    */
  private[graft] val ProfK = 80
  /** Doc-side trigram rank depth. */
  private[graft] val DocK = 40

  /** Language identification: Cavnar–Trenkle character-trigram rank
    * distance against [[LangProfiles]]. Distributed shape: trigrams
    * explode per doc, count + rank inside a doc_id-partitioned window,
    * then a BROADCAST join against the ~400-row profile table and one
    * doc_id×lang aggregation — every shuffle is keyed by doc_id, nothing
    * is global, so the plan survives arbitrary corpus scale. Docs too
    * short for a trigram classify as "und".
    */
  def langId(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = concat(lit(" "),
      trim(regexp_replace(lower(col("text")), "[^\\p{L}]+", " ")), lit(" "))
    // index array in its OWN column before the explode (never explode a
    // computed expression — InferFiltersFromGenerate re-evaluates it)
    val tgs = docs.select(col("doc_id"), norm.as("#n"))
      .withColumn("#idx", when(length(col("#n")) >= 3,
        sequence(lit(1), length(col("#n")) - 2))
        .otherwise(array().cast("array<int>")))
      .select(col("doc_id"), col("#n"), explode_outer(col("#idx")).as("#i"))
      .where(col("#i").isNotNull)
      .select(col("doc_id"), col("#n").substr(col("#i"), lit(3)).as("tg"))
    val ranked = tgs.groupBy("doc_id", "tg").agg(count(lit(1)).as("cnt"))
      .withColumn("rd", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("tg").asc)))
      .where(col("rd") <= DocK)
      .select("doc_id", "tg", "rd")
    val prof = LangProfiles.flatMap { case (lang, ts) =>
      ts.zipWithIndex.map { case (t, k) => (lang, t, k + 1) }
    }.toDF("lang", "tg", "rp")
    val langs = LangProfiles.map(_._1).toDF("lang")
    val dists = ranked.crossJoin(broadcast(langs))
      .join(broadcast(prof), Seq("lang", "tg"), "left")
      .groupBy("doc_id", "lang")
      .agg(sum(coalesce(abs(col("rd") - col("rp")), lit(ProfK))).as("dist"))
    val best = dists.withColumn("#rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("dist").asc, col("lang").asc)))
      .where(col("#rk") === 1)
      .select("doc_id", "lang", "dist")
    docs.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("pred_lang"),
        coalesce(col("dist"), lit(0L)).cast("long").as("score"))
  }

  /** DuckDB mirror of [[langId]] over table `tbl`, generated from the
    * SAME profile constants so the two can never drift.
    */
  def langIdOracle(tbl: String): String = {
    val profRows = LangProfiles.flatMap { case (lang, ts) =>
      ts.zipWithIndex.map { case (t, k) =>
        s"('$lang','${t.replace("'", "''")}',${k + 1})" }
    }.mkString(",\n    ")
    s"""WITH n AS (
       |  SELECT doc_id,
       |    ' ' || trim(regexp_replace(lower(text), '[^\\pL]+', ' ', 'g')) || ' ' AS nt
       |  FROM $tbl
       |), tg AS (
       |  SELECT doc_id,
       |    substring(nt, CAST(unnest(range(1, greatest(length(nt)-1, 1))) AS INT), 3) AS tg
       |  FROM n
       |), cnt AS (
       |  SELECT doc_id, tg, count(*) AS cnt FROM tg GROUP BY 1, 2
       |), ranked AS (
       |  SELECT doc_id, tg, CAST(row_number() OVER (
       |    PARTITION BY doc_id ORDER BY cnt DESC, tg ASC) AS INT) AS rd
       |  FROM cnt
       |), top AS (SELECT * FROM ranked WHERE rd <= $DocK),
       |prof(lang, tg, rp) AS (VALUES
       |    $profRows
       |), langs AS (SELECT DISTINCT lang FROM prof),
       |dist AS (
       |  SELECT t.doc_id, l.lang,
       |    sum(coalesce(abs(t.rd - p.rp), $ProfK)) AS dist
       |  FROM top t CROSS JOIN langs l
       |  LEFT JOIN prof p ON p.lang = l.lang AND p.tg = t.tg
       |  GROUP BY 1, 2
       |), best AS (
       |  SELECT doc_id, lang, dist, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY dist ASC, lang ASC) AS rk
       |  FROM dist
       |)
       |SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang,
       |  CAST(coalesce(b.dist, 0) AS BIGINT) AS score
       |FROM $tbl d LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)""".stripMargin
  }

  /** Document fingerprint via the native codegen RollingHash expression,
    * over the SAME normalization dedup uses (one canonical definition).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      RollingHash(graft.dedup.Dedup.normalized(col("text"))).as("fingerprint"))
}
