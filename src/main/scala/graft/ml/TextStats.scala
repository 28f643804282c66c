package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * token counting (whitespace + BPE-ish regex), quality scoring,
  * n-gram heuristic language ID, document fingerprinting.
  *
  * All column expressions are chosen to be computable identically in
  * DuckDB (oracle parity): plain regexes (no lookaround), distinct-set
  * intersections, md5-based hashes. Everything is a codegen'd
  * projection — zero shuffles; at 100 TB these run map-side at scan
  * speed.
  */
object TextStats {

  /** Lowercase word tokens (runs of [a-z0-9]). */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** GPT2-ish byte-pair-encoding token count approximation: contractions,
    * space-prefixed word/number runs, punctuation runs, whitespace runs.
    */
  val BpeishPattern =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+|\\s+"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Scores are DISTINCT-hit counts so the oracle's list_intersect
    * matches array_intersect exactly.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "du", "ich", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "zh" -> Seq("de", "le", "shi", "wo", "bu", "zai", "ren", "you", "ta", "zhe")
  )

  def langScore(toks: Column, lang: String): Column = {
    val words = StopwordProfiles.toMap.apply(lang)
    size(array_intersect(toks, array(words.map(lit): _*)))
  }

  /** argmax over profile scores, ties to the alphabetically-first
    * language; all-zero scores -> 'und' (undetermined).
    */
  def predictedLang(toks: Column): Column = {
    val scored = StopwordProfiles.map { case (lang, _) => lang -> langScore(toks, lang) }
    val best = scored.map(_._2).reduce(greatest(_, _))
    // foldRight so the FIRST (alphabetically) matching language wins ties
    scored.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality metrics + composite score (length, stopword evidence,
    * punctuation noise), matching the reference's quality-screen idea
    * of length/punct/stopword ratios.
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val punct = nChars - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    val stopHits = langScore(toks, "en")
    df.withColumn("n_chars_calc", nChars)
      .withColumn("n_tokens", nToks)
      .withColumn(
        "avg_token_len",
        when(nToks > 0, length(array_join(toks, "")).cast("double") / nToks)
      )
      .withColumn("punct_ratio", punct.cast("double") / greatest(nChars, lit(1)))
      .withColumn("stop_hits", stopHits)
      .withColumn(
        "quality_score",
        least(lit(1.0), nToks.cast("double") / 50.0) * 0.4 +
          least(lit(1.0), stopHits.cast("double") / 5.0) * 0.3 +
          (lit(1.0) - least(lit(1.0), (punct.cast("double") / greatest(nChars, lit(1))) * 10.0)) * 0.3
      )
  }

  /** PII patterns, written to behave identically under java.util.regex
    * (Spark codegen) and RE2 (DuckDB): no lookaround, no backrefs, no
    * ambiguous alternation — leftmost match and greedy quantifiers
    * agree in both engines for these shapes. `\b` is the ASCII word
    * boundary in both.
    */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhonePattern = """\b\d{3}-\d{3}-\d{4}\b"""

  /** PII detection + redaction over a text column: per-row match
    * counts for emails / IPv4 addresses / NANP-style phone numbers,
    * plus the text with every match replaced by a typed tag. Order
    * matters — emails are redacted first so an address-with-digits
    * host can't be re-matched as an IP fragment.
    *
    * Pure codegen'd projection (regexp_extract_all/regexp_replace) —
    * zero shuffles, runs map-side at scan speed at 100 TB; a training
    * pipeline puts this between quality filtering and packing.
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0))).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "[EMAIL]"),
          Ipv4Pattern,
          "[IP]"
        ),
        PhonePattern,
        "[PHONE]"
      ).as("redacted")
    )
  }
}
