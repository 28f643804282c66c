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

  /** Code-point ranges of the no-space CJK scripts (Hiragana,
    * Katakana, CJK Unified Ideographs + Extension A + compatibility):
    * text in these scripts carries no word delimiters, so the
    * tokenizer falls back to one token per character — the standard
    * char-n-gram discipline for shingling/langID over CJK. The `\x{…}`
    * range syntax parses identically in java.util.regex and RE2, so
    * one constant serves both engines.
    */
  val CjkCharClass =
    "\\x{3040}-\\x{30ff}\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}\\x{f900}-\\x{faff}"

  /** Token-boundary class: any run of characters that are not Unicode
    * letters (`\p{L}`), combining marks (`\p{M}` — keeps Devanagari /
    * Arabic vowel signs inside their word), or digits (`\p{N}`).
    * Supported with identical semantics by java.util.regex and
    * DuckDB's RE2 (parity proven byte-exact in MultilingualSpec).
    */
  val TokenSplitClass = "[^\\p{L}\\p{M}\\p{N}]+"

  /** Lowercase word tokens: Unicode letter/mark/digit runs, with CJK
    * characters tokenizing one char per token (char-n-gram fallback
    * for the no-space scripts). Latin-only text tokenizes exactly as
    * the previous ASCII `[a-z0-9]` rule did.
    *
    * Production path: the one-pass codegen'd
    * [[graft.functions.UnicodeTokens]] kernel. [[tokensRegex]] is the
    * semantically-identical composable form (two regex passes, ~2.2x
    * slower) that doubles as the DuckDB oracle mirror; MultilingualSpec
    * pins native ≡ regex with a ScalaCheck net.
    */
  def tokens(text: Column): Column =
    graft.functions.UnicodeTokens.tokens(text)

  /** Regex formulation of [[tokens]] — the oracle-mirror twin. */
  def tokensRegex(text: Column): Column =
    array_remove(
      split(regexp_replace(lower(text), s"([$CjkCharClass])", " $1 "), TokenSplitClass),
      ""
    )

  /** DuckDB mirror of [[tokens]] (RE2 replacement uses `\1` where Java
    * uses `$1`; everything else is the same runtime pattern text).
    */
  def tokensSqlExpr(input: String): String =
    s"list_filter(string_split_regex(regexp_replace(lower($input), " +
      s"'([$CjkCharClass])', ' \\1 ', 'g'), '$TokenSplitClass'), x -> x <> '')"

  /** GPT2-ish byte-pair-encoding token count approximation:
    * contractions, single CJK characters (a real BPE emits roughly one
    * token per ideograph), space-prefixed letter/digit runs,
    * punctuation runs, whitespace runs. Ordered alternation — both
    * engines match leftmost-first.
    */
  val BpeishPattern =
    s"'(?:s|t|re|ve|m|ll|d)| ?[$CjkCharClass]| ?[\\p{L}\\p{M}]+| ?\\p{N}+| ?[^\\p{L}\\p{M}\\p{N}\\s]+|\\s+"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Stopword profiles for the stopword/char-n-gram language-ID
    * heuristic, alphabetical so tie-breaking is deterministic. Latin
    * profiles are word stopwords; zh/ja profiles are single-character
    * stopwords (the CJK fallback makes each char a token); ar/hi/ru/ko
    * are word stopwords in their native scripts. Scores are
    * DISTINCT-hit counts so the oracle's list_intersect matches
    * array_intersect exactly.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "هذا", "التي", "كان", "لا"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "du", "ich", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "hi" -> Seq("है", "के", "की", "का", "में", "से", "को", "और", "पर", "नहीं"),
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と", "し"),
    "ko" -> Seq("이", "그", "저", "수", "있다", "하다", "것이", "입니다", "그리고", "하지만"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с", "как", "это"),
    "zh" -> Seq("的", "一", "是", "不", "了", "在", "人", "有", "我", "这")
  )

  def langScore(toks: Column, lang: String): Column = {
    val words = StopwordProfiles.toMap.apply(lang)
    size(array_intersect(toks, array(words.map(lit): _*)))
  }

  /** A language's stopword list as a DuckDB list literal. */
  def profileSqlList(lang: String): String =
    StopwordProfiles.toMap.apply(lang).map(w => s"'$w'").mkString(", ")

  /** DuckDB mirror of [[langScore]]. */
  def langScoreSqlExpr(lang: String, toks: String = "toks"): String =
    s"len(list_intersect($toks, [${profileSqlList(lang)}]))"

  /** Best stopword evidence across ALL profiles — the multilingual
    * generalization of "English stopword hits" for quality scoring:
    * natural text in any profiled language scores, gibberish doesn't.
    */
  def bestStopHits(toks: Column): Column =
    StopwordProfiles.map { case (l, _) => langScore(toks, l) }.reduce(greatest(_, _))

  /** DuckDB mirror of [[bestStopHits]]. */
  def bestStopHitsSqlExpr(toks: String = "toks"): String =
    StopwordProfiles
      .map { case (l, _) => langScoreSqlExpr(l, toks) }
      .mkString("greatest(", ", ", ")")

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

  /** Punctuation class for quality scoring: anything that is not a
    * Unicode letter/mark/digit or whitespace. The same runtime string
    * is a valid RE2 pattern, so SQL mirrors reuse this constant.
    */
  val PunctClass = "[^\\p{L}\\p{M}\\p{N}\\s]"

  /** Quality metrics + composite score (length, stopword evidence,
    * punctuation noise), matching the reference's quality-screen idea
    * of length/punct/stopword ratios. Stopword evidence is the best
    * hit count across all language profiles, so non-English natural
    * text scores as high as English.
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val punct = nChars - length(regexp_replace(text, PunctClass, ""))
    val stopHits = bestStopHits(toks)
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
