package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Planted non-Latin documents for the multilingual text-pipeline
  * queries (q_token_stats / q_lang_id / q_ngram_jaccard and the
  * MultilingualSpec nets). The driver-generated `documents` table is
  * ASCII-only, so Unicode tokenization, CJK char-fallback, non-Latin
  * language ID and non-Latin near-dup detection would otherwise never
  * be exercised by an oracle row. One Scala value feeds BOTH engines:
  * [[df]] for Spark and [[docsMlCteSql]] (a `docs_ml` CTE unioning the
  * same rows as a VALUES list) for DuckDB, so the fixture can never
  * drift between the two sides.
  *
  * Content constraints (regex/casefold parity, proven byte-exact in
  * MultilingualSpec): BMP-only, no Turkish dotted I, no uppercase
  * final-position Greek sigma, no ZWJ/ZWNJ — the only case-mapping and
  * tokenization inputs where java.util.regex/`toLowerCase` and
  * DuckDB's RE2/utf8proc could disagree.
  *
  * doc_ids start at [[MinId]] = 10^12 + 1. Driver-generated doc_ids
  * top out in the thousands, and the ScaleUp rehearsal tool shifts
  * replica ids by k*(max+1) — at sf0.1's ~5000-doc span the fixture
  * range stays clear up to a ~2*10^8 scale factor (ScaleUp asserts
  * this invariant per run), so fixture rows never collide with corpus
  * rows and never join to other tables.
  */
object MultilingualFixtures {

  /** Lowest fixture doc_id; every driver/ScaleUp-generated id must
    * stay strictly below this (asserted by ScaleUp per run).
    */
  val MinId: Long = 1000000000001L

  /** (doc_id, text, lang, source). The ru and zh entries are planted
    * near-duplicate pairs: each pair differs in exactly the final
    * word (ru) / final character (zh), so their 3-shingle Jaccard is
    * ~0.9 and MinHash+LSH banding must surface them.
    */
  val rows: Seq[(Long, String, String, String)] = Seq(
    (MinId + 0, "я читаю книгу и он смотрит на реку а это было что надо с утра до вечера и мы идем домой вместе сегодня", "ru", "fixture"),
    (MinId + 1, "я читаю книгу и он смотрит на реку а это было что надо с утра до вечера и мы идем домой вместе завтра", "ru", "fixture"),
    (MinId + 2, "我的朋友是好人他有一本书我们在北京看了天安门和长城", "zh", "fixture"),
    (MinId + 3, "我的朋友是好人他有一本书我们在北京看了天安门和长山", "zh", "fixture"),
    (MinId + 4, "これは日本語のテキストです私は東京に行きたいと思います", "ja", "fixture"),
    (MinId + 5, "هذا كتاب جميل من المكتبة في المدينة على الطاولة كان لا يريد أن يذهب إلى السوق", "ar", "fixture"),
    (MinId + 6, "यह एक अच्छी किताब है और मेरे घर में है तो हम उसे पढ़ते हैं पर आज नहीं", "hi", "fixture"),
    (MinId + 7, "이 책은 좋은 책 입니다 그리고 우리는 서울 에서 읽습니다 하지만 오늘 은 비가 옵니다", "ko", "fixture"),
    (MinId + 8, "the quick программист and the данные pipeline run fast for it is that good", "en", "fixture")
  )

  /** `n_chars` as DuckDB's `length()` counts it: code points. */
  private def nChars(text: String): Long = text.codePointCount(0, text.length).toLong

  /** The fixture rows as a DataFrame in the documents-table schema. */
  def df(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.map { case (id, text, lang, source) => (id, text, lang, source, nChars(text)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def sqlLit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** `docs_ml` CTE body: the documents table plus the fixture rows,
    * typed to the parquet schema (BIGINT ids/counts).
    */
  def docsMlCteSql: String = {
    val values = rows.map { case (id, text, lang, source) =>
      s"($id::BIGINT, ${sqlLit(text)}, ${sqlLit(lang)}, ${sqlLit(source)}, ${nChars(text)}::BIGINT)"
    }.mkString(",\n    ")
    s"""docs_ml AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $values
       |  ) AS f(doc_id, text, lang, source, n_chars)
       |)""".stripMargin
  }
}
