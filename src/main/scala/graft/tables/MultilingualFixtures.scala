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
  * doc_ids start at 900001, far above any driver-generated id at every
  * SF, so fixture rows never collide and never join to other tables.
  */
object MultilingualFixtures {

  /** (doc_id, text, lang, source). The ru and zh entries are planted
    * near-duplicate pairs: each pair differs in exactly the final
    * word (ru) / final character (zh), so their 3-shingle Jaccard is
    * ~0.9 and MinHash+LSH banding must surface them.
    */
  val rows: Seq[(Long, String, String, String)] = Seq(
    (900001L, "я читаю книгу и он смотрит на реку а это было что надо с утра до вечера и мы идем домой вместе сегодня", "ru", "fixture"),
    (900002L, "я читаю книгу и он смотрит на реку а это было что надо с утра до вечера и мы идем домой вместе завтра", "ru", "fixture"),
    (900003L, "我的朋友是好人他有一本书我们在北京看了天安门和长城", "zh", "fixture"),
    (900004L, "我的朋友是好人他有一本书我们在北京看了天安门和长山", "zh", "fixture"),
    (900005L, "これは日本語のテキストです私は東京に行きたいと思います", "ja", "fixture"),
    (900006L, "هذا كتاب جميل من المكتبة في المدينة على الطاولة كان لا يريد أن يذهب إلى السوق", "ar", "fixture"),
    (900007L, "यह एक अच्छी किताब है और मेरे घर में है तो हम उसे पढ़ते हैं पर आज नहीं", "hi", "fixture"),
    (900008L, "이 책은 좋은 책 입니다 그리고 우리는 서울 에서 읽습니다 하지만 오늘 은 비가 옵니다", "ko", "fixture"),
    (900009L, "the quick программист and the данные pipeline run fast for it is that good", "en", "fixture")
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
