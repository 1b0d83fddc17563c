package graft.ops

import org.apache.spark.sql.functions._
import Parity._

/** Text-analysis operators over the `documents` table — the
  * language-ID / quality-scoring / token-counting / fingerprinting
  * layer a large-scale training-data pipeline needs (builder brief;
  * SURVEY.md §7.1 step 8). All are narrow per-row transforms: no
  * shuffle except the final presentation ORDER BY, so they scale
  * linearly with input splits at 100 TB.
  *
  * Cross-engine determinism: token hashes are md5-hex-prefix integers
  * (identical in Spark `conv(hex,16,10)` and DuckDB `'0x'||hex` cast);
  * ratios are exact integer counts divided as doubles at the end.
  */
object TextOps {

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation, the common
    * pre-tokenizer shape) + character classes.
    */
  val qTokens = QueryDef(
    "q_text_tokens",
    (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
            .as("bpe_tokens"),
          length(col("text")).cast("long").as("n_chars_obs"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("vocab"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
          AS BIGINT) AS bpe_tokens,
        CAST(length(text) AS BIGINT) AS n_chars_obs,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS vocab
      FROM documents ORDER BY doc_id"""))

  private val stopRe = "\\b(the|a|of|and|to|in|is|it|for|on)\\b"

  /** Quality scoring: length, punctuation, stopword and repetition
    * signals composed into a single score — the usual pre-filter for
    * web-scraped training text.
    */
  val qQuality = QueryDef(
    "q_text_quality",
    (s, dir) => {
      val toks = size(split(col("text"), " ")).cast("double")
      val stops = size(regexp_extract_all(col("text"), lit(stopRe), lit(0)))
        .cast("double")
      val punct = size(regexp_extract_all(col("text"),
        lit("[^a-z0-9 ]"), lit(0))).cast("double")
      val vocab = size(array_distinct(split(col("text"), " "))).cast("double")
      val chars = length(col("text")).cast("double")
      Tables.t(s, dir, "documents")
        .select(
          col("doc_id"),
          toks.cast("long").as("n_tokens"),
          (stops / toks).as("stop_ratio"),
          (punct / chars).as("punct_ratio"),
          (vocab / toks).as("ttr"), // type-token ratio: repetition signal
          (chars / toks).as("avg_token_len"),
          // composite score: informative length, low punct, some
          // stopwords (natural prose), low repetition
          (least(toks / lit(100.0), lit(1.0)) * (lit(1.0) - punct / chars) *
            least(stops / toks * 5.0, lit(1.0)) * (vocab / toks))
            .as("quality"))
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id,
        CAST(toks AS BIGINT) AS n_tokens,
        stops / toks AS stop_ratio,
        punct / chars AS punct_ratio,
        vocab / toks AS ttr,
        chars / toks AS avg_token_len,
        least(toks / 100.0, 1.0) * (1.0 - punct / chars) *
          least(stops / toks * 5.0, 1.0) * (vocab / toks) AS quality
      FROM (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS DOUBLE) AS toks,
          CAST(len(regexp_extract_all(text, '$stopRe')) AS DOUBLE) AS stops,
          CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
            AS punct,
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            AS vocab,
          CAST(length(text) AS DOUBLE) AS chars
        FROM documents)
      ORDER BY doc_id"""))

  /** Language ID: marker-n-gram scoring — count hits of per-language
    * function-word markers (plus a CJK codepoint check), argmax with a
    * deterministic tie order. The standard fastText-free heuristic for
    * pipeline pre-bucketing.
    */
  val qLangId = QueryDef(
    "q_text_langid",
    (s, dir) => {
      def hits(re: String) =
        size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
      val en = hits("\\b(the|and|of|is|it)\\b")
      val de = hits("\\b(der|die|das|und|ist)\\b")
      val es = hits("\\b(el|los|las|es|una)\\b")
      val fr = hits("\\b(le|les|est|une|dans)\\b")
      val zh = hits("[\\x{4e00}-\\x{9fff}]")
      val best = greatest(en, de, es, fr, zh)
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("lang_meta"),
          en.as("en_hits"), de.as("de_hits"), es.as("es_hits"),
          fr.as("fr_hits"), zh.as("zh_hits"),
          when(best === 0, "und")
            .when(best === zh, "zh").when(best === en, "en")
            .when(best === de, "de").when(best === es, "es")
            .otherwise("fr").as("lang_pred"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang AS lang_meta, en_hits, de_hits, es_hits,
        fr_hits, zh_hits,
        CASE WHEN best = 0 THEN 'und'
             WHEN best = zh_hits THEN 'zh' WHEN best = en_hits THEN 'en'
             WHEN best = de_hits THEN 'de' WHEN best = es_hits THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM (
        SELECT *, greatest(en_hits, de_hits, es_hits, fr_hits, zh_hits)
            AS best
        FROM (
          SELECT doc_id, lang,
            CAST(len(regexp_extract_all(text, '\b(the|and|of|is|it)\b'))
              AS BIGINT) AS en_hits,
            CAST(len(regexp_extract_all(text,
              '\b(der|die|das|und|ist)\b')) AS BIGINT) AS de_hits,
            CAST(len(regexp_extract_all(text, '\b(el|los|las|es|una)\b'))
              AS BIGINT) AS es_hits,
            CAST(len(regexp_extract_all(text,
              '\b(le|les|est|une|dans)\b')) AS BIGINT) AS fr_hits,
            CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
              AS BIGINT) AS zh_hits
          FROM documents))
      ORDER BY doc_id"""))

  /** Document fingerprinting: polynomial rolling hash over md5-prefix
    * token hashes (order-sensitive — distinguishes permuted docs,
    * unlike the bag-of-words signature in q_dedup_exact).
    */
  val qFingerprint = QueryDef(
    "q_text_fingerprint",
    (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          aggregate(
            transform(split(col("text"), " "),
              t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")),
            lit(0L),
            (acc, x) => (acc * 31L + x) % 2147483647L).as("fingerprint"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
              t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))),
          (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  /** Per-document top-3 salient terms by tf·(N/df) — tf-idf with the
    * exact rational N/df in place of ln(N/df), because ln() is not
    * bit-identical across engines while integer-ratio division is;
    * the ranking this produces is the same for any monotone weight.
    * Two shuffles (term stats, per-doc ranking), both on bounded keys.
    */
  val qTfIdf = QueryDef(
    "q_text_tfidf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.t(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf").cast("double") * col("n_docs") / col("df"))
            .as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, term, tf, df, score, rnk FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score,
          CAST(row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY CAST(tf.tf AS DOUBLE) * n.n_docs / df.df DESC,
                     tf.term) AS BIGINT) AS rnk
        FROM tf JOIN df USING (term) CROSS JOIN n)
      WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  val all: Seq[QueryDef] =
    Seq(qTokens, qQuality, qLangId, qFingerprint, qTfIdf)
}
