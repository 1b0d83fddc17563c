package graft.ops

import org.apache.spark.sql.expressions.Window
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

  // the quality-score signal columns, shared by q_text_quality and
  // q_quality_calibrate (Column side and the mirrored DuckDB subquery)
  private val cToks = size(split(col("text"), " ")).cast("double")
  private val cStops =
    size(regexp_extract_all(col("text"), lit(stopRe), lit(0))).cast("double")
  private val cPunct = size(regexp_extract_all(col("text"),
    lit("[^a-z0-9 ]"), lit(0))).cast("double")
  private val cVocab =
    size(array_distinct(split(col("text"), " "))).cast("double")
  private val cChars = length(col("text")).cast("double")
  // composite score: informative length, low punct, some stopwords
  // (natural prose), low repetition
  private val cQuality =
    least(cToks / lit(100.0), lit(1.0)) * (lit(1.0) - cPunct / cChars) *
      least(cStops / cToks * 5.0, lit(1.0)) * (cVocab / cToks)
  private val qualityRawSql = s"""
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS DOUBLE) AS toks,
          CAST(len(regexp_extract_all(text, '$stopRe')) AS DOUBLE) AS stops,
          CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
            AS punct,
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            AS vocab,
          CAST(length(text) AS DOUBLE) AS chars
        FROM documents"""
  private val qualityExprSql =
    """least(toks / 100.0, 1.0) * (1.0 - punct / chars) *
          least(stops / toks * 5.0, 1.0) * (vocab / toks)"""

  /** Quality scoring: length, punctuation, stopword and repetition
    * signals composed into a single score — the usual pre-filter for
    * web-scraped training text.
    */
  val qQuality = QueryDef(
    "q_text_quality",
    (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(
          col("doc_id"),
          cToks.cast("long").as("n_tokens"),
          (cStops / cToks).as("stop_ratio"),
          (cPunct / cChars).as("punct_ratio"),
          (cVocab / cToks).as("ttr"), // type-token ratio: repetition
          (cChars / cToks).as("avg_token_len"),
          cQuality.as("quality"))
        .orderBy("doc_id"),
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

  /** Cross-source quality calibration: the composite score is NOT
    * comparable across sources (a clean-wiki source's 0.4 is junk, a
    * crawl source's 0.4 is its top decile), so mixing recipes
    * threshold on the per-source RANK, not the raw score. Emits each
    * doc's percent_rank and decile within its source — "keep the top
    * 30% of every source" is then one filter, the FineWeb-Edu-style
    * per-source cut. Rank ties break on doc_id so both engines agree
    * exactly; percent_rank's (rank−1)/(n−1) divides int64s once —
    * bit-identical IEEE.
    *
    * Scale shape: one window per source partition (same shape as
    * q_token_budget; a two-phase sampled-CDF cut is the extreme-skew
    * escape hatch documented there).
    */
  val qQualityCalibrate = QueryDef(
    "q_quality_calibrate",
    (s, dir) => {
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"), cQuality.as("quality"))
        .withColumn("pct_in_source", percent_rank().over(wSrc))
        .withColumn("decile", ntile(10).over(wSrc).cast("long"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source, $qualityExprSql AS quality
        FROM ($qualityRawSql))
      SELECT doc_id, source, quality,
        percent_rank() OVER (PARTITION BY source
          ORDER BY quality, doc_id) AS pct_in_source,
        CAST(ntile(10) OVER (PARTITION BY source
          ORDER BY quality, doc_id) AS BIGINT) AS decile
      FROM scored ORDER BY doc_id"""))

  /** Gopher-style rule gate: the hard pass/fail document filters from
    * the Gopher/MassiveText recipe (word count window, mean word
    * length window, symbol-to-word ratio cap, alphabetic-word
    * fraction floor, minimum stop-word count), each emitted as its
    * own boolean plus the conjunction — unlike [[qQuality]]'s soft
    * composite score, this is the binary pre-filter stage. Thresholds
    * are adapted to the fixture's short synthetic docs; at corpus
    * scale they're config. Narrow per-row transform, scales linearly.
    */
  val qGopherRules = QueryDef(
    "q_gopher_rules",
    (s, dir) => {
      val words = split(col("text"), " ")
      val nWords = size(words).cast("double")
      val chars = length(col("text")).cast("double")
      // mean word length over non-space chars: exact in both engines
      val meanWlen = (chars - (nWords - 1)) / nWords
      val alphaFrac = size(expr(
        "filter(split(text, ' '), w -> w rlike '[a-z]')"))
        .cast("double") / nWords
      val symbolRatio = size(regexp_extract_all(col("text"),
        lit("[^a-z0-9 ]"), lit(0))).cast("double") / nWords
      val nStops = size(regexp_extract_all(col("text"), lit(stopRe),
        lit(0))).cast("long")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          nWords.cast("long").as("n_words"),
          (nWords >= 10 && nWords <= 1000).as("ok_words"),
          (meanWlen >= 2.0 && meanWlen <= 12.0).as("ok_wlen"),
          (symbolRatio <= 0.3).as("ok_symbols"),
          (alphaFrac >= 0.7).as("ok_alpha"),
          (nStops >= 2L).as("ok_stops"))
        .withColumn("pass",
          col("ok_words") && col("ok_wlen") && col("ok_symbols") &&
            col("ok_alpha") && col("ok_stops"))
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        ok_words, ok_wlen, ok_symbols, ok_alpha, ok_stops,
        (ok_words AND ok_wlen AND ok_symbols AND ok_alpha AND ok_stops)
          AS pass
      FROM (
        SELECT doc_id, n_words,
          (n_words >= 10 AND n_words <= 1000) AS ok_words,
          ((chars - (n_words - 1)) / n_words >= 2.0 AND
           (chars - (n_words - 1)) / n_words <= 12.0) AS ok_wlen,
          (symbols / n_words <= 0.3) AS ok_symbols,
          (alpha / n_words >= 0.7) AS ok_alpha,
          (n_stops >= 2) AS ok_stops
        FROM (
          SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
            CAST(length(text) AS DOUBLE) AS chars,
            CAST(len(regexp_extract_all(text, '[^a-z0-9 ]'))
              AS DOUBLE) AS symbols,
            CAST(len(list_filter(string_split(text, ' '),
              w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) AS alpha,
            CAST(len(regexp_extract_all(text, '$stopRe')) AS BIGINT)
              AS n_stops
          FROM documents))
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

  /** Repetition signals (the Gopher-rules family): share of the most
    * frequent word 2-gram, fraction of 3-gram occurrences that are
    * repeats, and duplicate-word fraction — the standard filters for
    * boilerplate/spam in web-scale training text. Two shuffles, both
    * keyed on (doc_id, gram): uniformly distributed, skew-free at any
    * corpus size, and the per-doc gram count bounds each group.
    */
  val qRepetition = QueryDef(
    "q_text_repetition",
    (s, dir) => {
      // NOT spread: the gram kernels here are string concats feeding
      // immediately into (doc_id, g) exchanges — measured r14, the
      // extra round-robin exchange cost more than the parallel
      // concat saved
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // docs with < n tokens have no n-grams: filter BEFORE building
      // the index sequence — sequence(1, 0) is descending in Spark
      // and slice(toks, 0, n) is a runtime error (DuckDB's
      // generate_series(1, 0) is empty, so without the guard the
      // engines also diverge). Dropped docs resurface through the
      // left join with NULL gram stats, matching the oracle.
      def grams(n: Int) = docs
        .filter(size(col("toks")) >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
      def gramStats(n: Int, top: String, dup: String, tot: String) =
        grams(n).groupBy(col("doc_id"), col("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).as(top),
            sum(when(col("c") >= 2, col("c")).otherwise(0L)).as(dup),
            sum(col("c")).as(tot))
      val g2 = gramStats(2, "top2", "dup2", "n2")
      val g3 = gramStats(3, "top3", "dup3", "n3")
      val words = docs.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      words.join(g2, Seq("doc_id"), "left").join(g3, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_words"))
            .as("dup_word_frac"),
          (col("top2").cast("double") / col("n2")).as("top2_share"),
          (col("dup3").cast("double") / col("n3")).as("dup3_frac"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g2 AS (
        SELECT doc_id, max(c) AS top2,
               sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup2,
               sum(c) AS n2
        FROM (SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(
                      [array_to_string(toks[i:i+1], ' ')
                       for i in generate_series(1, len(toks) - 1)]) AS g
                    FROM toks)
              GROUP BY doc_id, g)
        GROUP BY doc_id),
      g3 AS (
        SELECT doc_id, max(c) AS top3,
               sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3,
               sum(c) AS n3
        FROM (SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(
                      [array_to_string(toks[i:i+2], ' ')
                       for i in generate_series(1, len(toks) - 2)]) AS g
                    FROM toks)
              GROUP BY doc_id, g)
        GROUP BY doc_id),
      words AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
        FROM toks)
      SELECT w.doc_id, w.n_words,
        1.0 - CAST(n_distinct AS DOUBLE) / n_words AS dup_word_frac,
        CAST(top2 AS DOUBLE) / n2 AS top2_share,
        CAST(dup3 AS DOUBLE) / n3 AS dup3_frac
      FROM words w
      LEFT JOIN g2 ON g2.doc_id = w.doc_id
      LEFT JOIN g3 ON g3.doc_id = w.doc_id
      ORDER BY w.doc_id"""))

  // PII patterns chosen inside the Java∩RE2 common dialect (character
  // classes, bounded repeats — no lookarounds), so Spark and DuckDB
  // match identical spans.
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\+1-555-[0-9]{4}"

  /** PII redaction / text cleaning: count and replace email + phone
    * spans, emit the cleaned text's signature. The fixture text is
    * PII-free, so the input stage deterministically plants contact
    * strings derived from fixture columns — the redactor then has real
    * spans to find; swap the planted column for raw text in a real
    * corpus. Narrow per-row transform: scales linearly.
    */
  val qClean = QueryDef(
    "q_text_clean",
    (s, dir) => {
      val dirty = concat(col("text"), lit(" contact "), col("source"),
        lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), dirty.as("dirty"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("dirty"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("clean_sig"),
          length(regexp_replace(
            regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).cast("long").as("clean_len"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH dirty AS (
        SELECT doc_id,
          text || ' contact ' || source || '@example.com or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(dirty, '$emailRe')) AS BIGINT)
          AS n_emails,
        CAST(len(regexp_extract_all(dirty, '$phoneRe')) AS BIGINT)
          AS n_phones,
        md5(regexp_replace(
          regexp_replace(dirty, '$emailRe', '<EMAIL>', 'g'),
          '$phoneRe', '<PHONE>', 'g')) AS clean_sig,
        CAST(length(regexp_replace(
          regexp_replace(dirty, '$emailRe', '<EMAIL>', 'g'),
          '$phoneRe', '<PHONE>', 'g')) AS BIGINT) AS clean_len
      FROM dirty ORDER BY doc_id"""))

  /** Corpus-LM surprise scoring: build a word-bigram model over the
    * whole corpus (count(w1,w2) and context totals count(w1)), then
    * score each document by its mean inverse conditional probability
    * — the perplexity-style quality signal pipelines use to drop
    * gibberish, with an exact rational surprise (ctx/cnt) instead of
    * log-prob because ln() is not bit-identical across engines while
    * correctly-rounded integer division is.
    *
    * Two-pass shape that scales: pass 1 aggregates the model (keys =
    * bigram vocab, bounded); pass 2 is a model equi-join + one window
    * per doc. Per-doc summation runs in token order via a running
    * window sum (both engines fold sequentially in frame order), so
    * the double accumulation is order-deterministic.
    */
  val qSurprise = QueryDef(
    "q_text_surprise",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
      val bg = toks
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(col("doc_id"), col("i"),
          element_at(col("toks"), col("i")).as("w1"),
          element_at(col("toks"), col("i") + 1).as("w2"))
      val model = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val ctx = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
      // per-doc fold over an i-sorted array — NOT a window running
      // sum: DuckDB's windowed sum aggregates via a segment tree
      // (different fp association), while an explicit list fold is
      // strictly sequential in both engines.
      bg.join(model, Seq("w1", "w2")).join(ctx, Seq("w1"))
        .select(col("doc_id"), col("i"),
          (col("cw").cast("double") / col("c")).as("r"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"),
          sort_array(collect_list(struct(col("i"), col("r")))).as("rs"))
        .select(col("doc_id"), col("n").as("n_bigrams"),
          (aggregate(transform(col("rs"), x => x.getField("r")),
            lit(0.0), (acc, v) => acc + v) / col("n")).as("surprise"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
      bg AS (
        SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i,
               toks
        FROM toks),
      bg2 AS (
        SELECT doc_id, i, toks[CAST(i AS INT)] AS w1,
               toks[CAST(i AS INT) + 1] AS w2
        FROM bg),
      model AS (SELECT w1, w2, count(*) AS c FROM bg2 GROUP BY w1, w2),
      ctx AS (SELECT w1, count(*) AS cw FROM bg2 GROUP BY w1),
      scored AS (
        SELECT b.doc_id, b.i, CAST(ctx.cw AS DOUBLE) / model.c AS r
        FROM bg2 b
        JOIN model ON model.w1 = b.w1 AND model.w2 = b.w2
        JOIN ctx ON ctx.w1 = b.w1)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          [x.r for x in list_sort(list(struct_pack(i := i, r := r)))]),
          (acc, v) -> acc + v) / count(*) AS surprise
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** Contamination n-gram width: long enough that a match is a real
    * benchmark excerpt, short enough to survive light edits.
    */
  private val ContamN = 5

  /** Benchmark-contamination check: for every corpus document, the
    * fraction of its distinct word-5-grams that also appear in a
    * held-out "benchmark" set (the `src0` source here; in production,
    * the eval suites). This is the decontamination gate every
    * training-data pipeline runs before a model sees the corpus.
    *
    * Scale shape: grams are hashed to 60-bit md5-prefix integers at
    * the source (8-byte join keys), the benchmark side is a DISTINCT
    * set that is tiny relative to the corpus — Spark broadcasts it (or
    * AQE does) so the corpus side never shuffles; the per-doc counts
    * are one (doc_id)-keyed partial aggregation.
    */
  /** Distinct hashed word-[[ContamN]]-grams of a (doc_id, text) frame
    * — 60-bit md5-prefix integers, the 8-byte contamination join key.
    * Pure Column expressions, so the same builder serves the batch
    * operator and the streaming stream-static semi-join
    * (StreamingIngest.contamination).
    */
  private[graft] def contamGrams(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = split(col("text"), " ")
    df.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= ContamN)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - (ContamN - 1)),
          i => conv(substring(md5(
            concat_ws(" ", slice(col("toks"), i, lit(ContamN)))),
            1, 15), 16, 10).cast("long")))).as("g"))
  }

  /** Readability scoring: Flesch reading ease over the vowel-group
    * syllable heuristic (a vowel run ≈ one syllable — the standard
    * dictionary-free approximation) and `[.!?]+` sentence runs,
    * floored at 1 sentence so punctuation-free docs (this fixture)
    * degrade to a whole-doc-as-one-sentence reading. The formula's
    * float constants multiply exact integer counts in the same
    * left-to-right order on both engines, so scores are
    * bit-identical. Narrow per-row transform.
    */
  val qReadability = QueryDef(
    "q_text_readability",
    (s, dir) => {
      val nWords = size(split(col("text"), " ")).cast("long")
      val nSent = greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
        .cast("long")
      val nSyll = size(regexp_extract_all(col("text"),
        lit("[aeiouy]+"), lit(0))).cast("long")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), nWords.as("n_words"),
          nSent.as("n_sentences"), nSyll.as("n_syllables"))
        .withColumn("flesch",
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words")))
        .orderBy("doc_id")
    },
    Some("""
      WITH c AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
            AS BIGINT) AS n_sentences,
          CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
            AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        206.835
          - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
          - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) AS flesch
      FROM c ORDER BY doc_id"""))

  /** Winnowing fingerprint size (tokens per gram) and window (hashes
    * per selection window) — Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting" (SIGMOD 2003).
    */
  private val WinnowK = 5
  private val WinnowW = 4

  /** Winnowing fingerprint selection: hash every K-token gram, slide
    * a window of W consecutive hashes, keep each window's minimum
    * (rightmost on ties), dedupe — the MOSS scheme. Its guarantee:
    * any shared run of K+W−1 tokens between two docs shares at least
    * one SELECTED fingerprint, so matching on the ~2/(W+1)-density
    * fingerprint set (instead of every gram, q_contamination's cost)
    * still finds every sufficiently long overlap.
    *
    * The rightmost-tie rule needs argmin-with-last-tie, which neither
    * engine's window functions express directly; both get the
    * identical form: reverse the window into an array and take
    * array_position of the min — first-in-reversed IS rightmost.
    *
    * Scale shape: one gram explode (~tokens/doc) and one lead()
    * window per doc partition — uniform keys, no joins; the
    * fingerprint set is what downstream overlap joins then consume at
    * 2/(W+1) of the gram volume.
    */
  /** The pre-dedupe winnow selection (one row per sliding window):
    * doc_id, fp_pos, fp_hash. Shared by q_text_winnow (fingerprint
    * dump) and q_winnow_overlap (pairwise consumer).
    */
  private def winnowSel(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    winnowSelOf(Tables.t(s, dir, "documents"))

  /** [[winnowSel]] over an arbitrary (doc_id, text) frame — lets the
    * contamination variant fingerprint the bench and corpus slices
    * separately.
    */
  private def winnowSelOf(
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val hashes = docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= WinnowK + WinnowW - 1)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("toks")) - (WinnowK - 1)),
          i => conv(substring(md5(
            concat_ws(" ", slice(col("toks"), i, lit(WinnowK)))),
            1, 15), 16, 10).cast("long"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("i"),
        col("col").as("h"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    hashes
      .withColumn("h1", lead(col("h"), 1).over(wDoc))
      .withColumn("h2", lead(col("h"), 2).over(wDoc))
      .withColumn("h3", lead(col("h"), 3).over(wDoc))
      .filter(col("h3").isNotNull) // complete windows only
      .withColumn("arr",
        array(col("h3"), col("h2"), col("h1"), col("h")))
      .withColumn("fp_hash", array_min(col("arr")))
      .withColumn("fp_pos",
        (col("i") + WinnowW -
          array_position(col("arr"), col("fp_hash"))).cast("long"))
      .select("doc_id", "fp_pos", "fp_hash")
  }

  /** Pure-JVM twin of [[winnowSel]] for parity/property specs (the
    * jvmMinHash precedent, Dedup.scala): returns the deduped
    * (fp_pos, fp_hash) set for one document, or Nil when shorter than
    * K+W−1 tokens. Must stay fold-for-fold identical to the SQL: gram
    * hash = first 15 hex chars of md5 parsed base-16; window min with
    * rightmost tie via the reversed-array position.
    */
  private[graft] def jvmWinnow(text: String): Seq[(Long, Long)] = {
    val toks = text.split(" ", -1)
    if (toks.length < WinnowK + WinnowW - 1) Nil
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val grams = Array.tabulate(toks.length - (WinnowK - 1)) { i0 =>
        md.reset()
        val hex = md.digest(toks.slice(i0, i0 + WinnowK).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      (1 to grams.length - (WinnowW - 1)).map { i =>
        // arr = [h(i+3), h(i+2), h(i+1), h(i)] — reversed window
        val arr = Array.tabulate(WinnowW)(j => grams(i - 1 + WinnowW - 1 - j))
        val mn = arr.min
        val idx = arr.indexOf(mn) + 1 // 1-based array_position
        (i.toLong + WinnowW - idx, mn)
      }.distinct.sorted
    }
  }

  /** DuckDB twin of [[winnowSelOf]]: CTE chain ending in `${p}sel`
    * with (doc_id, fp_pos, fp_hash); `p` prefixes the CTE names so
    * two chains (bench/corpus) can share one WITH, `where` filters
    * the documents slice.
    */
  private def winnowCtes(p: String, where: String): String = s"""
      ${p}toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' '))
          >= ${WinnowK + WinnowW - 1} AND ($where)),
      ${p}pos AS (
        SELECT doc_id,
          unnest(generate_series(1,
            len(toks) - ${WinnowK - 1})) AS i, toks
        FROM ${p}toks),
      ${p}hashes AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i,
          CAST('0x' || substr(md5(array_to_string(
            toks[CAST(i AS INT):CAST(i AS INT) + ${WinnowK - 1}], ' ')),
            1, 15) AS BIGINT) AS h
        FROM ${p}pos),
      ${p}leads AS (
        SELECT doc_id, i, h,
          lead(h, 1) OVER w AS h1,
          lead(h, 2) OVER w AS h2,
          lead(h, 3) OVER w AS h3
        FROM ${p}hashes WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
      ${p}wins AS (
        SELECT doc_id, i, [h3, h2, h1, h] AS arr
        FROM ${p}leads WHERE h3 IS NOT NULL),
      ${p}sel AS (
        SELECT doc_id,
          CAST(i + $WinnowW - list_position(arr, list_min(arr))
            AS BIGINT) AS fp_pos,
          list_min(arr) AS fp_hash
        FROM ${p}wins)"""

  private val WinnowCtes = "\n      WITH " + winnowCtes("", "TRUE")

  val qWinnow = QueryDef(
    "q_text_winnow",
    (s, dir) => winnowSel(s, dir).distinct().orderBy("doc_id", "fp_pos"),
    Some(s"""$WinnowCtes
      SELECT DISTINCT doc_id, fp_pos, fp_hash FROM sel
      ORDER BY doc_id, fp_pos"""))

  /** Max docs a fingerprint may appear in before it is treated as a
    * stop-phrase (boilerplate) and dropped from pair generation, and
    * the min shared-fingerprint count for a pair to be reported.
    */
  private val WinnowDfCap = 64
  private val WinnowMinShared = 3

  /** MOSS-style pairwise overlap: join docs on shared winnow
    * fingerprints, count matches per pair, score with fingerprint-set
    * Jaccard. The winnowing guarantee bounds what the fingerprint SET
    * can miss — any pair sharing a run of K+W−1 tokens shares ≥1
    * selected fingerprint, at ~2/(W+1) the gram-join volume
    * q_contamination pays. The REPORT then trades that recall for
    * precision: MinShared = 3 suppresses pairs whose only overlap is
    * one or two short runs (set it to 1 for the detection-complete
    * mode), and the df-cap drops fingerprints shared corpus-wide
    * (boilerplate), which can also hide a pair whose entire overlap
    * is boilerplate.
    *
    * Scale shape: the pair generator is a self-equi-join on fp_hash
    * with a df-cap (drop fingerprints in > DfCap docs) bounding the
    * worst key's fanout at DfCap² — same stop-shingle defense as
    * Dedup.scala's n-gram join; no all-pairs anything.
    */
  val qWinnowOverlap = QueryDef(
    "q_winnow_overlap",
    (s, dir) => {
      // r15 single-pass df-cap (guide §2.4): fps is one distinct
      // (doc_id, fp_hash) row per doc×hash, so the per-hash document
      // frequency is a COUNT OVER (PARTITION BY fp_hash) window on the
      // frame itself — one fp_hash exchange replaces the separate
      // groupBy(fp_hash) aggregation + left-semi join back, and the
      // downstream self-equi-join on fp_hash reuses the window's hash
      // partitioning. Identical kept set: window count == group count
      // on a distinct frame (oracle-verified).
      // cache: the winnow explode+window pipeline would otherwise
      // re-run for every consumer below (both join sides, per-doc
      // sizes) — the prunedShingles .cache() precedent
      val kept = winnowSel(s, dir).select("doc_id", "fp_hash").distinct()
        .withColumn("df", count(lit(1)).over(
          Window.partitionBy(col("fp_hash"))))
        .filter(col("df") <= WinnowDfCap)
        .select("doc_id", "fp_hash")
        .cache()
      val nfp = kept.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
      val pairs = kept.as("a")
        .join(kept.as("b"),
          col("a.fp_hash") === col("b.fp_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= WinnowMinShared)
      pairs
        .join(nfp.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("nfp", "nfp_a"), Seq("doc_a"))
        .join(nfp.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("nfp", "nfp_b"), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("shared"),
          (col("shared") /
            (col("nfp_a") + col("nfp_b") - col("shared"))).as("jacc"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""$WinnowCtes,
      fps AS (SELECT DISTINCT doc_id, fp_hash FROM sel),
      rare AS (
        SELECT fp_hash FROM fps GROUP BY fp_hash
        HAVING count(*) <= $WinnowDfCap),
      kept AS (
        SELECT doc_id, fp_hash FROM fps
        WHERE fp_hash IN (SELECT fp_hash FROM rare)),
      nfp AS (
        SELECT doc_id, count(*) AS nfp FROM kept GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS shared
        FROM kept a JOIN kept b
          ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= $WinnowMinShared)
      SELECT doc_a, doc_b, shared,
        shared / (na.nfp + nb.nfp - shared) AS jacc
      FROM pairs
      JOIN nfp na ON na.doc_id = doc_a
      JOIN nfp nb ON nb.doc_id = doc_b
      ORDER BY doc_a, doc_b"""))

  /** Span localization for the reported overlap pairs: the matched
    * fingerprint ANCHORS (pos_a, pos_b) of every q_winnow_overlap
    * pair — MOSS's actual review output ("these regions match"), and
    * the input a side-by-side diff viewer consumes. Each anchor marks
    * a shared K-token gram; consecutive anchors chain into spans.
    *
    * Scale shape: the same df-capped fp_hash equi-join as the overlap
    * pair generator (64² worst-key bound), with positions carried
    * through and a semi-join restricting output to pairs that cleared
    * MinShared — anchors for unreported pairs never materialize.
    */
  val qWinnowSpans = QueryDef(
    "q_winnow_spans",
    (s, dir) => {
      val sel = winnowSel(s, dir).distinct().cache()
      val fps = sel.select("doc_id", "fp_hash").distinct()
      val rare = fps.groupBy("fp_hash")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= WinnowDfCap)
        .select("fp_hash")
      val kept = fps.join(rare, Seq("fp_hash"), "left_semi")
      val reported = kept.as("a")
        .join(kept.as("b"),
          col("a.fp_hash") === col("b.fp_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= WinnowMinShared)
        .select("doc_a", "doc_b")
      val keptPos = sel.join(rare, Seq("fp_hash"), "left_semi")
      keptPos.as("a")
        .join(keptPos.as("b"),
          col("a.fp_hash") === col("b.fp_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.fp_pos").as("pos_a"), col("b.fp_pos").as("pos_b"))
        .join(reported, Seq("doc_a", "doc_b"), "left_semi")
        .distinct()
        .orderBy("doc_a", "doc_b", "pos_a", "pos_b")
    },
    Some(s"""$WinnowCtes,
      dsel AS (SELECT DISTINCT doc_id, fp_pos, fp_hash FROM sel),
      fps AS (SELECT DISTINCT doc_id, fp_hash FROM dsel),
      rare AS (
        SELECT fp_hash FROM fps GROUP BY fp_hash
        HAVING count(*) <= $WinnowDfCap),
      kept AS (
        SELECT doc_id, fp_hash FROM fps
        WHERE fp_hash IN (SELECT fp_hash FROM rare)),
      reported AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= $WinnowMinShared),
      keptpos AS (
        SELECT doc_id, fp_pos, fp_hash FROM dsel
        WHERE fp_hash IN (SELECT fp_hash FROM rare))
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        a.fp_pos AS pos_a, b.fp_pos AS pos_b
      FROM keptpos a
      JOIN keptpos b
        ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
      JOIN reported r
        ON r.doc_a = a.doc_id AND r.doc_b = b.doc_id
      ORDER BY doc_a, doc_b, pos_a, pos_b"""))

  /** Benchmark decontamination over winnow fingerprints: like
    * q_contamination, flag corpus docs overlapping the benchmark
    * source (src0), but match on the ~2/(W+1)-density selected
    * fingerprints instead of every 5-gram — the winnowing guarantee
    * keeps any ≥ K+W−1-token verbatim overlap detectable while the
    * semi-join moves a quarter of the keys. The flag threshold is on
    * the HIT COUNT (≥ 2 shared fingerprints), not a fraction of a
    * down-sampled denominator.
    *
    * Scale shape: identical to q_contamination — bench fingerprint
    * set is broadcast-size, corpus side is a narrow per-doc explode,
    * one LeftSemi on an 8-byte key, two bounded aggregates.
    */
  val qWinnowContam = QueryDef(
    "q_winnow_contamination",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      val bench = winnowSelOf(docs.filter(col("source") === "src0"))
        .select("fp_hash").distinct()
      // cache: consumed by both the hit semi-join and the per-doc
      // fingerprint counts
      val corpus = winnowSelOf(docs.filter(col("source") =!= "src0"))
        .select("doc_id", "fp_hash").distinct().cache()
      val hits = corpus.join(bench, Seq("fp_hash"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      corpus.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_fp"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("is_contaminated", col("n_hit") >= 2)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH ${winnowCtes("b_", "source = 'src0'")},
      ${winnowCtes("c_", "source <> 'src0'")},
      bench AS (SELECT DISTINCT fp_hash FROM b_sel),
      corp AS (SELECT DISTINCT doc_id, fp_hash FROM c_sel),
      hits AS (
        SELECT doc_id, count(*) AS n_hit FROM corp
        WHERE fp_hash IN (SELECT fp_hash FROM bench)
        GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_fp FROM corp GROUP BY doc_id)
      SELECT t.doc_id, t.n_fp,
        coalesce(h.n_hit, 0) AS n_hit,
        coalesce(h.n_hit, 0) >= 2 AS is_contaminated
      FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
      ORDER BY t.doc_id"""))

  val qContamination = QueryDef(
    "q_contamination",
    (s, dir) => {
      def grams(df: org.apache.spark.sql.DataFrame) = contamGrams(df)
      val docs = Tables.t(s, dir, "documents")
      val bench = grams(docs.filter(col("source") === "src0"))
        .select("g").distinct()
      val corpus = grams(docs.filter(col("source") =!= "src0"))
      val hits = corpus.join(bench, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_grams"))
            .as("contam_frac"))
        .withColumn("is_contaminated", col("contam_frac") >= 0.1)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
        WHERE len(string_split(text, ' ')) >= $ContamN),
      grams AS (
        SELECT doc_id, source, unnest(list_distinct(
          [CAST('0x' || substr(md5(array_to_string(
             toks[i:i+${ContamN - 1}], ' ')), 1, 15) AS BIGINT)
           for i in generate_series(1, len(toks) - ${ContamN - 1})])) AS g
        FROM toks),
      bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
      corpus AS (SELECT doc_id, g FROM grams WHERE source <> 'src0'),
      hits AS (
        SELECT doc_id, count(*) AS n_hit FROM corpus
        WHERE g IN (SELECT g FROM bench) GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM corpus
              GROUP BY doc_id)
      SELECT t.doc_id, t.n_grams,
        coalesce(h.n_hit, 0) AS n_hit,
        CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_grams AS contam_frac,
        CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_grams >= 0.1
          AS is_contaminated
      FROM tot t LEFT JOIN hits h ON h.doc_id = t.doc_id
      ORDER BY t.doc_id"""))

  /** Token-length histogram (the length-distribution audit that drives
    * packing budgets and truncation policy): 16-token-wide bins with
    * per-bin doc/token counts and corpus share. Two tiny aggregations
    * — per-bin counts, then a windowed total; pure integer arithmetic
    * until the final share division.
    */
  val qLengthHist = QueryDef(
    "q_length_hist",
    (s, dir) => {
      val wAll = Window.partitionBy()
      Tables.t(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .select(expr("n_tokens div 16").as("bin"), col("n_tokens"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
          min("n_tokens").as("min_tokens"), max("n_tokens").as("max_tokens"))
        .select(col("bin"), (col("bin") * 16).as("bin_lo"),
          col("n_docs"), col("total_tokens"), col("min_tokens"),
          col("max_tokens"),
          (col("n_docs").cast("double") / sum(col("n_docs")).over(wAll))
            .as("share"))
        .orderBy("bin")
    },
    Some("""
      WITH t AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      b AS (
        SELECT n_tokens // 16 AS bin, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
        FROM t GROUP BY 1)
      SELECT bin, bin * 16 AS bin_lo, n_docs, total_tokens,
        min_tokens, max_tokens,
        CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE)
          AS share
      FROM b ORDER BY bin"""))

  /** Hashed linear classifier inference — the shape of "apply the
    * quality/safety model to the whole corpus", the single most common
    * scoring pass in a curation pipeline. Features are hashed unigrams
    * and bigrams (the fastText trick: no vocabulary table at all, so
    * no join — weight lookup is pure arithmetic on the feature hash),
    * making the whole pass one NARROW map over the scan: no shuffle,
    * no broadcast, trivially parallel at 100 TB. Weights here are a
    * deterministic stand-in for trained parameters (md5-prefix ints;
    * a real model would embed its array the same way); the emitted
    * score is the raw mean-weight logit — exact integer sums, one
    * final division — because sigmoid/exp is monotone anyway and not
    * bit-identical across engines. Vocab-table models (a learned
    * embedding join) are exercised separately by q_text_surprise.
    */
  val qClassify = QueryDef(
    "q_text_classify",
    (s, dir) => {
      // One md5 per TOKEN (aliased through a projection boundary so
      // the hash array is an attribute, never an expression re-inlined
      // into downstream lambdas); bigram weights combine the two
      // precomputed token hashes instead of hashing the pair string —
      // half the md5 calls and no per-element re-evaluation of the
      // tokenizer. Weight ranges: unigram [-128,128], bigram
      // [-510,510].
      val hs = transform(split(col("text"), " "),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
      val sUni = aggregate(
        transform(col("hs"), h => h % 257 - 128),
        lit(0L), (a, x) => a + x)
      // Spark's sequence(0, n-2) DESCENDS for n=1 (step defaults to
      // sign(stop-start)) — guard the single-token case explicitly
      val bigrams = when(size(col("hs")) >= 2,
        transform(sequence(lit(0), size(col("hs")) - 2), i =>
          (element_at(col("hs"), i + 1) * 31 +
            element_at(col("hs"), i + 2)) % 1021 - 510))
        .otherwise(array().cast("array<bigint>"))
      val sBi = aggregate(bigrams, lit(0L), (a, x) => a + x)
      val nFeat = (size(col("hs")) * 2 - 1).cast("long")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), hs.as("hs"))
        .select(col("doc_id"), (sUni + sBi).as("wsum"), nFeat.as("n_feat"))
        .select(col("doc_id"), col("wsum"), col("n_feat"),
          (col("wsum").cast("double") / col("n_feat")).as("logit"))
        .withColumn("keep", col("logit") > 0)
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          list_transform(string_split(text, ' '), tk ->
            CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT)) AS hs
        FROM documents),
      f AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(hs, h -> h % 257 - 128)),
            (a, x) -> a + x)
          + list_reduce(list_prepend(CAST(0 AS BIGINT),
              [(hs[i+1] * 31 + hs[i+2]) % 1021 - 510
               for i in generate_series(0, len(hs) - 2)]),
              (a, x) -> a + x) AS wsum,
          CAST(2 * len(hs) - 1 AS BIGINT) AS n_feat
        FROM t)
      SELECT doc_id, wsum, n_feat,
        CAST(wsum AS DOUBLE) / n_feat AS logit,
        CAST(wsum AS DOUBLE) / n_feat > 0 AS keep
      FROM f ORDER BY doc_id"""))

  /** Corpus-wide vocabulary induction: top-50 words by occurrence
    * count with corpus share — the first step of tokenizer/BPE
    * training and the canonical "heavy hitters over 100 TB" shape:
    * explode to words, two-phase count on the word key (map-side
    * partial absorbs the skew of frequent words before any shuffle),
    * then a bounded top-k (TakeOrderedAndProject — the driver holds
    * 50 rows, never the vocabulary). Ties break by word for
    * determinism; the share divides two exact integers.
    */
  val qVocabTopK = QueryDef(
    "q_vocab_topk",
    (s, dir) => {
      val counts = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
      val total = counts.groupBy()
        .agg(sum("n").as("total_words"))
      counts.crossJoin(broadcast(total))
        .select(col("word"), col("n"), col("total_words"),
          (col("n").cast("double") / col("total_words")).as("share"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    },
    Some("""
      WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      c AS (
        SELECT word, count(*) AS n FROM w
        WHERE len(word) >= 1 GROUP BY word),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total_words FROM c)
      SELECT word, n, total_words,
        CAST(n AS DOUBLE) / total_words AS share
      FROM c CROSS JOIN t
      ORDER BY n DESC, word LIMIT 50"""))

  /** Vocabulary coverage / OOV rate: each document's share of tokens
    * OUTSIDE the corpus-wide top-64 vocabulary — the
    * tokenizer-coverage signal checked before committing a vocab to
    * training (a high-OOV source wastes context on fragments). The
    * induced vocabulary is deterministic (count-desc, word-asc ties).
    *
    * Scale shape: one heavy-hitter aggregation for the basis (64
    * rows, broadcast back), then a narrow per-token membership probe
    * and a per-doc count aggregation — no corpus-wide shuffle except
    * the basis agg; the final rate is an exact integer ratio.
    */
  val qVocabCoverage = QueryDef(
    "q_vocab_coverage",
    (s, dir) => {
      val words = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
      val basis = words.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(64)
        .select(col("word"), lit(1L).as("in_vocab"))
      words.join(broadcast(basis), Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_toks"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_toks")).as("oov_rate"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
      ww AS (SELECT doc_id, word FROM w WHERE len(word) >= 1),
      basis AS (
        SELECT word FROM (
          SELECT word, count(*) AS n FROM ww GROUP BY word
          ORDER BY n DESC, word LIMIT 64)),
      marked AS (
        SELECT ww.doc_id,
          CASE WHEN b.word IS NULL THEN 1 ELSE 0 END AS oov
        FROM ww LEFT JOIN basis b ON ww.word = b.word)
      SELECT doc_id, count(*) AS n_toks,
        CAST(sum(oov) AS BIGINT) AS n_oov,
        CAST(sum(oov) AS DOUBLE) / count(*) AS oov_rate
      FROM marked GROUP BY doc_id ORDER BY doc_id"""))

  /** Pairwise source term-frequency drift: L1 distance between the
    * sources' normalized frequencies over the corpus-wide top-32
    * vocabulary — the distribution-shift monitor for mixture design
    * (a source whose term profile drifts from the rest needs
    * re-weighting or investigation; complements q_source_overlap's
    * set-level Jaccard with a frequency-level signal).
    *
    * The distance runs over the FULL basis (sources × basis
    * scaffold, absent terms contribute |0 − f|), so disjoint term
    * profiles score maximal drift instead of disappearing.
    * Determinism: per-(source, term) frequencies are single IEEE
    * divisions of exact counts; the L1 sum runs through the exact
    * decimal accumulator (order-independent), so both engines produce
    * identical distances. Scale shape: one bounded top-k (the basis),
    * per-source counts over it (32 × sources keys), and a pair join
    * on the term key — everything after the token count is
    * vocabulary-sized, not corpus-sized.
    */
  val qSourceDrift = QueryDef(
    "q_source_drift",
    (s, dir) => {
      // r15 (guide §1.2 step 1): ONE corpus explode feeding a
      // (source, word)-keyed count — basis, per-source counts and the
      // source list all derive from that vocabulary-bounded frame
      // instead of three separate corpus passes (basis counts are the
      // exact integer sums of the per-source counts; the source set
      // over words is unchanged; results identical, oracle-verified)
      // NOT eagerly cut (measured r15: the blocking checkpoint job
      // cost more than the re-derived explode+agg subtrees it saves —
      // 1.70 s vs 0.64 s at sf0.1; AQE's runtime stage reuse already
      // dedupes the identical exchanges)
      val wc = Tables.t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("cnt"))
      val basis = broadcast(wc.groupBy("word")
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(32)
        .select("word"))
      val perSrc = wc.join(basis, "word")
      val totals = perSrc.groupBy(col("source"))
        .agg(sum(col("cnt")).as("tot"))
      // scaffold sources × basis so a term ABSENT from one source
      // still contributes its full |0 − f| to the L1 — an inner join
      // on observed terms would undercount exactly the most-drifted
      // pairs (and emit nothing at all for disjoint profiles)
      val scaffold = wc.select("source").distinct().crossJoin(basis)
      val freq = scaffold
        .join(perSrc, Seq("source", "word"), "left_outer")
        .join(broadcast(totals), "source")
        .select(col("source"), col("word"),
          (coalesce(col("cnt"), lit(0L)).cast("double") / col("tot"))
            .as("f"))
      freq.toDF("sa", "word", "fa")
        .join(freq.toDF("sb", "word2", "fb"),
          col("word") === col("word2") && col("sa") < col("sb"))
        .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
        .agg(Parity.dsum(abs(col("fa") - col("fb"))).as("l1_drift"),
          count(lit(1)).as("n_terms"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""
      WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents),
      ww AS (SELECT source, word FROM w WHERE len(word) >= 1),
      basis AS (
        SELECT word FROM (
          SELECT word, count(*) AS n FROM ww GROUP BY word
          ORDER BY n DESC, word LIMIT 32)),
      ps AS (
        SELECT source, ww.word, count(*) AS cnt
        FROM ww JOIN basis ON ww.word = basis.word
        GROUP BY source, ww.word),
      tt AS (SELECT source, sum(cnt) AS tot FROM ps GROUP BY source),
      scaffold AS (
        SELECT source, word
        FROM (SELECT DISTINCT source FROM ww) CROSS JOIN basis),
      freq AS (
        SELECT sc.source, sc.word,
          CAST(coalesce(ps.cnt, 0) AS DOUBLE) / tt.tot AS f
        FROM scaffold sc
        LEFT JOIN ps ON sc.source = ps.source AND sc.word = ps.word
        JOIN tt ON sc.source = tt.source)
      SELECT a.source AS source_a, b.source AS source_b,
        ${Parity.dsumSql("abs(a.f - b.f)")} AS l1_drift,
        count(*) AS n_terms
      FROM freq a JOIN freq b
        ON a.word = b.word AND a.source < b.source
      GROUP BY 1, 2 ORDER BY source_a, source_b"""))

  /** Lexical-diversity profile per document: type-token ratio, hapax
    * ratio (words seen once), Simpson repeat probability and Gini
    * impurity over the word distribution — the repetition/diversity
    * quality signals (Gopher's "fraction of unique words" family)
    * expressed as EXACT rationals. Shannon entropy is the textbook
    * metric here, but ln()/log2() are not bit-identical across
    * engines (see qTfIdf's note at :291); Simpson/Gini carry the same
    * signal as pure integer sums with one final double division,
    * deterministic everywhere.
    *
    * Scale shape: explode → two hash aggregations keyed by
    * (doc_id, word) then doc_id — both map-side-combining, no joins,
    * no window; linear in corpus size.
    */
  val qDiversity = QueryDef(
    "q_text_diversity",
    (s, dir) => {
      val wc = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
      wc.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_toks"),
          count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
          sum(col("c") * (col("c") - 1)).as("s2"),
          sum(col("c") * col("c")).as("ss"))
        .select(col("doc_id"), col("n_toks"), col("vocab"), col("hapax"),
          (col("vocab").cast("double") / col("n_toks")).as("ttr"),
          (col("hapax").cast("double") / col("vocab")).as("hapax_ratio"),
          when(col("n_toks") >= 2,
            col("s2").cast("double") /
              (col("n_toks") * (col("n_toks") - 1)))
            .as("simpson"),
          (lit(1.0) - col("ss").cast("double") /
            (col("n_toks") * col("n_toks"))).as("gini"))
        .orderBy("doc_id")
    },
    Some("""
      WITH wc AS (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY doc_id, w),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks, count(*) AS vocab,
          CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
          sum(c * (c - 1)) AS s2, sum(c * c) AS ss
        FROM wc GROUP BY doc_id)
      SELECT doc_id, n_toks, vocab, hapax,
        CAST(vocab AS DOUBLE) / n_toks AS ttr,
        CAST(hapax AS DOUBLE) / vocab AS hapax_ratio,
        CASE WHEN n_toks >= 2
          THEN CAST(s2 AS DOUBLE) / (n_toks * (n_toks - 1)) END AS simpson,
        1.0 - CAST(ss AS DOUBLE) / (n_toks * n_toks) AS gini
      FROM agg ORDER BY doc_id"""))

  /** Ensemble quality filter: the per-signal scores combined as a
    * fixed-weight LINEAR model with a keep threshold, reported as a
    * per-source funnel (docs in → docs kept → keep rate → mean score).
    * A logistic head is the textbook form, but exp() is not
    * bit-identical across engines; with a monotone link and a
    * threshold decision the linear score is decision-equivalent and
    * IEEE mul/add/compare are exact everywhere.
    *
    * Scale shape: narrow per-row scoring then one hash aggregation on
    * source — the decision stage of the quality pipeline that a
    * 100 TB curation run executes as its final filter pass.
    *
    * An empty document scores a hard 0.0 (dropped) on BOTH sides: the
    * unguarded punct/chars is 0/0 — NULL in Spark but NaN in DuckDB,
    * where NaN >= threshold counts as kept AND the decimal
    * accumulator refuses NaN outright.
    */
  val qQualityEnsemble = QueryDef(
    "q_quality_ensemble",
    (s, dir) => {
      val score = when(cChars === 0.0, lit(0.0)).otherwise(
        lit(0.3) * least(cToks / lit(100.0), lit(1.0)) +
          lit(0.25) * (lit(1.0) - cPunct / cChars) +
          lit(0.25) * least(cStops / cToks * 5.0, lit(1.0)) +
          lit(0.2) * (cVocab / cToks))
      Tables.t(s, dir, "documents")
        .select(col("source"), score.as("score"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0.5, 1L).otherwise(0L)).as("n_kept"),
          Parity.dsum(col("score")).as("sum_score"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          (col("n_kept").cast("double") / col("n_docs")).as("keep_rate"),
          (col("sum_score") / col("n_docs")).as("mean_score"))
        .orderBy("source")
    },
    Some(s"""
      WITH sig AS ($qualityRawSql),
      scored AS (
        SELECT source,
          CASE WHEN chars = 0 THEN 0.0 ELSE
            0.3 * least(toks / 100.0, 1.0) +
            0.25 * (1.0 - punct / chars) +
            0.25 * least(stops / toks * 5.0, 1.0) +
            0.2 * (vocab / toks)
          END AS score
        FROM sig),
      agg AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          ${Parity.dsumSql("score")} AS sum_score
        FROM scored GROUP BY source)
      SELECT source, n_docs, n_kept,
        CAST(n_kept AS DOUBLE) / n_docs AS keep_rate,
        sum_score / n_docs AS mean_score
      FROM agg ORDER BY source"""))

  /** Boilerplate keyphrase mining: stopword-delimited word runs
    * (RAKE's candidate-phrase step — consecutive non-stopwords form
    * a phrase) counted corpus-wide, top-20 repeated multi-word
    * phrases with document spread — the boilerplate/template
    * detector a web-corpus curation pass runs before dedup (nav
    * bars, cookie banners and license blurbs surface here long
    * before full-document near-dup does). Integer-only scoring (no
    * float sums to drift); phrase assembly is gaps-and-islands over
    * word positions with ONE doc-keyed window, then ordered
    * reassembly — array_sort(collect_list(struct(pos, word))) on the
    * Spark side mirroring string_agg(word ORDER BY pos) in DuckDB.
    * Scale shape: one window pass + two hash aggregations; the
    * phrase shuffle carries (phrase, doc) pairs, pruned by len ≥ 2
    * before the exchange.
    */
  val qKeyphrases = QueryDef(
    "q_text_keyphrases",
    (s, dir) => {
      val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it",
        "for", "on")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val words = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(length(col("word")) >= 1)
        .withColumn("is_stop",
          col("word").isin(stops: _*).cast("int"))
      val islands = words
        .withColumn("island",
          sum(col("is_stop")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("is_stop") === 0)
      val phrases = islands
        .groupBy(col("doc_id"), col("island"))
        .agg(count(lit(1)).as("len"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(pos, word)))," +
              " x -> x.word)"), " ").as("phrase"))
        .filter(col("len") >= 2)
      phrases.groupBy("phrase")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("len")).as("n_words"))
        .orderBy(col("n_occurrences").desc, col("phrase"))
        .limit(20)
    },
    Some("""
      WITH words AS (
        SELECT doc_id, i AS pos, w AS word,
          CASE WHEN w IN ('the','a','of','and','to','in','is','it',
            'for','on') THEN 1 ELSE 0 END AS is_stop
        FROM (
          SELECT doc_id,
            unnest(string_split(text, ' ')) AS w,
            generate_subscripts(string_split(text, ' '), 1) - 1 AS i
          FROM documents)
        WHERE len(w) >= 1),
      islands AS (
        SELECT *, sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM words),
      phrases AS (
        SELECT doc_id, island, count(*) AS len,
          string_agg(word, ' ' ORDER BY pos) AS phrase
        FROM islands WHERE is_stop = 0
        GROUP BY doc_id, island
        HAVING count(*) >= 2)
      SELECT phrase, count(*) AS n_occurrences,
        count(DISTINCT doc_id) AS n_docs,
        CAST(min(len) AS BIGINT) AS n_words
      FROM phrases GROUP BY phrase
      ORDER BY n_occurrences DESC, phrase LIMIT 20"""))

  /** Quality-threshold operating curve: for every cut t ∈
    * {0.1 … 0.9}, how many documents and how many tokens survive —
    * the curve a curation run publishes so the "keep the top X% by
    * quality" decision is made from data instead of a guessed
    * threshold (the companion to [[qQualityCalibrate]]'s per-source
    * percentiles and [[qQualityEnsemble]]'s fixed-cut funnel). Same
    * guarded linear ensemble score; thresholds are k/10 computed as
    * the identical double division in both engines, and since both
    * engines score identically, the >= comparisons agree exactly.
    * Scale shape: ONE narrow scoring pass, a ×9 explode of
    * (score, toks) pairs — 16 bytes per row per threshold, not the
    * text — and a 9-key aggregation with map-side partials.
    */
  val qQualityCurve = QueryDef(
    "q_quality_curve",
    (s, dir) => {
      val score = when(cChars === 0.0, lit(0.0)).otherwise(
        lit(0.3) * least(cToks / lit(100.0), lit(1.0)) +
          lit(0.25) * (lit(1.0) - cPunct / cChars) +
          lit(0.25) * least(cStops / cToks * 5.0, lit(1.0)) +
          lit(0.2) * (cVocab / cToks))
      Tables.t(s, dir, "documents")
        .select(score.as("score"), cToks.cast("long").as("toks"))
        .withColumn("k", explode(sequence(lit(1), lit(9))))
        .withColumn("t", col("k").cast("double") / lit(10.0))
        .groupBy("k", "t")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= col("t"), 1L).otherwise(0L))
            .as("n_kept"),
          sum(col("toks")).as("toks_total"),
          sum(when(col("score") >= col("t"), col("toks"))
            .otherwise(0L)).as("toks_kept"))
        .select(col("k"), col("t"),
          col("n_kept"),
          (col("n_kept").cast("double") / col("n_docs"))
            .as("keep_rate"),
          col("toks_kept"),
          (col("toks_kept").cast("double") / col("toks_total"))
            .as("token_share"))
        .orderBy("k")
    },
    Some(s"""
      WITH sig AS ($qualityRawSql),
      scored AS (
        SELECT CASE WHEN chars = 0 THEN 0.0 ELSE
            0.3 * least(toks / 100.0, 1.0) +
            0.25 * (1.0 - punct / chars) +
            0.25 * least(stops / toks * 5.0, 1.0) +
            0.2 * (vocab / toks)
          END AS score,
          CAST(toks AS BIGINT) AS toks
        FROM sig),
      fan AS (
        SELECT score, toks, i AS k, CAST(i AS DOUBLE) / 10.0 AS t
        FROM scored CROSS JOIN (SELECT unnest(range(1, 10)) AS i)),
      agg AS (
        SELECT k, t, count(*) AS n_docs,
          CAST(sum(CASE WHEN score >= t THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept,
          CAST(sum(toks) AS BIGINT) AS toks_total,
          CAST(sum(CASE WHEN score >= t THEN toks ELSE 0 END) AS BIGINT)
            AS toks_kept
        FROM fan GROUP BY k, t)
      SELECT CAST(k AS INT) AS k, t, n_kept,
        CAST(n_kept AS DOUBLE) / n_docs AS keep_rate,
        toks_kept,
        CAST(toks_kept AS DOUBLE) / toks_total AS token_share
      FROM agg ORDER BY k"""))

  /** KMV (k-minimum-values) distinct-count sketch, evaluated against
    * exact counts: per source (and for the whole corpus) keep the
    * k=64 smallest 60-bit word hashes; the k-th smallest estimates
    * the distinct vocabulary as (k−1)·2⁶⁰/h₍ₖ₎ — the mergeable
    * constant-size cardinality sketch a 1000-executor profile pass
    * ships instead of a corpus-wide distinct (union two sketches =
    * merge-and-trim their value lists; HLL trades the same way). The
    * sketch here is bit-deterministic — md5-derived hashes, integer
    * kth — so BOTH engines compute the identical estimate and the
    * identical relative error against the exact count; no tolerance
    * band needed. Sources with < k distinct words report the exact
    * count (the sketch IS the value set there, rel_err 0). Scale
    * shape: one (source, word) distinct — the same shuffle the exact
    * count needs — then a per-source k-smallest window; at real
    * scale the window's sort is bounded by the distinct shuffle that
    * already happened.
    */
  val qVocabKmv = QueryDef(
    "q_vocab_kmv",
    (s, dir) => {
      val K = 64
      val two60 = 1152921504606846976.0 // 2^60, exact in double
      val perSrc = Tables.t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .distinct()
      val dw = perSrc.unionAll(
        perSrc.select(lit("__all__").as("source"), col("word")).distinct())
      val hashed = dw.select(col("source"), col("word"),
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long")
          .as("h"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("word"))
      val sk = hashed.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .groupBy("source")
        .agg(max(col("h")).as("kth_h"), count(lit(1)).as("k_used"))
      val exact = dw.groupBy("source")
        .agg(countDistinct(col("word")).as("n_exact"))
      exact.join(sk, "source")
        .select(col("source"), col("n_exact"), col("k_used"),
          col("kth_h"),
          when(col("k_used") < K, col("k_used").cast("double"))
            .otherwise(lit((K - 1).toDouble) * two60
              / col("kth_h").cast("double")).as("kmv_est"))
        .withColumn("rel_err",
          abs(col("kmv_est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double"))
        .orderBy("source")
    },
    Some("""
      WITH perSrc AS (
        SELECT DISTINCT source, word FROM (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents) WHERE len(word) >= 1),
      dw AS (
        SELECT source, word FROM perSrc
        UNION ALL
        SELECT DISTINCT '__all__' AS source, word FROM perSrc),
      hashed AS (
        SELECT source, word,
          CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
        FROM dw),
      ranked AS (
        SELECT source, h,
          row_number() OVER (PARTITION BY source ORDER BY h, word) AS rn
        FROM hashed),
      sk AS (
        SELECT source, max(h) AS kth_h, count(*) AS k_used
        FROM ranked WHERE rn <= 64 GROUP BY source),
      exact AS (
        SELECT source, count(DISTINCT word) AS n_exact FROM dw
        GROUP BY source)
      SELECT exact.source, n_exact, CAST(k_used AS BIGINT) AS k_used,
        kth_h,
        CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
             ELSE 63.0 * 1152921504606846976.0 / CAST(kth_h AS DOUBLE)
        END AS kmv_est,
        abs((CASE WHEN k_used < 64 THEN CAST(k_used AS DOUBLE)
             ELSE 63.0 * 1152921504606846976.0 / CAST(kth_h AS DOUBLE)
             END) - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
          AS rel_err
      FROM exact JOIN sk ON exact.source = sk.source
      ORDER BY exact.source"""))

  /** HyperLogLog distinct-vocabulary sketch (Flajolet et al. 2007),
    * evaluated against exact counts — the OTHER industry-standard
    * cardinality sketch next to [[qVocabKmv]]'s KMV, and the one with
    * the cheaper merge: a union of two sketches is an elementwise
    * register MAX, so a 1000-executor profile pass ships 64 bytes per
    * (source, column) and the driver folds them associatively.
    *
    * Bit-determinism across engines: the word's 60-bit md5 value
    * splits into a 6-bit register index (top bits) and a 54-bit
    * remainder whose leading-zero rank is computed as
    * `55 - length(bin(rem))` — both engines' `bin()` render integers
    * without leading zeros, so the expression is shared verbatim. The
    * register sum Σ 2^-M_j is scaled by 2^55 into an EXACT BIGINT
    * (max 64·2^55 = 2^61 < 2^63), so the one double division in the
    * estimate is the only float op — identical IEEE result everywhere.
    * The raw estimate is reported log-free (production applies
    * linear counting below 2.5·m, which needs ln() — deliberately
    * omitted because ln is not correctly-rounded-by-spec across
    * engines). NOTE the fixture regime: the synthetic corpus has a
    * ~31-word vocabulary, far inside the linear-counting range, so
    * the raw estimate legitimately over-reads here (rel_err ~1.0 —
    * n_empty is emitted precisely so the regime is auditable);
    * [[graft.ops.TimeSeries.qRollingHll]] exercises the same sketch
    * at real cardinality where rel_err lands on the theoretical
    * 1.04/√64.
    *
    * Scale shape: the same one (source, word) distinct shuffle the
    * exact count needs, then a 64-key-per-source register fold —
    * sketch size is constant in corpus size by construction.
    */
  val qVocabHll = QueryDef(
    "q_vocab_hll",
    (s, dir) => {
      val two54 = 18014398509481984L // 2^54
      val two55 = 36028797018963968L // 2^55
      val perSrc = Tables.t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .distinct()
      val dw = perSrc.unionAll(
        perSrc.select(lit("__all__").as("source"), col("word")).distinct())
      val hashed = dw.select(col("source"),
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long")
          .as("h"))
      val ranked = hashed.select(col("source"),
        expr(s"h div $two54").as("bucket"),
        (col("h") % two54).as("rem"))
        .select(col("source"), col("bucket"),
          when(col("rem") === 0, lit(55L))
            .otherwise(lit(55L) - length(bin(col("rem"))).cast("long"))
            .as("rank"))
      val regs = ranked.groupBy("source", "bucket")
        .agg(max(col("rank")).as("m"))
      val sums = regs.groupBy("source")
        .agg(count(lit(1)).as("n_buckets"),
          sum(expr("CAST(1 AS BIGINT) << (55 - m)")).as("s_present"))
        .select(col("source"), col("n_buckets"),
          (col("s_present") +
            (lit(64L) - col("n_buckets")) * two55).as("s_total"))
      val exact = dw.groupBy("source")
        .agg(countDistinct(col("word")).as("n_exact"))
      exact.join(sums, "source")
        .select(col("source"), col("n_exact"),
          (lit(64L) - col("n_buckets")).as("n_empty"),
          (lit(0.709).cast("double") * lit(4096.0) *
            lit(36028797018963968.0) / col("s_total").cast("double"))
            .as("hll_est"))
        .withColumn("rel_err",
          abs(col("hll_est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double"))
        .orderBy("source")
    },
    Some("""
      WITH perSrc AS (
        SELECT DISTINCT source, word FROM (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents) WHERE len(word) >= 1),
      dw AS (
        SELECT source, word FROM perSrc
        UNION ALL
        SELECT DISTINCT '__all__' AS source, word FROM perSrc),
      hashed AS (
        SELECT source,
          CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
        FROM dw),
      ranked AS (
        SELECT source, h // 18014398509481984 AS bucket,
          CASE WHEN h % 18014398509481984 = 0 THEN 55
               ELSE 55 - length(bin(h % 18014398509481984)) END AS rank
        FROM hashed),
      regs AS (
        SELECT source, bucket, max(rank) AS m
        FROM ranked GROUP BY source, bucket),
      sums AS (
        SELECT source, count(*) AS n_buckets,
          sum(1::BIGINT << (55 - m)) +
            (64 - count(*)) * 36028797018963968 AS s_total
        FROM regs GROUP BY source),
      exact AS (
        SELECT source, count(DISTINCT word) AS n_exact FROM dw
        GROUP BY source)
      SELECT exact.source, n_exact,
        CAST(64 - n_buckets AS BIGINT) AS n_empty,
        CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
          / CAST(s_total AS DOUBLE) AS hll_est,
        abs(CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
          / CAST(s_total AS DOUBLE) - CAST(n_exact AS DOUBLE))
          / CAST(n_exact AS DOUBLE) AS rel_err
      FROM exact JOIN sums ON exact.source = sums.source
      ORDER BY exact.source"""))

  /** [[qVocabHll]] through the NATIVE `graft_hll` aggregate
    * (functions/HllSketch.scala — a TypedImperativeAggregate with a
    * 64-byte register buffer, O(1) update, merge = elementwise max):
    * where the SQL-composed formulation shuffles a distinct + register
    * rows, the native aggregate ships 64 BYTES per (source, partition)
    * through the exchange and — because register max is idempotent —
    * consumes the RAW token stream with no distinct at all. Same hash
    * contract, so the estimate it emits is bit-equal to the composed
    * query's (both check against the same oracle arithmetic); the
    * exact count for rel_err is the only distinct left in the plan.
    * This is the plan you actually run at 100 TB: sketch-aggregate
    * the stream, never materialize per-word rows past the map side.
    */
  val qVocabHllNative = QueryDef(
    "q_vocab_hll_native",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val words = Tables.t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
      val dw = words.unionAll(
        words.select(lit("__all__").as("source"), col("word")))
      val est = dw.groupBy("source")
        .agg(graft.functions.GraftFunctions.hll(col("word"))
          .as("hll_est"))
      val exact = dw.groupBy("source")
        .agg(countDistinct(col("word")).as("n_exact"))
      exact.join(est, "source")
        .select(col("source"), col("n_exact"), col("hll_est"),
          (abs(col("hll_est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double")).as("rel_err"))
        .orderBy("source")
    },
    Some("""
      WITH words AS (
        SELECT source, word FROM (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents) WHERE len(word) >= 1),
      dw AS (
        SELECT source, word FROM words
        UNION ALL
        SELECT '__all__' AS source, word FROM words),
      hashed AS (
        SELECT source,
          CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
        FROM dw),
      regs AS (
        SELECT source, h // 18014398509481984 AS bucket,
          max(CASE WHEN h % 18014398509481984 = 0 THEN 55
              ELSE 55 - length(bin(h % 18014398509481984)) END) AS m
        FROM hashed GROUP BY source, bucket),
      sums AS (
        SELECT source,
          sum(1::BIGINT << (55 - m)) +
            (64 - count(*)) * 36028797018963968 AS s_total
        FROM regs GROUP BY source),
      exact AS (
        SELECT source, count(DISTINCT word) AS n_exact FROM dw
        GROUP BY source)
      SELECT exact.source, n_exact,
        CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
          / CAST(s_total AS DOUBLE) AS hll_est,
        abs(CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
          / CAST(s_total AS DOUBLE) - CAST(n_exact AS DOUBLE))
          / CAST(n_exact AS DOUBLE) AS rel_err
      FROM exact JOIN sums ON exact.source = sums.source
      ORDER BY exact.source"""))

  /** Unicode canonical normalization (NFC) — the text-pipeline step
    * that makes "café" spelled with a combining accent hash equal to
    * its precomposed spelling (without it, exact dedup splits and
    * vocabulary double-counts). The fixture text is ASCII, so each
    * document is suffixed with deterministic DECOMPOSED sequences
    * (e + U+0301, A + U+030A); NFC composes them to é and Å,
    * shrinking the char count by exactly 2 and changing the md5.
    * Runs through [[graft.functions.NfcNormalize]] — a native
    * codegen'd Catalyst expression wrapping the JDK's UAX #15
    * reference implementation (Spark has no normalization builtin;
    * a Scala UDF here would break whole-stage codegen on the hot
    * text path) — against DuckDB's nfc_normalize.
    */
  val qTextNfc = QueryDef(
    "q_text_nfc",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // DECOMPOSED escapes (e+U+0301, A+U+030A, o+U+0308), matching
      // the oracle's chr() construction — a precomposed literal here
      // would make NFC a no-op and the test vacuous
      val dirty = concat(col("text"),
        lit(" cafe\u0301 A\u030angstro\u0308m"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), dirty.as("dirty"))
        .select(col("doc_id"),
          length(col("dirty")).cast("long").as("pre_chars"),
          length(graft.functions.GraftFunctions.nfc(col("dirty")))
            .cast("long").as("post_chars"),
          md5(graft.functions.GraftFunctions.nfc(col("dirty")))
            .as("nfc_sig"),
          (md5(col("dirty")) =!=
            md5(graft.functions.GraftFunctions.nfc(col("dirty"))))
            .as("changed"))
        .orderBy("doc_id")
    },
    Some("""
      WITH dirty AS (
        SELECT doc_id,
          text || ' cafe' || chr(769) || ' A' || chr(778) ||
            'ngstro' || chr(776) || 'm' AS dirty
        FROM documents)
      SELECT doc_id,
        CAST(length(dirty) AS BIGINT) AS pre_chars,
        CAST(length(nfc_normalize(dirty)) AS BIGINT) AS post_chars,
        md5(nfc_normalize(dirty)) AS nfc_sig,
        md5(dirty) <> md5(nfc_normalize(dirty)) AS changed
      FROM dirty ORDER BY doc_id"""))

  /** BM25 top-10 retrieval for a fixed 3-term query. The idf is the
    * rational Robertson form `(N - df + 0.5)/(df + 0.5) + 1` WITHOUT
    * the usual ln(): ln is not bit-identical across engines, and any
    * monotone transform of idf preserves the per-term ranking, which
    * is what the operator is for. tf saturation keeps k1=1.2, b=0.75.
    *
    * Plan shape (the 100 TB story): tokens are filtered to the query
    * terms BEFORE the tf exchange, so the only corpus-wide shuffle
    * carries matching tokens only (postings, not the corpus); df and
    * the corpus stats are one-row/3-row broadcasts; dl joins tf on
    * doc_id (both sides already hash-partitioned by doc_id at any
    * scale). Per-term scores pivot to fixed columns so the final sum
    * has one deterministic evaluation order on both engines.
    */
  /** Per-(doc, term) BM25 term scores for the fixed query terms — the
    * scoring stage shared by q_text_bm25 (per-term pivot) and
    * q_ann_hybrid's lexical leg (per-doc exact-decimal sum): the
    * BM25 math exists ONCE on the Spark side so the two consumers can
    * never drift. k1 = 1.2, b = 0.75.
    */
  private[graft] def bm25TermScores(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val dl = docs.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"))
      val tf = docs
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin("spark", "window", "join"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      val avgdl = col("sum_dl").cast("double") / col("n_docs")
      val idf = (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)
      val tscore = idf * (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      tf.join(broadcast(dfT), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("term"), tscore.as("tscore"))
  }

  val qBm25 = QueryDef(
    "q_text_bm25",
    (s, dir) => {
      bm25TermScores(s, dir)
        .groupBy(col("doc_id"))
        .agg(
          coalesce(max(when(col("term") === "spark", col("tscore"))),
            lit(0.0)).as("s_spark"),
          coalesce(max(when(col("term") === "window", col("tscore"))),
            lit(0.0)).as("s_window"),
          coalesce(max(when(col("term") === "join", col("tscore"))),
            lit(0.0)).as("s_join"))
        .select(col("doc_id"), col("s_spark"), col("s_window"),
          col("s_join"),
          (col("s_spark") + col("s_window") + col("s_join")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
      tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
        WHERE term IN ('spark', 'window', 'join')
        GROUP BY 1, 2),
      dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      stats AS (SELECT count(*) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      scored AS (
        SELECT tf.doc_id, tf.term,
          ((CAST(n_docs AS DOUBLE) - df + 0.5) /
             (CAST(df AS DOUBLE) + 0.5) + 1.0)
            * (CAST(tf AS DOUBLE) * 2.2)
            / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl /
                 (CAST(sum_dl AS DOUBLE) / n_docs))) AS tscore
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats),
      pivoted AS (
        SELECT doc_id,
          coalesce(max(CASE WHEN term = 'spark' THEN tscore END), 0.0)
            AS s_spark,
          coalesce(max(CASE WHEN term = 'window' THEN tscore END), 0.0)
            AS s_window,
          coalesce(max(CASE WHEN term = 'join' THEN tscore END), 0.0)
            AS s_join
        FROM scored GROUP BY doc_id)
      SELECT doc_id, s_spark, s_window, s_join,
        s_spark + s_window + s_join AS score
      FROM pivoted
      ORDER BY score DESC, doc_id LIMIT 10"""))

  /** Top-20 collocations by pointwise mutual information over adjacent
    * word pairs (min pair count 5). Rational PMI — the ratio
    * p(xy)/(p(x)p(y)) without ln(), a monotone transform — written as
    * one fixed left-associative expression so both engines evaluate
    * the identical IEEE sequence. Plan: unigram and bigram counts are
    * two map-side-combined aggregations; the pair↔unigram lookups are
    * plain equi-joins on the word key (NOT broadcast — at 100 TB the
    * vocabulary is itself large; AQE may still elect broadcast when
    * the filtered pair set is small).
    */
  val qPmi = QueryDef(
    "q_text_pmi",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
        .select(split(col("text"), " ").as("toks"))
      val uni = docs.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val nUni = uni.agg(sum(col("c")).as("n_uni"))
      val pairs = docs.filter(size(col("toks")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val bi = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c_xy"))
      val nBi = pairs.agg(count(lit(1)).as("n_bi"))
      val score = col("c_xy").cast("double") * col("n_uni") / col("c_x") *
        col("n_uni") / col("c_y") / col("n_bi")
      bi.filter(col("c_xy") >= 5)
        .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
        .crossJoin(broadcast(nUni))
        .crossJoin(broadcast(nBi))
        .select(col("w1"), col("w2"), col("c_xy"), score.as("pmi_ratio"))
        .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
        .limit(20)
    },
    Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS toks FROM documents),
      uni AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(toks) AS w FROM toks) GROUP BY 1),
      n_uni AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
      pairs AS (
        SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2
        FROM (SELECT unnest([toks[i] || ' ' || toks[i + 1]
                             for i in generate_series(1, len(toks) - 1)])
                AS g
              FROM toks WHERE len(toks) >= 2)),
      bi AS (SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY 1, 2),
      n_bi AS (SELECT count(*) AS n_bi FROM pairs)
      SELECT w1, w2, c_xy,
        CAST(c_xy AS DOUBLE) * n_uni / c_x * n_uni / c_y / n_bi
          AS pmi_ratio
      FROM bi
      JOIN (SELECT w AS w1, c AS c_x FROM uni) USING (w1)
      JOIN (SELECT w AS w2, c AS c_y FROM uni) USING (w2)
      CROSS JOIN n_uni CROSS JOIN n_bi
      WHERE c_xy >= 5
      ORDER BY pmi_ratio DESC, w1, w2 LIMIT 20"""))

  /** Count-Min-Sketch term-frequency estimation (3 rows × 1024
    * buckets, md5-derived) with its overestimate audited against the
    * exact counts for five probe words. The sketch build is the
    * 100 TB shape: the corpus token stream aggregates into ≤ 3·1024
    * cells with map-side combine (the shuffle carries cells, not
    * tokens), probes are a broadcast 15-row lookup, and CMS's
    * one-sided error (est ≥ exact, always) is visible in the
    * `over_by` column. The three row-buckets are disjoint
    * 10-hex-char (40-bit) slices of ONE md5(word) digest — one hash
    * per DISTINCT word (the token stream pre-aggregates to word
    * counts first), not three per token; the ×3 row fan-out happens
    * on the word dictionary after aggregation, never on the corpus.
    * Bit-identical in both engines.
    */
  val qSketchCms = QueryDef(
    "q_sketch_cms",
    (s, dir) => {
      import s.implicits._
      val B = 1024L
      val probes = Seq("spark", "window", "join", "data", "the")
      def bucket(digest: org.apache.spark.sql.Column,
          r: org.apache.spark.sql.Column) =
        conv(digest.substr(lit(1) + lit(10) * r, lit(10)), 16, 10)
          .cast("long") % B
      val toks = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val wc = toks.groupBy("word").agg(count(lit(1)).as("c"))
        .withColumn("d", md5(col("word")))
      val cells = wc
        .withColumn("r", explode(array(lit(0), lit(1), lit(2))))
        .select(col("r"), bucket(col("d"), col("r")).as("bucket"),
          col("c"))
        .groupBy("r", "bucket").agg(sum("c").as("c"))
      val pr = probes.toDF("word")
        .withColumn("r", explode(array(lit(0), lit(1), lit(2))))
        .select(col("word"), col("r"),
          bucket(md5(col("word")), col("r")).as("bucket"))
      val est = pr.join(cells, Seq("r", "bucket"))
        .groupBy("word").agg(min("c").as("cms_est"))
      val exact = toks.filter(col("word").isin(probes: _*))
        .groupBy("word").agg(count(lit(1)).as("n_exact"))
      est.join(exact, Seq("word"), "left")
        .select(col("word"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          col("cms_est"),
          (col("cms_est") - coalesce(col("n_exact"), lit(0L)))
            .as("over_by"))
        .orderBy("word")
    },
    Some("""
      WITH tf AS (
        SELECT word FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM documents)
        WHERE len(word) > 0),
      wc AS (
        SELECT word, count(*) AS c, md5(word) AS d
        FROM tf GROUP BY 1),
      cells AS (
        SELECT r,
          CAST('0x' || substr(d, CAST(1 + 10 * r AS BIGINT), 10)
            AS BIGINT) % 1024 AS bucket,
          CAST(sum(c) AS BIGINT) AS c
        FROM wc CROSS JOIN (SELECT unnest(range(0, 3)) AS r)
        GROUP BY 1, 2),
      probes AS (SELECT unnest(
        ['spark', 'window', 'join', 'data', 'the']) AS word),
      pr AS (
        SELECT word, r,
          CAST('0x' || substr(md5(word), CAST(1 + 10 * r AS BIGINT), 10)
            AS BIGINT) % 1024 AS bucket
        FROM probes CROSS JOIN (SELECT unnest(range(0, 3)) AS r)),
      est AS (
        SELECT word, CAST(min(c) AS BIGINT) AS cms_est
        FROM pr JOIN cells USING (r, bucket) GROUP BY 1),
      exact AS (
        SELECT word, count(*) AS n_exact FROM tf
        WHERE word IN ('spark', 'window', 'join', 'data', 'the')
        GROUP BY 1)
      SELECT est.word, COALESCE(n_exact, 0) AS n_exact, cms_est,
        cms_est - COALESCE(n_exact, 0) AS over_by
      FROM est LEFT JOIN exact ON est.word = exact.word
      ORDER BY est.word"""))

  /** Language-ID evaluation: the confusion matrix of the n-gram
    * classifier's predictions against the labeled lang column, with
    * per-cell recall share — the quality report run before trusting a
    * cheap classifier to route a 100 TB corpus. Reuses q_text_langid's
    * exact scoring; one narrow map + a ≤30-cell aggregation, the
    * recall share one int/int division.
    */
  val qLangIdConfusion = QueryDef(
    "q_langid_confusion",
    (s, dir) => {
      def hits(re: String) =
        size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
      val en = hits("\\b(the|and|of|is|it)\\b")
      val de = hits("\\b(der|die|das|und|ist)\\b")
      val es = hits("\\b(el|los|las|es|una)\\b")
      val fr = hits("\\b(le|les|est|une|dans)\\b")
      val zh = hits("[\\x{4e00}-\\x{9fff}]")
      val best = greatest(en, de, es, fr, zh)
      val scored = Tables.t(s, dir, "documents")
        .select(col("lang").as("lang_meta"),
          when(best === 0, "und")
            .when(best === zh, "zh").when(best === en, "en")
            .when(best === de, "de").when(best === es, "es")
            .otherwise("fr").as("lang_pred"))
      val conf = scored.groupBy("lang_meta", "lang_pred")
        .agg(count(lit(1)).as("n"))
      conf
        .withColumn("row_tot", sum("n").over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang_meta")))
        .select(col("lang_meta"), col("lang_pred"), col("n"),
          (col("n").cast("double") / col("row_tot").cast("double"))
            .as("recall_share"))
        .orderBy("lang_meta", "lang_pred")
    },
    Some("""
      WITH lscored AS (
        SELECT lang AS lang_meta,
          CASE WHEN best = 0 THEN 'und'
               WHEN best = zh_hits THEN 'zh'
               WHEN best = en_hits THEN 'en'
               WHEN best = de_hits THEN 'de'
               WHEN best = es_hits THEN 'es'
               ELSE 'fr' END AS lang_pred
        FROM (
          SELECT *, greatest(en_hits, de_hits, es_hits, fr_hits,
              zh_hits) AS best
          FROM (
            SELECT lang,
              CAST(len(regexp_extract_all(text,
                '\b(the|and|of|is|it)\b')) AS BIGINT) AS en_hits,
              CAST(len(regexp_extract_all(text,
                '\b(der|die|das|und|ist)\b')) AS BIGINT) AS de_hits,
              CAST(len(regexp_extract_all(text,
                '\b(el|los|las|es|una)\b')) AS BIGINT) AS es_hits,
              CAST(len(regexp_extract_all(text,
                '\b(le|les|est|une|dans)\b')) AS BIGINT) AS fr_hits,
              CAST(len(regexp_extract_all(text,
                '[\x{4e00}-\x{9fff}]')) AS BIGINT) AS zh_hits
            FROM documents))),
      conf AS (
        SELECT lang_meta, lang_pred, count(*) AS n
        FROM lscored GROUP BY 1, 2)
      SELECT lang_meta, lang_pred, n,
        CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER (
          PARTITION BY lang_meta) AS BIGINT) AS DOUBLE) AS recall_share
      FROM conf ORDER BY lang_meta, lang_pred"""))

  /** Rare-word-density quality signal: every vocabulary word gets a
    * corpus frequency rank (dense_rank by count desc — rank 1 = the
    * most common word), and each document scores the mean rank of
    * its token stream. High mean rank = rare-word-dense documents
    * (jargon, tails, noise) — the cheap lexical-rarity signal a
    * curation pass uses next to stopword ratios. Exact cross-engine:
    * ranks are integers from a totally ordered window, the per-doc
    * sum is BIGINT, and the mean is one final IEEE division.
    *
    * Scale shape: the rank window sorts the VOCABULARY dictionary
    * (post-aggregation, orders of magnitude smaller than the corpus),
    * never the token stream; the stream itself only hash-joins to the
    * ranked dictionary and aggregates per doc with map-side combine.
    */
  val qRarity = QueryDef(
    "q_text_rarity",
    (s, dir) => {
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val ranked = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .withColumn("rnk", dense_rank().over(
          Window.orderBy(col("c").desc, col("w"))))
        .select("w", "rnk")
      toks.join(ranked, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(col("rnk")).cast("long").as("sum_rank"))
        .select(col("doc_id"), col("n_toks"), col("sum_rank"),
          (col("sum_rank").cast("double") / col("n_toks"))
            .as("mean_rank"))
        .orderBy(col("mean_rank").desc, col("doc_id"))
        .limit(20)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        WHERE len(w) > 0),
      ranked AS (
        SELECT w, dense_rank() OVER (ORDER BY count(*) DESC, w) AS rnk
        FROM toks GROUP BY w),
      agg AS (
        SELECT doc_id, count(*) AS n_toks,
          CAST(sum(rnk) AS BIGINT) AS sum_rank
        FROM toks JOIN ranked USING (w)
        GROUP BY 1)
      SELECT doc_id, n_toks, sum_rank,
        CAST(sum_rank AS DOUBLE) / n_toks AS mean_rank
      FROM agg ORDER BY mean_rank DESC, doc_id LIMIT 20"""))

  /** Zipf audit over the top-20 vocabulary: under Zipf's law the
    * product count·rank is roughly constant, so `zipf_mass = c·r`
    * and its ratio to the top word's count make power-law deviation
    * visible without a single logarithm (log() is not bit-portable
    * across engines; the integer product and ONE final division
    * are). The corpus-health check a tokenizer-training pass runs
    * before trusting its frequency table. Rank is a row_number over
    * the totally ordered dictionary; everything before the final
    * division is exact integer arithmetic.
    */
  val qVocabZipf = QueryDef(
    "q_vocab_zipf",
    (s, dir) => {
      val wc = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c"))
      val top = wc.withColumn("rnk", row_number().over(
          Window.orderBy(col("c").desc, col("w"))))
        .filter(col("rnk") <= 20)
      top.crossJoin(broadcast(wc.agg(max("c").as("c1"))))
        .select(col("rnk"), col("w"), col("c"),
          (col("c") * col("rnk")).as("zipf_mass"),
          ((col("c") * col("rnk")).cast("double") /
            col("c1").cast("double")).as("mass_ratio"))
        .orderBy("rnk")
    },
    Some("""
      WITH wc AS (
        SELECT w, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      top AS (
        SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rnk
        FROM wc QUALIFY rnk <= 20),
      c1 AS (SELECT max(c) AS c1 FROM wc)
      SELECT rnk, w, c, c * rnk AS zipf_mass,
        CAST(c * rnk AS DOUBLE) / CAST(c1 AS DOUBLE) AS mass_ratio
      FROM top CROSS JOIN c1
      ORDER BY rnk"""))

  /** PII detection counts per source: emails, IPv4s, phone-shaped
    * and long-digit-run (card/ID-shaped) matches, plus how many
    * documents carry any — the scrub-audit a training pipeline runs
    * before release. The patterns live in [[Pii]] and the SAME
    * pattern strings are interpolated into both engines, restricted
    * to the regex subset Java and RE2 interpret identically
    * (character classes, bounded repetition, \b). This corpus is
    * synthetic word-salad, so every count is legitimately zero here;
    * PiiSpec proves detection and redaction positively on fixture
    * strings through the same published patterns.
    */
  val qPii = QueryDef(
    "q_text_pii",
    (s, dir) => {
      def cnt(p: String) =
        size(regexp_extract_all(col("text"), lit(p), lit(0)))
      val per = Tables.t(s, dir, "documents")
        .select(col("source"),
          cnt(Pii.Email).as("e"), cnt(Pii.Ipv4).as("i"),
          cnt(Pii.Phone).as("p"), cnt(Pii.LongDigits).as("d"))
      per.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("e").cast("long").as("emails"),
          sum("i").cast("long").as("ipv4s"),
          sum("p").cast("long").as("phones"),
          sum("d").cast("long").as("long_ids"),
          sum(when(col("e") + col("i") + col("p") + col("d") > 0, 1L)
            .otherwise(0L)).cast("long").as("docs_with_pii"))
        .orderBy("source")
    },
    Some(s"""
      WITH per AS (
        SELECT source,
          len(regexp_extract_all(text, '${Pii.Email}')) AS e,
          len(regexp_extract_all(text, '${Pii.Ipv4}')) AS i,
          len(regexp_extract_all(text, '${Pii.Phone}')) AS p,
          len(regexp_extract_all(text, '${Pii.LongDigits}')) AS d
        FROM documents)
      SELECT source, count(*) AS n_docs,
        CAST(sum(e) AS BIGINT) AS emails,
        CAST(sum(i) AS BIGINT) AS ipv4s,
        CAST(sum(p) AS BIGINT) AS phones,
        CAST(sum(d) AS BIGINT) AS long_ids,
        CAST(sum(CASE WHEN e + i + p + d > 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS docs_with_pii
      FROM per GROUP BY source ORDER BY source"""))

  /** KMV sketch SET OPERATIONS: estimate the vocabulary Jaccard of
    * every source pair from per-source k=64 minimum-hash sketches —
    * union two sketches = merge-and-trim to the 64 smallest, and the
    * Jaccard estimate is the fraction of the union sketch present in
    * both — then audit against the exact distinct-word Jaccard. This
    * is the profile pass a 1000-executor run ships instead of
    * pairwise distinct-set intersections: constant-size mergeable
    * state per source, pairs compared sketch-to-sketch. md5-derived
    * 60-bit hashes and integer ranks make the estimate — and its
    * error column — bit-identical in both engines. At fixture vocab
    * (< k distinct words) the sketch IS the word set and est ==
    * exact; at real scale the estimator's error becomes visible in
    * abs_err while staying deterministic.
    */
  val qVocabKmvJaccard = QueryDef(
    "q_vocab_kmv_jaccard",
    (s, dir) => {
      val wh = Tables.t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("source"), col("w"),
          conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long")
            .as("h"))
        .distinct()
      val sk = wh
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy("h")))
        .filter(col("rk") <= 64)
        .select(col("source"), col("h"))
      // explicit Cross of the ~|sources| dim with itself, filtered to
      // ordered pairs — the bounded-broadcast shape, not a degraded
      // equi-join
      val srcs = wh.select("source").distinct()
      val pairs = srcs.select(col("source").as("s1"))
        .crossJoin(srcs.select(col("source").as("s2")))
        .filter(col("s1") < col("s2"))
      val sides = pairs
        .join(sk.withColumnRenamed("source", "s1"), Seq("s1"))
        .select(col("s1"), col("s2"), col("h"), lit(1L).as("ina"),
          lit(0L).as("inb"))
        .unionAll(pairs
          .join(sk.withColumnRenamed("source", "s2"), Seq("s2"))
          .select(col("s1"), col("s2"), col("h"), lit(0L).as("ina"),
            lit(1L).as("inb")))
      val unionSk = sides.groupBy("s1", "s2", "h")
        .agg(max("ina").as("ina"), max("inb").as("inb"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("s1", "s2").orderBy("h")))
        .filter(col("rk") <= 64)
      val est = unionSk.groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_union_sk"),
          sum(col("ina") * col("inb")).cast("long").as("n_both"))
        .select(col("s1"), col("s2"),
          (col("n_both").cast("double") / col("n_union_sk"))
            .as("est_jaccard"))
      val sizes = wh.groupBy("source").agg(count(lit(1)).as("nv"))
      val inter = wh.select(col("source").as("s1"), col("w"))
        .join(wh.select(col("source").as("s2"), col("w")), Seq("w"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("n_ab"))
      val exact = inter
        .join(broadcast(sizes.select(col("source").as("s1"),
          col("nv").as("na"))), Seq("s1"))
        .join(broadcast(sizes.select(col("source").as("s2"),
          col("nv").as("nb"))), Seq("s2"))
        .select(col("s1"), col("s2"),
          (col("n_ab").cast("double") /
            (col("na") + col("nb") - col("n_ab"))).as("exact_jaccard"))
      est.join(exact, Seq("s1", "s2"))
        .select(col("s1"), col("s2"), col("est_jaccard"),
          col("exact_jaccard"),
          abs(col("est_jaccard") - col("exact_jaccard")).as("abs_err"))
        .orderBy(col("est_jaccard").desc, col("s1"), col("s2"))
        .limit(20)
    },
    Some("""
      WITH wh AS (
        SELECT DISTINCT source, w,
          CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE len(w) > 0),
      sk AS (
        SELECT source, h FROM (
          SELECT source, h, row_number() OVER (
            PARTITION BY source ORDER BY h) AS rk
          FROM wh) WHERE rk <= 64),
      srcs AS (SELECT DISTINCT source FROM wh),
      prs AS (
        SELECT a.source AS s1, b.source AS s2
        FROM srcs a JOIN srcs b ON a.source < b.source),
      sides AS (
        SELECT s1, s2, h, 1 AS ina, 0 AS inb
        FROM prs JOIN sk ON sk.source = prs.s1
        UNION ALL
        SELECT s1, s2, h, 0, 1
        FROM prs JOIN sk ON sk.source = prs.s2),
      u AS (
        SELECT s1, s2, h, max(ina) AS ina, max(inb) AS inb
        FROM sides GROUP BY 1, 2, 3),
      usk AS (
        SELECT * FROM (
          SELECT s1, s2, ina, inb, row_number() OVER (
            PARTITION BY s1, s2 ORDER BY h) AS rk
          FROM u) WHERE rk <= 64),
      est AS (
        SELECT s1, s2,
          CAST(CAST(sum(ina * inb) AS BIGINT) AS DOUBLE) / count(*)
            AS est_jaccard
        FROM usk GROUP BY 1, 2),
      sizes AS (SELECT source, count(*) AS nv FROM wh GROUP BY 1),
      inter AS (
        SELECT a.source AS s1, b.source AS s2, count(*) AS n_ab
        FROM wh a JOIN wh b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2),
      ex AS (
        SELECT s1, s2,
          CAST(n_ab AS DOUBLE) / (na.nv + nb.nv - n_ab)
            AS exact_jaccard
        FROM inter
        JOIN sizes na ON na.source = s1
        JOIN sizes nb ON nb.source = s2)
      SELECT est.s1, est.s2, est_jaccard, exact_jaccard,
        abs(est_jaccard - exact_jaccard) AS abs_err
      FROM est JOIN ex ON est.s1 = ex.s1 AND est.s2 = ex.s2
      ORDER BY est_jaccard DESC, est.s1, est.s2 LIMIT 20"""))

  /** Vocabulary growth curve (the Heaps'-law audit): distinct words
    * and cumulative tokens at 10 corpus checkpoints, in doc_id order
    * — a sublinear curve is healthy natural text, a near-linear one
    * means unbounded novel tokens (OCR noise, serial numbers, PII) and
    * a flat one means template spam. No running distinct anywhere:
    * cumulative vocabulary at a cutoff is the count of words whose
    * FIRST-occurrence doc is ≤ the cutoff — one min() per word, then
    * 10 broadcast cutoffs — the only way the statistic scales (a
    * running distinct over a 100 TB corpus would be a sorted global
    * window).
    */
  val qVocabGrowth = QueryDef(
    "q_vocab_growth",
    (s, dir) => {
      val n = Tables.rowCount(s, dir, "documents")
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val firstDoc = toks.groupBy(col("w"))
        .agg(min(col("doc_id")).as("first_doc"))
      val docToks = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"))
      val cuts = (1 to 10).map(k => (k.toLong, n * k / 10 - 1))
      val cutDf = s.createDataFrame(cuts).toDF("decile", "cut")
      cutDf
        .join(firstDoc, col("first_doc") <= col("cut"), "left")
        .groupBy(col("decile"), col("cut"))
        .agg(count(col("first_doc")).as("vocab"))
        .join(
          cutDf.join(docToks, col("doc_id") <= col("cut"), "left")
            .groupBy(col("decile"))
            .agg(coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
            .select(col("decile").as("d2"), col("n_tokens")),
          col("decile") === col("d2"))
        .select(col("decile"), col("cut"), col("n_tokens"), col("vocab"))
        .orderBy("decile")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n FROM documents),
      cuts AS (
        SELECT CAST(k AS BIGINT) AS decile,
          CAST((SELECT n FROM n) * k // 10 - 1 AS BIGINT) AS cut
        FROM (SELECT unnest(generate_series(1, 10)) AS k)),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      first_doc AS (
        SELECT w, min(doc_id) AS first_doc FROM toks GROUP BY w),
      doc_toks AS (
        SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
      vg AS (
        SELECT decile, cut, count(first_doc) AS vocab
        FROM cuts LEFT JOIN first_doc ON first_doc <= cut
        GROUP BY decile, cut),
      tg AS (
        SELECT decile,
          CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens
        FROM cuts LEFT JOIN doc_toks ON doc_id <= cut
        GROUP BY decile)
      SELECT vg.decile, cut, n_tokens, vocab
      FROM vg JOIN tg ON vg.decile = tg.decile
      ORDER BY vg.decile"""))

  val all: Seq[QueryDef] =
    Seq(qTokens, qQuality, qQualityCalibrate, qGopherRules, qLangId,
      qFingerprint, qReadability, qTfIdf, qRepetition, qClean, qSurprise,
      qWinnow,
      qWinnowOverlap, qWinnowSpans, qWinnowContam, qContamination,
      qLengthHist,
      qClassify, qVocabTopK, qSourceDrift, qDiversity, qQualityEnsemble,
      qQualityCurve, qKeyphrases,
      qVocabCoverage, qVocabKmv, qVocabHll, qVocabHllNative, qTextNfc, qBm25, qPmi,
      qLangIdConfusion, qSketchCms, qRarity, qVocabZipf, qPii,
      qVocabKmvJaccard, qVocabGrowth)
}

/** PII patterns + redaction, shared between q_text_pii's oracle-
  * checked counts and the positive-detection spec. Patterns stay in
  * the regex subset Java (Spark) and RE2 (DuckDB) interpret
  * identically: character classes, bounded repetition, alternation,
  * \b word boundaries — no lookaround, no backreferences.
  */
object Pii {
  val Email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4 = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""
  val Phone = """\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"""
  val LongDigits = """\b[0-9]{13,16}\b"""
  val All: Seq[(String, String)] = Seq(
    "email" -> Email, "ipv4" -> Ipv4, "phone" -> Phone,
    "long_digits" -> LongDigits)

  /** Replace every PII match with a class tag — the scrub transform
    * itself (order matters: the more specific patterns run first so
    * an IPv4 inside a URL-ish token isn't half-eaten by LongDigits).
    */
  def redact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    All.foldLeft(c) { case (acc, (name, p)) =>
      regexp_replace(acc, p, s"[$name]")
    }
}
