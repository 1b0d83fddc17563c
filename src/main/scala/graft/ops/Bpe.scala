package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich-style): learn the top
  * byte-pair merges over the corpus vocabulary — the first stage of
  * training a tokenizer on a 100 TB corpus.
  *
  * Scale shape: classic BPE trains on the WORD-FREQUENCY DICTIONARY,
  * not the raw corpus — one corpus-proportional word count collapses
  * 100 TB of text to a vocabulary-bounded symbol table (Σ|distinct
  * word| rows), and every subsequent round is windows/aggregations
  * over that bounded table, partitioned by word. The per-round argmax
  * pair is a 1-row broadcast, so rounds never collect to the driver.
  *
  * Exact greedy semantics, cross-engine: merges apply left-to-right
  * and never reuse a consumed symbol. Overlapping matches only arise
  * when the pair is a doubled symbol (a = b); those resolve by the
  * gaps-and-islands parity rule — within each maximal run of
  * consecutive matches, apply at even offsets — which reproduces the
  * sequential greedy scan exactly and is pure integer window
  * arithmetic, identical in Spark and DuckDB. Tie-break for the
  * argmax pair is (count DESC, a, b) — total, so LIMIT 1 is
  * deterministic on both engines.
  */
object BpeOps {

  private val Rounds = 3

  /** One BPE round over the symbol table (word, n, pos, sym):
    * returns (next symbol table, the 1-row winning merge).
    */
  private def step(s: DataFrame): (DataFrame, DataFrame) = {
    val w = Window.partitionBy("word").orderBy("pos")
    val m = s.withColumn("nxt", lead("sym", 1).over(w))
    val top = m.filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("a"), col("nxt").as("b"))
      .agg(sum("n").as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1)
    val mm = m.crossJoin(broadcast(top))
      .withColumn("mtch",
        (col("sym") === col("a") && col("nxt") === col("b")).cast("int"))
    // gaps-and-islands: offset within each run of consecutive matches
    val off = mm
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy("word", "mtch").orderBy("pos")))
      .withColumn("off", row_number().over(
        Window.partitionBy("word", "mtch", "grp").orderBy("pos")) - 1)
      .withColumn("applied", col("mtch") === 1 && col("off") % 2 === 0)
    val next = off
      .withColumn("consumed",
        coalesce(lag("applied", 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .select(col("word"), col("n"),
        row_number().over(w).as("pos"),
        when(col("applied"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
    (next, top)
  }

  private def stepSql(i: Int, prev: String): String = s"""
      m$i AS (SELECT word, n, pos, sym,
          lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM $prev),
      top$i AS (
        SELECT sym AS a, nxt AS b, CAST(sum(n) AS BIGINT) AS cnt
        FROM m$i WHERE nxt IS NOT NULL
        GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
      mm$i AS (
        SELECT word, n, pos, sym, nxt,
          CASE WHEN sym = a AND nxt = b THEN 1 ELSE 0 END AS mtch
        FROM m$i CROSS JOIN top$i),
      off$i AS (
        SELECT *, row_number() OVER (PARTITION BY word, mtch, grp
            ORDER BY pos) - 1 AS off
        FROM (SELECT *, pos - row_number() OVER (
                PARTITION BY word, mtch ORDER BY pos) AS grp
              FROM mm$i)),
      s$i AS (
        SELECT word, n,
          row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
          CASE WHEN applied THEN sym || nxt ELSE sym END AS sym
        FROM (SELECT *, coalesce(lag(applied) OVER (
                PARTITION BY word ORDER BY pos), false) AS consumed
              FROM (SELECT *, (mtch = 1 AND off % 2 = 0) AS applied
                    FROM off$i))
        WHERE NOT consumed)"""

  val qBpeMerges = QueryDef(
    "q_bpe_merges",
    (s, dir) => {
      val words = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("n"))
      val s0 = words
        .withColumn("pos",
          explode(sequence(lit(1), length(col("word")))))
        .selectExpr("word", "n", "pos", "substr(word, pos, 1) AS sym")
      val (s1, t1) = step(s0)
      val (s2, t2) = step(s1)
      val (_, t3) = step(s2)
      t1.selectExpr("1 AS step_no", "a", "b", "cnt")
        .unionAll(t2.selectExpr("2 AS step_no", "a", "b", "cnt"))
        .unionAll(t3.selectExpr("3 AS step_no", "a", "b", "cnt"))
        .orderBy("step_no")
    },
    Some(s"""
      WITH w0 AS (
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM documents)
        WHERE len(word) > 0 GROUP BY 1),
      sx0 AS (
        SELECT word, n, unnest(range(1, len(word) + 1)) AS pos
        FROM w0),
      s0 AS (
        SELECT word, n, pos, substr(word, pos, 1) AS sym FROM sx0),
      ${stepSql(1, "s0")},
      ${stepSql(2, "s1")},
      ${stepSql(3, "s2")}
      SELECT 1 AS step_no, a, b, cnt FROM top1
      UNION ALL SELECT 2 AS step_no, a, b, cnt FROM top2
      UNION ALL SELECT 3 AS step_no, a, b, cnt FROM top3
      ORDER BY step_no"""))

  /** Apply the learned merges: tokenize the corpus with the trained
    * BPE by DICTIONARY JOIN — the per-word segmented length comes from
    * the post-merge symbol table (vocabulary-bounded), and the corpus
    * is touched exactly once, as an exploded word stream hash-joined
    * to that dictionary. This is how a 100 TB corpus actually gets
    * tokenized: train on the vocab, apply by lookup, never re-run the
    * merge machinery per document. Output: per-source whitespace-word
    * count, BPE token count, character count, and chars-per-token
    * (one int/int division).
    */
  val qBpeEncode = QueryDef(
    "q_bpe_encode",
    (s, dir) => {
      val words = Tables.t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("n"))
      val s0 = words
        .withColumn("pos",
          explode(sequence(lit(1), length(col("word")))))
        .selectExpr("word", "n", "pos", "substr(word, pos, 1) AS sym")
      val (s1, _) = step(s0)
      val (s2, _) = step(s1)
      val (s3, _) = step(s2)
      val wlen = s3.groupBy("word").agg(count(lit(1)).as("bpe_tok"))
      Tables.t(s, dir, "documents")
        .select(col("source"),
          explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .join(wlen, "word")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum("bpe_tok").as("bpe_tokens"),
          sum(length(col("word")).cast("long")).as("n_chars"))
        .selectExpr("source", "n_words", "bpe_tokens", "n_chars",
          "CAST(n_chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE)" +
            " AS chars_per_tok")
        .orderBy("source")
    },
    Some(s"""
      WITH w0 AS (
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM documents)
        WHERE len(word) > 0 GROUP BY 1),
      sx0 AS (
        SELECT word, n, unnest(range(1, len(word) + 1)) AS pos
        FROM w0),
      s0 AS (
        SELECT word, n, pos, substr(word, pos, 1) AS sym FROM sx0),
      ${stepSql(1, "s0")},
      ${stepSql(2, "s1")},
      ${stepSql(3, "s2")},
      wlen AS (SELECT word, count(*) AS bpe_tok FROM s3 GROUP BY 1),
      dw AS (
        SELECT source, word FROM (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents)
        WHERE len(word) > 0)
      SELECT source, count(*) AS n_words,
        CAST(sum(bpe_tok) AS BIGINT) AS bpe_tokens,
        CAST(sum(len(word)) AS BIGINT) AS n_chars,
        CAST(sum(len(word)) AS DOUBLE) / CAST(sum(bpe_tok) AS DOUBLE)
          AS chars_per_tok
      FROM dw JOIN wlen USING (word)
      GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(qBpeMerges, qBpeEncode)
}
