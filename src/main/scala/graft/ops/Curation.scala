package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators over `documents`: sequence packing
  * (assembling training context windows from documents under a token
  * budget) and deterministic stratified sampling (mixture weighting by
  * language). Both are the last-mile stages of a training-data
  * pipeline, downstream of dedup/quality filtering.
  *
  * Cross-engine determinism: packing is pure integer arithmetic over a
  * window frame with a total order; sampling draws its uniform from an
  * md5-prefix integer over 2^32 (exact in a double), identical in both
  * engines.
  */
object Curation {

  /** Context-window token budget for packing. */
  private val PackBudget = 512L

  /** Shard counts are DERIVED from the corpus row count, not fixed:
    * one shard per ~TargetRowsPerShard docs, floor MinShards — so a
    * (stratum, shard) partition's sort stays bounded as the corpus
    * grows, with nothing to retune. Pure integer arithmetic mirrored
    * exactly by the oracle (a float ceil could disagree at exact
    * multiples). At the fixture SFs this reproduces the previously
    * fixed 8; at 1e9 docs it yields 10k-way packing parallelism.
    */
  private[graft] val MinShards = 8L
  private[graft] val TargetRowsPerShard = 100000L
  private[graft] def shardsFor(n: Long): Long =
    math.max(MinShards, (n + TargetRowsPerShard - 1) / TargetRowsPerShard)
  private def shardsSubquery: String =
    s"""(SELECT greatest($MinShards,
        (count(*) + ${TargetRowsPerShard - 1}) // $TargetRowsPerShard)
        FROM documents)"""

  /** Deterministic md5-derived shard, identical in both engines:
    * hex chars 17-24 of md5(doc_id) — 32 bits, so the modulus stays
    * meaningful up to ~4B derived shards (2 chars would silently cap
    * the effective shard count at 256) — mod the derived count.
    */
  private def shardCol(n: Long): org.apache.spark.sql.Column =
    conv(substring(md5(col("doc_id").cast("string")), 17, 8), 16, 10)
      .cast("long") % shardsFor(n)
  private def shardSql: String =
    s"""CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8)
        AS BIGINT) % $shardsSubquery"""

  /** Sequence packing: assign each document to a training context
    * window ("bin") of PackBudget tokens, packing greedily in doc_id
    * order within each (lang, shard) partition — bin = the window its
    * cumulative start offset falls in, so bins may overflow by at
    * most one document (the standard streaming-packer behavior; no
    * doc splitting here).
    *
    * Scale shape: packing is inherently sequential *within* a
    * partition but embarrassingly parallel *across* partitions, so
    * the partition key must grow with the corpus — lang alone caps
    * parallelism at the stratum count (5 sort tasks forever); the
    * deterministic md5 shard multiplies it by the row-count-derived
    * shard count (shardsFor), which grows with the corpus on its own
    * — nothing to retune, and never the algorithm.
    */
  val qPackSequences = QueryDef(
    "q_pack_sequences",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("seq_tokens"))
        .withColumn("shard", shardCol(Tables.rowCount(s, dir, "documents")))
      val binned = toks
        .withColumn("cum", sum(col("seq_tokens")).over(w))
        .withColumn("bin",
          expr(s"(cum - seq_tokens) div $PackBudget"))
      val stats = binned.groupBy(col("lang"), col("shard"), col("bin"))
        .agg(count(lit(1)).as("bin_docs"),
          sum(col("seq_tokens")).as("bin_tokens"))
      binned.join(stats, Seq("lang", "shard", "bin"))
        .select(col("doc_id"), col("lang"), col("shard"),
          col("seq_tokens"), col("bin"),
          col("bin_docs"), col("bin_tokens"),
          (col("bin_tokens").cast("double") / PackBudget).as("fill"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS seq_tokens,
          $shardSql AS shard
        FROM documents),
      binned AS (
        -- DuckDB widens window sum(BIGINT) to HUGEINT and -/// keep it;
        -- the driver's hash is type-sensitive, so cast back to BIGINT
        -- to match Spark's LongType.
        SELECT doc_id, lang, shard, seq_tokens,
          CAST((sum(seq_tokens) OVER (PARTITION BY lang, shard
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - seq_tokens) // $PackBudget AS BIGINT) AS bin
        FROM toks),
      stats AS (
        SELECT lang, shard, bin, count(*) AS bin_docs,
          sum(seq_tokens) AS bin_tokens
        FROM binned GROUP BY lang, shard, bin)
      SELECT b.doc_id, b.lang, b.shard, b.seq_tokens, b.bin,
        s.bin_docs, CAST(s.bin_tokens AS BIGINT) AS bin_tokens,
        CAST(s.bin_tokens AS DOUBLE) / $PackBudget AS fill
      FROM binned b JOIN stats s
        ON s.lang = b.lang AND s.shard = b.shard AND s.bin = b.bin
      ORDER BY b.doc_id"""))

  // Mixture weights per language stratum (a typical "up-sample the
  // high-resource language, down-sample the rest" recipe).
  private val rates: Seq[(String, Double)] =
    Seq("en" -> 0.5, "de" -> 0.3, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.1)

  /** Deterministic stratified sampling: keep a document iff its
    * md5-derived uniform u ∈ [0,1) falls under its language's mixture
    * rate. Hash-based (not rand()) so the sample is reproducible
    * across runs, engines, and cluster sizes — the property a
    * training-data pipeline needs for auditability. Narrow per-row
    * transform; scales linearly.
    */
  val qSampleStratified = QueryDef(
    "q_sample_stratified",
    (s, dir) => {
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long").cast("double") / 4294967296.0).as("u")
      val rate = rates.tail.foldLeft(
        when(col("lang") === rates.head._1, rates.head._2)) {
        case (acc, (l, r)) => acc.when(col("lang") === l, r)
      }.otherwise(0.0)
      // per-language audit counts via two-phase agg + broadcast join
      // back — a count(*) WINDOW over 5 language keys would funnel
      // every kept row through 5 tasks at 100 TB
      val kept = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), u, rate.as("rate"))
        .filter(col("u") < col("rate"))
      val counts = kept.groupBy("lang")
        .agg(count(lit(1)).as("kept_in_lang"))
      kept.join(broadcast(counts), "lang")
        .select("doc_id", "lang", "u", "rate", "kept_in_lang")
        .orderBy("doc_id")
    },
    Some {
      // CAST: DuckDB types a CASE over decimal literals as DECIMAL,
      // Spark's `when` chain yields DOUBLE — same values, different
      // driver-visible type
      val rateSql = rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
        .mkString("CAST(CASE ", " ", " ELSE 0.0 END AS DOUBLE)")
      s"""
      WITH scored AS (
        SELECT doc_id, lang,
          CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) AS DOUBLE) / 4294967296.0 AS u,
          $rateSql AS rate
        FROM documents)
      SELECT doc_id, lang, u, rate,
        count(*) OVER (PARTITION BY lang) AS kept_in_lang
      FROM scored WHERE u < rate ORDER BY doc_id"""
    })

  /** Reservoir size per stratum for q_sample_reservoir. */
  private val ReservoirK = 20

  /** Deterministic reservoir sampling: exactly K docs per language,
    * chosen as the K smallest md5-derived keys — the fixed-size
    * counterpart of the rate-based sampler (eval sets, human-review
    * batches). Hash ranking makes the "random" choice reproducible
    * and engine-independent; one shuffle on the stratum key, and the
    * per-stratum top-K is a bounded heap regardless of corpus size
    * (TakeOrderedAndProject semantics under the window).
    */
  val qSampleReservoir = QueryDef(
    "q_sample_reservoir",
    (s, dir) => {
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long").as("hkey")
      // Two-phase top-K: a single window per stratum means one sort
      // task per language — 5 tasks at any corpus size. Phase 1 takes
      // the per-(lang, shard) top-K in parallel (global top-K is a
      // subset of the union of shard top-Ks), phase 2 re-ranks only
      // the ≤ K×shards survivors. Output is IDENTICAL to the
      // single-phase ranking (the oracle keeps the simple form);
      // sharding reuses the packer's derived shardCol.
      val scored = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), u)
        .withColumn("shard", shardCol(Tables.rowCount(s, dir, "documents")))
      val wLocal = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(col("hkey"), col("doc_id"))
      val wFinal = Window.partitionBy(col("lang"))
        .orderBy(col("hkey"), col("doc_id"))
      scored
        .withColumn("lrn", row_number().over(wLocal))
        .filter(col("lrn") <= ReservoirK)
        .withColumn("rn", row_number().over(wFinal).cast("long"))
        .filter(col("rn") <= ReservoirK)
        .select("doc_id", "lang", "hkey", "rn")
        .orderBy("lang", "rn")
    },
    Some(s"""
      SELECT doc_id, lang, hkey, rn FROM (
        SELECT doc_id, lang,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) AS hkey,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
              1, 15) AS BIGINT), doc_id) AS BIGINT) AS rn
        FROM documents)
      WHERE rn <= $ReservoirK ORDER BY lang, rn"""))

  /** Numerator/denominator of the corpus share each source may keep
    * in the domain-mixed output: budget = 7/10 of the corpus, split
    * uniformly across sources. Integer arithmetic so the per-source
    * cap is identical in both engines.
    */
  private val MixBudgetNum = 7L
  private val MixBudgetDen = 10L

  /** Domain-mix rebalancing: downsample each source so the output
    * approaches a target mixture (uniform here; any per-source weight
    * table slots into the same shape). The per-source keep-rate is
    * cap/n_source where cap = budget/n_sources, and the keep decision
    * reuses the md5-derived uniform — so the mix is reproducible
    * across runs, engines, and cluster sizes, and composable with the
    * stratified sampler (independent hash bytes: this draws from hex
    * chars 9-16, the language sampler from 1-8).
    *
    * Scale shape: two global aggregates over (source) — tiny,
    * broadcast back — then a narrow per-row filter; no per-doc
    * shuffle at all.
    */
  val qDomainMix = QueryDef(
    "q_domain_mix",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      val perSource = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_source"))
      val totals = perSource.agg(
        sum(col("n_source")).as("n_total"),
        count(lit(1)).as("n_sources"))
      val u = (conv(substring(md5(col("doc_id").cast("string")), 9, 8),
        16, 10).cast("long").cast("double") / 4294967296.0).as("u")
      docs.select(col("doc_id"), col("source"), col("lang"), u)
        .join(broadcast(perSource), "source")
        .crossJoin(broadcast(totals))
        .withColumn("cap", expr(
          s"n_total * $MixBudgetNum div ($MixBudgetDen * n_sources)"))
        .withColumn("keep_rate",
          least(lit(1.0), col("cap").cast("double") / col("n_source")))
        .filter(col("u") < col("keep_rate"))
        .select("doc_id", "source", "lang", "u", "keep_rate")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH per_source AS (
        SELECT source, count(*) AS n_source FROM documents GROUP BY 1),
      totals AS (
        SELECT CAST(sum(n_source) AS BIGINT) AS n_total,
          count(*) AS n_sources
        FROM per_source),
      scored AS (
        SELECT d.doc_id, d.source, d.lang,
          CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 9, 8)
               AS BIGINT) AS DOUBLE) / 4294967296.0 AS u,
          least(1.0, CAST(t.n_total * $MixBudgetNum //
              ($MixBudgetDen * t.n_sources) AS DOUBLE) / p.n_source)
            AS keep_rate
        FROM documents d
        JOIN per_source p ON p.source = d.source
        CROSS JOIN totals t)
      SELECT doc_id, source, lang, u, keep_rate
      FROM scored WHERE u < keep_rate ORDER BY doc_id"""))

  /** Temperature-based source re-weighting (multinomial sampling at
    * T = 2, i.e. p_s ∝ √n_s): the canonical recipe for flattening a
    * skewed source distribution without fully uniforming it.
    * Per-source keep rate = min(1, frac·N·√n_s / (S·n_s)) with
    * S = Σ√n_s, so expected kept ≈ frac·N distributed ∝ √n_s. sqrt is
    * IEEE-correctly-rounded in both engines — which is exactly why T
    * is fixed at 2 rather than parameterized through pow()/exp()
    * (neither is bit-identical across engines); S is an ordered fold
    * over sources sorted by name; the per-doc keep decision reuses
    * the salted md5 uniform. Scale: two tiny aggregations broadcast
    * back over one narrow scan — no corpus-wide shuffle.
    */
  val qTemperatureMix = QueryDef(
    "q_temperature_mix",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      val perSource = docs.groupBy("source")
        .agg(count(lit(1)).as("n_source"))
      val totals = perSource.groupBy()
        .agg(sum("n_source").cast("double").as("n_total"),
          aggregate(
            sort_array(collect_list(struct(col("source"),
              sqrt(col("n_source").cast("double")).as("sq")))),
            lit(0.0), (a, x) => a + x.getField("sq")).as("s_sqrt"))
      val u = (conv(substring(md5(concat(lit("mix:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0).as("u")
      docs.select(col("doc_id"), col("source"), u)
        .join(broadcast(perSource), "source")
        .crossJoin(broadcast(totals))
        .withColumn("keep_rate",
          least(lit(1.0),
            (lit(0.5) * col("n_total") *
              sqrt(col("n_source").cast("double"))) /
              (col("s_sqrt") * col("n_source").cast("double"))))
        .filter(col("u") < col("keep_rate"))
        .select("doc_id", "source", "u", "keep_rate")
        .orderBy("doc_id")
    },
    Some("""
      WITH ps AS (
        SELECT source, count(*) AS n_source FROM documents
        GROUP BY source),
      t AS (
        SELECT CAST(sum(n_source) AS DOUBLE) AS n_total,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list(sqrt(CAST(n_source AS DOUBLE)) ORDER BY source)),
            (a, x) -> a + x) AS s_sqrt
        FROM ps),
      scored AS (
        SELECT d.doc_id, d.source,
          CAST(CAST('0x' ||
            substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) AS DOUBLE) / 4294967296.0 AS u,
          least(1.0, (0.5 * t.n_total * sqrt(CAST(p.n_source AS DOUBLE)))
            / (t.s_sqrt * CAST(p.n_source AS DOUBLE))) AS keep_rate
        FROM documents d JOIN ps p USING (source) CROSS JOIN t)
      SELECT doc_id, source, u, keep_rate
      FROM scored WHERE u < keep_rate ORDER BY doc_id"""))

  /** Mid-training annealing schedule: the per-source mixture weights
    * for a 3-phase data curriculum that starts at the corpus's
    * NATURAL source distribution (phase 0), ends fully
    * QUALITY-WEIGHTED (phase 2 — the "anneal on high-quality data"
    * endgame every modern pretraining run uses), and bridges through
    * the geometric mean of the two (phase 1). Each phase's raw
    * weights are renormalized so the schedule always sums to 1; the
    * ppm quota column is what a sampler downstream consumes.
    *
    * Quality mass is deliberately cheap and exact: a source's q is
    * the mean of min(n_chars, 1000)/1000 over its docs — a bounded,
    * already-materialized column, no text scan. Cross-engine: shares
    * are IEEE divisions of exact counts; phase 1 is ONE sqrt of a
    * product (sqrt is correctly rounded, pow(x, 0.5) is not, which is
    * why the geometric mean is spelled sqrt(p·g)); every sum over
    * sources is an exact decimal sum. Scale: two aggregations over
    * the corpus (per-source count+mean), then arithmetic over
    * |sources| rows — the corpus is scanned once, everything after is
    * broadcast-sized.
    */
  val qMixAnneal = QueryDef(
    "q_mix_anneal",
    (s, dir) => {
      val per = Tables.t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"),
          Parity.davg(least(col("n_chars"), lit(1000)).cast("double") /
            lit(1000.0)).as("q_s"))
      val totals = per.groupBy()
        .agg(sum("n_s").cast("double").as("n_tot"),
          Parity.dsum(col("q_s") * col("n_s").cast("double"))
            .as("q_tot"))
      val shares = per.crossJoin(broadcast(totals))
        .select(col("source"), col("n_s"),
          (col("n_s").cast("double") / col("n_tot")).as("p"),
          (col("q_s") * col("n_s").cast("double") / col("q_tot"))
            .as("g"))
      val raw = shares
        .select(col("source"), col("n_s"), col("p"), col("g"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("phase"))
        .select(col("phase"), col("source"), col("n_s"),
          when(col("phase") === 0, col("p"))
            .when(col("phase") === 1, sqrt(col("p") * col("g")))
            .otherwise(col("g")).as("w_raw"))
      val z = raw.groupBy("phase").agg(Parity.dsum(col("w_raw")).as("z"))
      raw.join(broadcast(z), "phase")
        .select(col("phase"), col("source"), col("n_s").as("n_docs"),
          (col("w_raw") / col("z")).as("w"),
          floor(col("w_raw") / col("z") * 1000000.0).cast("long")
            .as("quota_ppm"))
        .orderBy("phase", "source")
    },
    Some(s"""
      WITH per AS (
        SELECT source, count(*) AS n_s,
          ${Parity.dsumSql(
            "least(n_chars, 1000) / CAST(1000.0 AS DOUBLE)")} /
            count(*) AS q_s
        FROM documents GROUP BY source),
      t AS (
        SELECT CAST(sum(n_s) AS DOUBLE) AS n_tot,
          ${Parity.dsumSql("q_s * CAST(n_s AS DOUBLE)")} AS q_tot
        FROM per),
      shares AS (
        SELECT source, n_s,
          CAST(n_s AS DOUBLE) / n_tot AS p,
          q_s * CAST(n_s AS DOUBLE) / q_tot AS g
        FROM per CROSS JOIN t),
      raw AS (
        SELECT phase, source, n_s,
          CASE WHEN phase = 0 THEN p
               WHEN phase = 1 THEN sqrt(p * g)
               ELSE g END AS w_raw
        FROM shares
        CROSS JOIN (SELECT CAST(unnest(range(0, 3)) AS BIGINT)
                      AS phase)),
      z AS (SELECT phase, ${Parity.dsumSql("w_raw")} AS z
            FROM raw GROUP BY phase)
      SELECT raw.phase, source, n_s AS n_docs,
        w_raw / z AS w,
        CAST(floor(w_raw / z * 1000000.0) AS BIGINT) AS quota_ppm
      FROM raw JOIN z ON raw.phase = z.phase
      ORDER BY raw.phase, source"""))

  /** Deterministic train/val/test assignment (90/5/5): membership is
    * a pure function of the salted doc_id hash, so it is decidable
    * per row with no global state, stable under re-scrapes,
    * repartitioning, and cluster resizing, and identical in every
    * engine — the property that keeps eval contamination structurally
    * impossible (a doc can never migrate between splits). The salt
    * decorrelates the split from the sampler's keep decision (same
    * hash would couple them: every 'val' doc would also be the first
    * kept by sampling). Narrow map; the per-split audit counts go
    * through a two-phase aggregation and broadcast back (a window
    * over the 3 split keys would funnel the corpus into 3 tasks).
    */
  val qSplitTrain = QueryDef(
    "q_split_train",
    (s, dir) => {
      val u = (conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0).as("u")
      val tagged = Tables.t(s, dir, "documents")
        .select(col("doc_id"), u)
        .withColumn("split",
          when(col("u") < 0.9, "train")
            .when(col("u") < 0.95, "val").otherwise("test"))
      val counts = tagged.groupBy("split")
        .agg(count(lit(1)).as("n_split"))
      tagged.join(broadcast(counts), "split")
        .select("doc_id", "u", "split", "n_split")
        .orderBy("doc_id")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id,
          CAST(CAST('0x' ||
            substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM documents),
      tagged AS (
        SELECT doc_id, u,
          CASE WHEN u < 0.9 THEN 'train'
               WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
        FROM scored)
      SELECT doc_id, u, split,
        count(*) OVER (PARTITION BY split) AS n_split
      FROM tagged ORDER BY doc_id"""))

  /** End-to-end corpus curation: the operators above composed into
    * the actual training-data flow — redact PII, score quality and
    * repetition, run the hashed classifier, filter, drop
    * non-canonical near-dup cluster members, pack the survivors into
    * context windows. Returns the curated doc-level frame (one row
    * per kept doc with its bin assignment).
    *
    * Composition note: each stage is the SAME DataFrame pipeline as
    * its standalone oracle-checked query, joined on doc_id, so
    * correctness is inherited; this function exists to prove the
    * stages compose without collecting anything to the driver — the
    * output is still a lazy plan a caller can write wherever.
    */
  def curate(s: org.apache.spark.sql.SparkSession, dir: String,
      minQuality: Double = 0.05, maxTop2Share: Double = 0.2,
      minLogit: Double = Double.NegativeInfinity)
      : org.apache.spark.sql.DataFrame = {
    val quality = TextOps.qQuality.run(s, dir)
      .select("doc_id", "quality")
    val rep = TextOps.qRepetition.run(s, dir)
      .select("doc_id", "top2_share")
    val canon = Dedup.qClusters.run(s, dir)
      .select("doc_id", "cluster", "is_canonical")
    val clean = TextOps.qClean.run(s, dir)
      .select("doc_id", "clean_sig", "n_emails", "n_phones")
    val model = TextOps.qClassify.run(s, dir)
      .select("doc_id", "logit")
    // NULL top2_share means "too short to have 2-grams", i.e. no
    // repetition signal — keep, don't let SQL NULL semantics silently
    // drop the doc from the filter
    val kept = quality.join(rep, "doc_id").join(canon, "doc_id")
      .join(clean, "doc_id").join(model, "doc_id")
      .filter(col("quality") >= minQuality &&
        coalesce(col("top2_share"), lit(0.0)) <= maxTop2Share &&
        col("logit") >= minLogit &&
        col("is_canonical"))
    // re-pack only the survivors (same packer shape as the oracle
    // query, applied post-filter)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val toks = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("seq_tokens"))
      .withColumn("shard", shardCol(Tables.rowCount(s, dir, "documents")))
    kept.join(toks, "doc_id")
      .withColumn("cum", sum(col("seq_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - seq_tokens) div $PackBudget"))
      .select("doc_id", "lang", "shard", "cluster", "quality",
        "top2_share", "logit", "clean_sig", "seq_tokens", "bin")
  }

  /** Token budget per source for q_token_budget. */
  private val TokenBudget = 800L

  /** Per-source token-budget subsampling: a mixture recipe usually
    * caps each source at a token budget, not a document count. Docs
    * are ranked inside their source by an md5-derived key (a
    * reproducible "random" order — same docs survive on any engine or
    * cluster size), the token counts are prefix-summed in that order,
    * and the prefix that fits the budget is kept.
    *
    * Scale shape: one running-sum window per source — a sort per
    * source partition, ~10s of sources, each sort distributed over
    * its hash range. At extreme per-source row counts the same cut
    * can be computed as a two-phase hkey-quantile (sample the token
    * CDF, cut at the budget quantile, refine the boundary shard);
    * the windowed form is the exact-semantics reference.
    */
  val qTokenBudget = QueryDef(
    "q_token_budget",
    (s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("hkey"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long").as("hkey"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= TokenBudget)
        .select("doc_id", "source", "n_tok", "cum_tok")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) AS hkey
        FROM documents),
      cum AS (
        SELECT doc_id, source, n_tok,
          CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY hkey, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tok
        FROM scored)
      SELECT doc_id, source, n_tok, cum_tok FROM cum
      WHERE cum_tok <= $TokenBudget ORDER BY doc_id"""))


  /** Deterministic corpus shuffle: the last step before training —
    * assign every doc a pseudo-random shard and a position within it,
    * both md5-derived, so the training order is fully reproducible
    * (and re-derivable for any doc) yet uncorrelated with ingest
    * order, source, or length. One row_number window per shard;
    * shards are uniform by construction so no partition skews.
    */
  val qCorpusShuffle = QueryDef(
    "q_corpus_shuffle",
    (s, dir) => {
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("hkey"), col("doc_id"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long").as("hkey"))
        .withColumn("shard", pmod(col("hkey"),
          lit(shardsFor(Tables.rowCount(s, dir, "documents")))))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) AS hkey
        FROM documents),
      sharded AS (
        SELECT doc_id, hkey, hkey % $shardsSubquery AS shard FROM scored)
      SELECT doc_id, shard,
        CAST(row_number() OVER (PARTITION BY shard
          ORDER BY hkey, doc_id) AS BIGINT) AS pos
      FROM sharded ORDER BY shard, pos"""))

  /** Fractional-epoch up-sampling: materialize the training copies of
    * each document for a per-source epoch count that need not be an
    * integer (the "web ×1.2, curated ×3.4" mixing step of LLM data
    * recipes). Every doc gets floor(epochs) copies, plus one more iff
    * its own hash-uniform falls under the fractional part — so the
    * realized per-source volume converges to n × epochs while the
    * copy decision stays per-doc deterministic (reproducible across
    * engines, runs, and cluster sizes). Per-source epochs here derive
    * from a salted source-name hash ∈ [0.25, 3.0); a real weight table
    * joins into the same shape.
    *
    * Scale shape: a narrow per-row map (the source-epoch "table" is a
    * scalar expression; a real one broadcasts), an explode bounded by
    * ⌈epochs⌉ ≤ 3 copies, and shard-partitioned windows for the
    * training order — the same (hkey % shards) layout as
    * q_corpus_shuffle, so no global sort and no skew.
    */
  val qEpochMix = QueryDef(
    "q_epoch_mix",
    (s, dir) => {
      val uSrc = (conv(substring(md5(concat(lit("epoch:"), col("source"))),
        1, 8), 16, 10).cast("double") / 4294967296.0)
      val uDoc = (conv(substring(md5(concat(lit("epoch:"),
        col("doc_id").cast("string"))), 17, 8), 16, 10).cast("double") /
        4294967296.0)
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("hkey"), col("doc_id"), col("copy"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (lit(0.25) + lit(2.75) * uSrc).as("epochs"), uDoc.as("u"))
        .withColumn("copies",
          (floor(col("epochs")) +
            when(col("u") < col("epochs") - floor(col("epochs")), 1L)
              .otherwise(0L)).cast("long"))
        .filter(col("copies") >= 1)
        .select(col("doc_id"), col("source"), col("copies"),
          explode(sequence(lit(1L), col("copies"))).as("copy"))
        .withColumn("hkey",
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("copy").cast("string"))), 1, 15), 16, 10)
            .cast("long"))
        .withColumn("shard", pmod(col("hkey"),
          lit(shardsFor(Tables.rowCount(s, dir, "documents")))))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("doc_id", "source", "copies", "copy", "shard", "pos")
        .orderBy("shard", "pos")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
          0.25 + 2.75 * (CAST('0x' || substr(md5('epoch:' || source), 1, 8)
            AS BIGINT) / 4294967296.0) AS epochs,
          CAST('0x' || substr(md5('epoch:' || CAST(doc_id AS VARCHAR)),
            17, 8) AS BIGINT) / 4294967296.0 AS u
        FROM documents),
      c AS (
        SELECT doc_id, source,
          CAST(floor(epochs) +
            (CASE WHEN u < epochs - floor(epochs) THEN 1 ELSE 0 END)
            AS BIGINT) AS copies
        FROM scored),
      exp0 AS (
        SELECT doc_id, source, copies,
          unnest(generate_series(1, copies)) AS copy
        FROM c WHERE copies >= 1),
      expanded AS (
        SELECT doc_id, source, copies, CAST(copy AS BIGINT) AS copy,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
            CAST(copy AS VARCHAR)), 1, 15) AS BIGINT) AS hkey
        FROM exp0),
      sharded AS (
        SELECT *, hkey % $shardsSubquery AS shard FROM expanded)
      SELECT doc_id, source, copies, copy, shard,
        CAST(row_number() OVER (PARTITION BY shard
          ORDER BY hkey, doc_id, copy) AS BIGINT) AS pos
      FROM sharded ORDER BY shard, pos"""))

  /** Target sample count for weighted (PPS) sampling. */
  private val PpsTarget = 100L

  /** Order-aligned shard width for the distributed prefix sum: the
    * TOP bits of the 60-bit hkey, so ordering by (shard, hkey) equals
    * ordering by hkey and per-shard running sums can be stitched with
    * per-shard offsets.
    */
  private val PpsShardShift = 56

  /** Weighted (probability-proportional-to-size) systematic sampling:
    * docs are laid out on a token axis in a reproducible md5-shuffled
    * order, and every `step = total_tokens div target`-th token
    * boundary picks the doc it lands in — so a doc's selection chance
    * is proportional to its token count, the standard recipe for
    * sampling a mixture audit set that reflects TRAINING tokens, not
    * document counts. `hits` is the PPS multiplicity (a doc longer
    * than `step` spans several boundaries). All arithmetic is int64
    * (exact cross-engine); no RNG — the same docs survive on any
    * engine or cluster size.
    *
    * Scale shape: the global prefix sum is two-phase — a running-sum
    * window per hkey-range shard plus a ≤2^4-row shard-offset
    * dimension stitched back by broadcast join — so no single
    * partition ever sees the whole corpus (the oracle's single
    * window is the exact-semantics reference).
    */
  val qSampleWeighted = QueryDef(
    "q_sample_weighted",
    (s, dir) => {
      val base = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long").as("hkey"))
        .withColumn("shard", expr(s"hkey div ${1L << PpsShardShift}"))
      val localW = Window.partitionBy(col("shard"))
        .orderBy(col("hkey"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // per-shard totals → exclusive running offsets (≤16 rows, so
      // the unpartitioned window is a constant-size frame) + the
      // global step, one tiny dimension broadcast back to the facts
      val shardTotals = base.groupBy(col("shard"))
        .agg(sum(col("n_tok")).as("shard_tok"))
      val offW = Window.orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = shardTotals
        .withColumn("offset",
          coalesce(sum(col("shard_tok")).over(offW), lit(0L)))
        .withColumn("step",
          greatest(lit(1L),
            expr(s"(sum(shard_tok) over ()) div $PpsTarget")))
        .select("shard", "offset", "step")
      base
        .withColumn("local_cum", sum(col("n_tok")).over(localW))
        .join(broadcast(offsets), "shard")
        .withColumn("cum_tok", col("offset") + col("local_cum"))
        .withColumn("hits",
          expr("cum_tok div step - (cum_tok - n_tok) div step"))
        .filter(col("hits") > 0)
        .select("doc_id", "source", "n_tok", "cum_tok", "hits")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) AS hkey
        FROM documents),
      cum AS (
        SELECT doc_id, source, n_tok,
          sum(n_tok) OVER (ORDER BY hkey, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM scored),
      par AS (
        SELECT greatest(1, sum(n_tok) // $PpsTarget) AS step FROM scored)
      SELECT doc_id, source, n_tok,
        CAST(cum_tok AS BIGINT) AS cum_tok,
        CAST(cum_tok // step - (cum_tok - n_tok) // step AS BIGINT)
          AS hits
      FROM cum, par
      WHERE cum_tok // step > (cum_tok - n_tok) // step
      ORDER BY doc_id"""))

  /** Sliding-window chunk size / stride (tokens). Overlap =
    * ChunkW − ChunkS tokens carried between consecutive chunks — the
    * standard context-window chunking for long-document training
    * (and for retrieval indexing).
    */
  private val ChunkW = 48L
  private val ChunkS = 32L

  /** Sliding-window document chunking: each document becomes
    * ⌈(n−W)/S⌉+1 chunks of ≤W tokens starting every S tokens (one
    * chunk when n≤W), each carrying a deterministic 60-bit md5
    * content hash — the unit-of-training-example transform that
    * follows curation in a 100 TB pipeline, upstream of packing.
    *
    * Scale shape: per-row explode of an integer sequence + narrow
    * projections — no join, no shuffle except the presentation sort;
    * output rows ≈ input tokens / S, linear in corpus size. The
    * chunk-index arithmetic is pure integers, identical in both
    * engines; the trailing chunk is the natural short one (slice
    * clamps at n), never a duplicate of the previous window.
    */
  val qChunkSliding = QueryDef(
    "q_chunk_sliding",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val n = size(col("toks")).cast("long")
      // Column `/` is double division; the operands are positive so
      // the truncating long cast is the integer ceil-div intended
      val lastK = when(n <= ChunkW, lit(0L))
        .otherwise(((n - ChunkW + ChunkS - 1L) / ChunkS).cast("long"))
      val start = (col("k") * ChunkS + 1L).cast("int")
      val len = least(lit(ChunkW), n - col("k") * ChunkS).cast("int")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0L), lastK)).as("k"))
        .select(col("doc_id"), col("k").as("chunk_idx"),
          start.cast("long").as("start_tok"),
          len.cast("long").as("chunk_toks"),
          conv(substring(md5(concat_ws(" ",
            slice(col("toks"), start, len))), 1, 15), 16, 10)
            .cast("long").as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents),
      ks AS (
        SELECT doc_id, toks, n,
          unnest(generate_series(0, CASE WHEN n <= $ChunkW THEN 0
            ELSE (n - $ChunkW + ${ChunkS - 1}) // $ChunkS END)) AS k
        FROM toks)
      SELECT doc_id, k AS chunk_idx,
        CAST(k * $ChunkS + 1 AS BIGINT) AS start_tok,
        CAST(least($ChunkW, n - k * $ChunkS) AS BIGINT) AS chunk_toks,
        CAST('0x' || substr(md5(array_to_string(
          toks[(k * $ChunkS + 1):(k * $ChunkS + least($ChunkW, n - k * $ChunkS))],
          ' ')), 1, 15) AS BIGINT) AS chunk_hash
      FROM ks ORDER BY doc_id, chunk_idx"""))

  /** Cluster-balanced sampling: √n per embedding cluster instead of
    * proportional — the diversity-preserving draw (big clusters are
    * redundant, tiny clusters carry the rare modes; √-allocation is
    * the standard compromise between proportional and uniform).
    * Selection within a cluster is the reservoir sampler's idiom:
    * the quota-many smallest md5 keys, reproducible across engines
    * and cluster sizes. One shuffle on the cluster key for the
    * ranking window; quotas ride a broadcast join of the per-cluster
    * counts — nothing corpus-wide moves.
    */
  val qSampleCluster = QueryDef(
    "q_sample_cluster",
    (s, dir) => {
      val emb = Tables.t(s, dir, "embeddings")
      val n = emb.groupBy("label").agg(count(lit(1)).as("n_label"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("k"), col("vec_id"))
      emb.select(col("label"), col("vec_id"),
          md5(col("vec_id").cast("string")).as("k"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .join(broadcast(n), "label")
        .withColumn("quota", ceil(sqrt(col("n_label").cast("double"))))
        .filter(col("rk") <= col("quota"))
        .select(col("label").cast("long").as("label"), col("vec_id"),
          col("rk"), col("n_label"), col("quota"))
        .orderBy("label", "rk")
    },
    Some("""
      WITH ranked AS (
        SELECT label, vec_id, md5(CAST(vec_id AS VARCHAR)) AS k,
          row_number() OVER (PARTITION BY label
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM embeddings),
      n AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1)
      SELECT CAST(ranked.label AS BIGINT) AS label, vec_id,
        CAST(rk AS BIGINT) AS rk, n_label,
        CAST(ceil(sqrt(CAST(n_label AS DOUBLE))) AS BIGINT) AS quota
      FROM ranked JOIN n USING (label)
      WHERE rk <= CAST(ceil(sqrt(CAST(n_label AS DOUBLE))) AS BIGINT)
      ORDER BY label, rk"""))

  /** Equi-depth 16-bin discretization of document length, computed
    * the scale-right way: aggregate to the DISTINCT-value histogram
    * first (one map-side-combining shuffle; cardinality is bounded by
    * the value domain, not the corpus), run the cumulative window over
    * that tiny histogram, and derive each bin's stats from the
    * histogram alone — no join back to the corpus. Bin assignment is
    * all-integer ceil division, identical on both engines.
    */
  val qFeatureBins = QueryDef(
    "q_feature_bins",
    (s, dir) => {
      val hist = Tables.t(s, dir, "documents")
        .groupBy(col("n_chars").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum("cnt").over(w))
        .crossJoin(broadcast(
          Tables.t(s, dir, "documents").agg(count(lit(1)).as("total"))))
        .selectExpr("v", "cnt",
          "(16 * cum + total - 1) div total AS bin")
        .groupBy("bin")
        .agg(sum("cnt").as("n_docs"),
          min("v").as("v_min"), max("v").as("v_max"))
        .orderBy("bin")
    },
    Some("""
      WITH hist AS (
        SELECT n_chars AS v, count(*) AS cnt FROM documents GROUP BY 1),
      cum AS (
        SELECT v, cnt,
          CAST(sum(cnt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
        FROM hist),
      tot AS (SELECT count(*) AS total FROM documents),
      binned AS (
        SELECT v, cnt, (16 * cum + total - 1) // total AS bin
        FROM cum CROSS JOIN tot)
      SELECT bin, CAST(sum(cnt) AS BIGINT) AS n_docs,
        min(v) AS v_min, max(v) AS v_max
      FROM binned GROUP BY 1 ORDER BY 1"""))

  /** Padding-waste audit for fixed-context training batches: each doc
    * rounds up to the smallest power-of-two context (16…128, else 2048), and
    * the report shows how many pad tokens that costs per bucket — the
    * number that decides whether length-bucketed batching is worth it.
    * Narrow map + 5-key agg; waste_frac is one int/int IEEE division.
    */
  val qPackWaste = QueryDef(
    "q_pack_waste",
    (s, dir) => {
      Tables.t(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
        .selectExpr("n_tok",
          """CASE WHEN n_tok <= 16 THEN 16
                  WHEN n_tok <= 32 THEN 32
                  WHEN n_tok <= 64 THEN 64
                  WHEN n_tok <= 128 THEN 128
                  ELSE 2048 END AS ctx""")
        .groupBy("ctx")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("tok_sum"),
          sum(expr("ctx - n_tok")).as("waste_sum"))
        .selectExpr("ctx", "n_docs", "tok_sum", "waste_sum",
          "CAST(waste_sum AS DOUBLE) / CAST(ctx * n_docs AS DOUBLE)" +
            " AS waste_frac")
        .orderBy("ctx")
    },
    Some("""
      WITH t AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      b AS (
        SELECT n_tok,
          CASE WHEN n_tok <= 16 THEN 16
               WHEN n_tok <= 32 THEN 32
               WHEN n_tok <= 64 THEN 64
               WHEN n_tok <= 128 THEN 128
               ELSE 2048 END AS ctx
        FROM t),
      g AS (
        SELECT ctx, count(*) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS tok_sum,
          CAST(sum(ctx - n_tok) AS BIGINT) AS waste_sum
        FROM b GROUP BY 1)
      SELECT ctx, n_docs, tok_sum, waste_sum,
        CAST(waste_sum AS DOUBLE) / CAST(ctx * n_docs AS DOUBLE)
          AS waste_frac
      FROM g ORDER BY ctx"""))

  /** DSIR-style target-affinity scoring (data selection via
    * importance resampling, Xie et al. 2023, arXiv:2302.03169 —
    * hashed-n-gram importance weights ranking raw documents by how
    * target-like they are): the target distribution here is the
    * corpus's English slice, features are unigrams, and each word
    * carries the add-one-smoothed frequency-ratio weight
    *   w(word) = ((t_w+1)·(N_r+V)) / ((r_w+1)·(N_t+V))
    * (t_w/r_w = target/raw counts, N_t/N_r = totals, V = vocab). A
    * document's affinity is the token-count-weighted MEAN weight of
    * its words; the top-20 most target-like documents are reported —
    * the selection head of an importance-resampling pass.
    *
    * DSIR proper scores log-ratios; log() is not bit-portable across
    * engines, and since log is monotone the linear ratio induces the
    * same per-word ordering — the mean-of-ratios variant keeps the
    * selection spirit with exact cross-engine arithmetic: integer
    * products (headroom: tokens ~2.5e8 at sf10 → products ≤ ~6e16 <
    * 2^63), ONE IEEE division per vocabulary word, and an
    * order-independent exact-decimal sum per document.
    *
    * Scale shape: two word-count aggregations (map-side combined),
    * a broadcast of 4 scalar totals, one hash join of the token
    * stream to the weighted dictionary, one per-doc aggregation —
    * every shuffle is on word or doc_id keys.
    */
  val qTargetAffinity = QueryDef(
    "q_curation_affinity",
    (s, dir) => {
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val raw = toks.groupBy("w").agg(count(lit(1)).as("r_w"))
      val tgt = toks.filter(col("lang") === "en")
        .groupBy("w").agg(count(lit(1)).as("t_w"))
      val dict = raw.join(tgt, Seq("w"), "left")
        .select(col("w"), col("r_w"),
          coalesce(col("t_w"), lit(0L)).as("t_w"))
      val totals = dict.agg(
        sum("r_w").cast("long").as("n_r"),
        sum("t_w").cast("long").as("n_t"),
        count(lit(1)).as("v"))
      val weighted = dict.crossJoin(broadcast(totals))
        .select(col("w"),
          (((col("t_w") + 1) * (col("n_r") + col("v"))).cast("double") /
            ((col("r_w") + 1) * (col("n_t") + col("v"))).cast("double"))
            .as("wt"))
      toks.join(weighted, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          (Parity.dsum(col("wt")) / count(lit(1))).as("affinity"))
        .orderBy(col("affinity").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang, w FROM (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
          FROM documents)
        WHERE len(w) > 0),
      raw AS (SELECT w, count(*) AS r_w FROM toks GROUP BY w),
      tgt AS (SELECT w, count(*) AS t_w FROM toks
              WHERE lang = 'en' GROUP BY w),
      dict AS (
        SELECT raw.w, r_w, COALESCE(t_w, 0) AS t_w
        FROM raw LEFT JOIN tgt ON raw.w = tgt.w),
      totals AS (
        SELECT CAST(sum(r_w) AS BIGINT) AS n_r,
          CAST(sum(t_w) AS BIGINT) AS n_t, count(*) AS v
        FROM dict),
      weighted AS (
        SELECT w,
          CAST((t_w + 1) * (n_r + v) AS DOUBLE) /
            CAST((r_w + 1) * (n_t + v) AS DOUBLE) AS wt
        FROM dict CROSS JOIN totals)
      SELECT doc_id, count(*) AS n_toks,
        ${Parity.dsumSql("wt")} / count(*) AS affinity
      FROM toks JOIN weighted USING (w)
      GROUP BY doc_id
      ORDER BY affinity DESC, doc_id LIMIT 20"""))

  /** Hashed-feature importance resampling (the DSIR shape: Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by how much its hashed
    * word-bigram distribution looks like a target slice (here
    * `lang = 'en'`) relative to the raw corpus, then keep the top
    * scorers. Unlike q_curation_affinity — whose weight table is the
    * full VOCABULARY (its join key cardinality grows with the corpus
    * and the weight join is a real shuffle) — DSIR hashes every
    * bigram into a FIXED [[DsirBuckets]]-bucket feature space, so the
    * weight table is 128 rows at any corpus size: it broadcasts, the
    * corpus-side pass is one narrow map plus a broadcast-hash lookup,
    * and nothing in the plan grows with vocabulary. That fixed
    * dimensionality is the entire reason DSIR scales to 100 TB.
    *
    * Weights are Laplace-smoothed probability ratios summed directly
    * ((t_b+1)(R+B) / ((r_b+1)(T+B))), not log-ratios — ln() is not
    * bit-identical across engines while IEEE multiply/divide of
    * exactly-represented integers is. Counts are cast to DOUBLE
    * before multiplying: bucket counts stay < 2^53 through ~10^15
    * bigrams (a 100 TB corpus), where the BIGINT product
    * (t_b+1)·(R+B) would overflow 2^63 around 10^9·10^14 ≈ 10^23.
    * Per-doc summation is an exact decimal sum (Parity.dsum), so
    * the score is order-independent.
    */
  private val DsirBuckets = 128L

  val qDsir = QueryDef(
    "q_curation_dsir",
    (s, dir) => {
      val B = DsirBuckets
      val toks = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
      val bg = toks
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1), size(col("toks")) - 1)).as("i"),
          col("toks"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(concat_ws(" ",
              element_at(col("toks"), col("i")),
              element_at(col("toks"), col("i") + 1))), 1, 10), 16, 10)
            .cast("long") % B).as("bucket"))
      val raw = bg.groupBy("bucket").agg(count(lit(1)).as("r_b"))
      val tgt = bg.filter(col("lang") === "en")
        .groupBy("bucket").agg(count(lit(1)).as("t_b"))
      val dict = raw.join(tgt, Seq("bucket"), "left")
        .select(col("bucket"), col("r_b"),
          coalesce(col("t_b"), lit(0L)).as("t_b"))
      val totals = dict.agg(
        sum("r_b").cast("long").as("n_r"),
        sum("t_b").cast("long").as("n_t"))
      val weighted = dict.crossJoin(broadcast(totals))
        .select(col("bucket"),
          ((col("t_b") + 1).cast("double") *
            (col("n_r") + B).cast("double") /
            ((col("r_b") + 1).cast("double") *
              (col("n_t") + B).cast("double"))).as("wt"))
      bg.join(broadcast(weighted), "bucket")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (Parity.dsum(col("wt")) / count(lit(1))).as("dsir"))
        .orderBy(col("dsir").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
      bg AS (
        SELECT doc_id, lang,
          CAST('0x' || substr(md5(toks[CAST(i AS INT)] || ' ' ||
              toks[CAST(i AS INT) + 1]), 1, 10) AS BIGINT)
            % $DsirBuckets AS bucket
        FROM (SELECT doc_id, lang, toks,
                unnest(generate_series(1, len(toks) - 1)) AS i
              FROM toks)),
      raw AS (SELECT bucket, count(*) AS r_b FROM bg GROUP BY 1),
      tgt AS (SELECT bucket, count(*) AS t_b FROM bg
              WHERE lang = 'en' GROUP BY 1),
      dict AS (
        SELECT raw.bucket, r_b, COALESCE(t_b, 0) AS t_b
        FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket),
      totals AS (
        SELECT CAST(sum(r_b) AS BIGINT) AS n_r,
          CAST(sum(t_b) AS BIGINT) AS n_t
        FROM dict),
      weighted AS (
        SELECT bucket,
          CAST(t_b + 1 AS DOUBLE) * CAST(n_r + $DsirBuckets AS DOUBLE) /
            (CAST(r_b + 1 AS DOUBLE) *
             CAST(n_t + $DsirBuckets AS DOUBLE)) AS wt
        FROM dict CROSS JOIN totals)
      SELECT doc_id, count(*) AS n_bigrams,
        ${Parity.dsumSql("wt")} / count(*) AS dsir
      FROM bg JOIN weighted USING (bucket)
      GROUP BY doc_id
      ORDER BY dsir DESC, doc_id LIMIT 20"""))

  /** Pareto-skyline document selection: the docs not STRICTLY
    * dominated on (length, lexical diversity) — no other doc is both
    * longer AND more type-diverse. Multi-objective curation keeps the
    * frontier instead of collapsing signals into one weighted score
    * (the weights are always wrong for somebody); the skyline is the
    * defensible "best at every trade-off" slice.
    *
    * The dominance test is a window — max(ttr) over documents with
    * token count >= mine+1 (a RANGE frame, so ties in length never
    * dominate each other); a doc survives iff that max is NULL or
    * not above its own ttr. max() is order-independent so the
    * frontier is bit-stable; ttr is one IEEE division of exact
    * integer counts.
    *
    * A global single-partition window over every document would be
    * the 100 TB bottleneck, so the Spark plan DECOMPOSES the
    * dominance max by length bucket (n_toks div 8 — narrow buckets keep the per-bucket window partitions small and the window parallelism high even on a narrow length distribution): a doc's
    * strictly-longer competitors are exactly (a) same-bucket docs
    * with greater n_toks — a window PARTITIONED by bucket, fully
    * distributed — plus (b) every doc in a strictly later bucket
    * (all necessarily longer), summarized by the suffix-max of
    * per-bucket maxes — a window over only ~thousands of bucket
    * rows, then a broadcast join back. greatest() of the two halves
    * is EXACTLY the global frame's max, so this is a lossless
    * re-association, not an approximation; the oracle keeps the
    * direct one-window form and the results agree bit-for-bit.
    */
  val qSkyline = QueryDef(
    "q_curation_skyline",
    (s, dir) => {
      val sig = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          countDistinct(col("w")).as("vocab"))
        .select(col("doc_id"), col("n_toks"), col("vocab"),
          (col("vocab").cast("double") / col("n_toks")).as("ttr"))
        .withColumn("bkt", expr("n_toks div 8"))
      val wb = Window.orderBy(col("bkt"))
        .rangeBetween(1L, Window.unboundedFollowing)
      val bsuf = sig.groupBy("bkt").agg(max("ttr").as("bmax"))
        .withColumn("suf", max(col("bmax")).over(wb))
        .select("bkt", "suf")
      val wIn = Window.partitionBy("bkt").orderBy(col("n_toks"))
        .rangeBetween(1L, Window.unboundedFollowing)
      sig.join(broadcast(bsuf), Seq("bkt"), "left")
        .withColumn("in_longer", max(col("ttr")).over(wIn))
        // greatest() skips nulls in both engines; null only when BOTH
        // halves are empty = no strictly longer doc exists at all
        .withColumn("best_longer",
          greatest(col("in_longer"), col("suf")))
        .filter(col("best_longer").isNull ||
          col("best_longer") <= col("ttr"))
        .select("doc_id", "n_toks", "vocab", "ttr")
        .orderBy(col("n_toks").desc, col("doc_id"))
    },
    Some("""
      WITH sig AS (
        SELECT doc_id, count(*) AS n_toks,
          count(DISTINCT w) AS vocab,
          CAST(count(DISTINCT w) AS DOUBLE) / count(*) AS ttr
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE len(w) > 0
        GROUP BY doc_id),
      flagged AS (
        SELECT doc_id, n_toks, vocab, ttr,
          max(ttr) OVER (ORDER BY n_toks
            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS best_longer
        FROM sig)
      SELECT doc_id, n_toks, vocab, ttr
      FROM flagged
      WHERE best_longer IS NULL OR best_longer <= ttr
      ORDER BY n_toks DESC, doc_id"""))

  /** Quota sampling to a target language distribution: the mixing
    * recipe says "the training slice is 40% en / 20% de / 20% es /
    * 10% fr / 10% zh"; the budget is ⌊corpus/5⌋ docs; each stratum's
    * quota is budget·share in EXACT integer arithmetic
    * (budget·pct div 100 — no float share to round differently), and
    * selection within a stratum is by md5 rank (reproducible across
    * runs, engines, and cluster sizes — audit-grade sampling). A
    * stratum smaller than its quota under-fills (kept = min(avail,
    * quota)) and the shortfall is REPORTED, not silently
    * redistributed. Output: one audit row per language.
    *
    * Scale shape: one count per stratum, a broadcast of 5 quota
    * rows, one rank window per stratum partition (the same sharding
    * argument as q_pack_sequences applies when strata outgrow a
    * partition), one final 5-row aggregation.
    */
  val qQuotaSample = QueryDef(
    "q_sample_quota",
    (s, dir) => {
      val pct: Seq[(String, Long)] =
        Seq("en" -> 40L, "de" -> 20L, "es" -> 20L, "fr" -> 10L,
          "zh" -> 10L)
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
      val budget = Tables.rowCount(s, dir, "documents") / 5
      val pctCol = pct.tail.foldLeft(
        when(col("lang") === pct.head._1, pct.head._2)) {
        case (acc, (l, p)) => acc.when(col("lang") === l, p)
      }.otherwise(0L)
      val ranked = docs
        .withColumn("qpct", pctCol)
        // integer div — Column./ would widen to DOUBLE and round
        // differently from the oracle's // at exact multiples
        .withColumn("quota", expr(s"qpct * $budget div 100"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(
            md5(col("doc_id").cast("string")), col("doc_id"))))
      ranked.groupBy("lang")
        .agg(count(lit(1)).as("n_avail"),
          max("quota").cast("long").as("quota"),
          sum(when(col("rk") <= col("quota"), 1L).otherwise(0L))
            .cast("long").as("n_kept"))
        .select(col("lang"), col("n_avail"), col("quota"),
          col("n_kept"),
          (col("quota") - col("n_kept")).as("shortfall"))
        .orderBy("lang")
    },
    Some(s"""
      WITH budget AS (
        SELECT count(*) // 5 AS b FROM documents),
      ranked AS (
        SELECT lang,
          CAST((CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 20
                WHEN 'es' THEN 20 WHEN 'fr' THEN 10 WHEN 'zh' THEN 10
                ELSE 0 END) * b // 100 AS BIGINT) AS quota,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents CROSS JOIN budget)
      SELECT lang, count(*) AS n_avail,
        CAST(max(quota) AS BIGINT) AS quota,
        CAST(sum(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(max(quota) AS BIGINT) -
          CAST(sum(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT)
          AS shortfall
      FROM ranked GROUP BY lang ORDER BY lang"""))

  /** Curriculum staging: rank the corpus by a difficulty signal and
    * cut it into 4 equal-count stages (NTILE over a total order), then
    * report each stage's doc count, token budget, difficulty band and
    * the cumulative token fraction a trainer consuming the stages in
    * order has seen — the schedule a curriculum-learning run feeds its
    * data loader. Difficulty is mean word length in EXACT scaled
    * integer form (non-space chars × 1000 div words): the usual
    * readability floats would need cross-engine rounding care, while
    * the integer rank induces the identical stage assignment on any
    * engine. Ties break on doc_id, so the cut is total.
    *
    * Scale shape: one narrow per-doc map, then an exact DISTRIBUTED
    * global rank instead of Spark's ntile-over-empty-partitionBy
    * (which coalesces the whole corpus into ONE window partition):
    * range-repartition on the sort key, rank locally within each
    * range, and add broadcast prefix offsets from the ≤ 32-row
    * per-partition count table — the classic two-pass global
    * row_number, exact for any boundary placement because ranges are
    * disjoint and pid-ordered. NTILE is then pure per-row arithmetic
    * on (rank, n): the first n%4 stages take n/4+1 rows — identical
    * to the oracle's NTILE by definition. The only single-partition
    * windows left run over ≤ 32 (offsets) and 4 (stages) rows.
    */
  val qCurriculum = QueryDef(
    "q_curation_curriculum",
    (s, dir) => {
      val scored = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          length(regexp_replace(col("text"), " ", ""))
            .cast("long").as("letters"))
        .withColumn("difficulty", expr("letters * 1000 div n_tok"))
        .repartitionByRange(32, col("difficulty"), col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val local = scored.withColumn("lrk",
        row_number().over(Window.partitionBy("pid")
          .orderBy(col("difficulty"), col("doc_id"))).cast("long"))
      val offs = local.groupBy("pid")
        .agg(count(lit(1)).as("pn"))
        .withColumn("off", coalesce(sum(col("pn")).over(
          Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("pn")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select("pid", "off", "n")
      val staged = local.join(broadcast(offs), "pid")
        .withColumn("rn", col("off") + col("lrk"))
        // NTILE(4) from the exact global rank: first n%4 buckets get
        // n/4+1 rows (lazy CASE — the ELSE's n/4 divisor is never 0
        // when taken, since n/4 = 0 puts every row in the THEN arm)
        .withColumn("stage", expr(
          """CASE WHEN rn <= (n div 4 + 1) * (n % 4)
             THEN (rn - 1) div (n div 4 + 1) + 1
             ELSE (n % 4) + (rn - 1 - (n div 4 + 1) * (n % 4))
                  div (n div 4) + 1 END""").cast("int"))
      val wcum = Window.orderBy(col("stage"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      staged.groupBy("stage")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tokens"),
          min(col("difficulty")).as("min_diff"),
          max(col("difficulty")).as("max_diff"))
        .withColumn("cum_tokens", sum(col("tokens")).over(wcum))
        .withColumn("cum_frac",
          col("cum_tokens").cast("double") /
            sum(col("tokens")).over(Window.rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing))
              .cast("double"))
        .select("stage", "n_docs", "tokens", "min_diff", "max_diff",
          "cum_tokens", "cum_frac")
        .orderBy("stage")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST(len(replace(text, ' ', '')) AS BIGINT) AS letters
        FROM documents),
      staged AS (
        SELECT *, letters * 1000 // n_tok AS difficulty,
          ntile(4) OVER (ORDER BY letters * 1000 // n_tok, doc_id)
            AS stage
        FROM scored),
      agg AS (
        SELECT stage, count(*) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS tokens,
          min(difficulty) AS min_diff, max(difficulty) AS max_diff
        FROM staged GROUP BY stage)
      SELECT CAST(stage AS INT) AS stage, n_docs, tokens, min_diff,
        max_diff,
        CAST(sum(tokens) OVER (ORDER BY stage
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_tokens,
        CAST(sum(tokens) OVER (ORDER BY stage
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(sum(tokens) OVER () AS DOUBLE) AS cum_frac
      FROM agg ORDER BY stage"""))

  val all: Seq[QueryDef] =
    Seq(qPackSequences, qSampleStratified, qSampleReservoir, qDomainMix,
      qSplitTrain, qTemperatureMix, qTokenBudget, qCorpusShuffle,
      qEpochMix, qSampleWeighted, qChunkSliding, qSampleCluster,
      qFeatureBins, qPackWaste, qTargetAffinity, qSkyline, qQuotaSample,
      qDsir, qMixAnneal, qCurriculum)
}
