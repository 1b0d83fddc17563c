package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard (builder brief; the embedding-cosine
  * near-dup lives in Similarity.scala). Each is built on its scale
  * path: candidate generation is always a bucket-equi-join (band
  * value / shingle / signature byte), never an all-pairs cross join,
  * so the shuffle keys stay bounded at 100 TB.
  *
  * Cross-engine determinism: the only hash primitive is the md5 hex
  * prefix parsed as an integer — `conv(hex,16,10)` in Spark,
  * `('0x'||hex)::BIGINT` in DuckDB — and all downstream arithmetic is
  * integer mod 2^31-1, identical in both engines.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1

  /** doc_id + distinct word-3-gram shingles, exploded — hashed to
    * 60-bit md5-prefix integers at the source, so every downstream
    * join/shuffle moves 8-byte keys instead of ~25-byte strings (and
    * the minhash permutations reuse the same hash). Both engines hash
    * identically, so a (cosmically unlikely, ~1e-14/doc) collision
    * would still produce identical results on both sides.
    */
  private[graft] def shingles(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    // NOT spread: every consumer caches this frame (sh.cache()), and
    // an exchange under .cache() wraps the cached child in a nested
    // AdaptiveSparkPlan that loses whole-stage codegen — measured r14
    // at 22× the task cpu (12 → 136 tasks, 0.9 s → 20 s task time on
    // q_dedup_minhash_lsh). The serial md5 pass costs only the cache
    // BUILD (rep 1); warm reads never touch it.
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - 2),
          i => conv(substring(md5(
            concat_ws(" ", slice(col("toks"), i, lit(3)))), 1, 15), 16, 10)
            .cast("long")))).as("sh"))
  }

  private[ops] val shinglesSql: String = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             WHERE len(string_split(text, ' ')) >= 3),
    shingle AS (SELECT doc_id, unnest(list_distinct(
        [CAST('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 15)
              AS BIGINT)
         for i in generate_series(1, len(toks) - 2)])) AS sh
      FROM toks)"""

  /** Exact dedup: hash-groupBy on a normalized content signature
    * (bag-of-words md5). One shuffle on the 128-bit signature —
    * uniformly distributed, skew-free at any scale.
    */
  val qExact = QueryDef(
    "q_dedup_exact",
    (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(lower(col("text")), " ")))))
            .as("sig"))
        .groupBy(col("sig"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical"))
        .orderBy("canonical"),
    Some("""
      SELECT sig, count(*) AS n_dups, min(doc_id) AS canonical
      FROM (SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(
                string_split(lower(text), ' '))), ' ')) AS sig
            FROM documents)
      GROUP BY sig ORDER BY canonical"""))

  /** JVM mirror of the SQL shingle→minhash pipeline, bit-for-bit
    * (spec-asserted against the SQL frame): used by the streaming
    * near-dup path so streaming candidates agree with the batch
    * operator. None for docs with fewer than 3 tokens (no shingles),
    * like the SQL `size(toks) >= 3` filter.
    */
  private[graft] def jvmMinHash(text: String): Option[Array[Long]] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val shingles = (0 to toks.length - 3).map { i =>
        md.reset()
        val hex = md.digest(toks.slice(i, i + 3).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }.distinct
      Some(Array.tabulate(K) { i =>
        shingles.map(x => ((x % 4294967296L) * aCoef(i) + bCoef(i)) % P).min
      })
    }
  }

  /** The 4 (band, bandValue) keys of a 16-hash signature — the same
    * fold as the SQL bandVal.
    */
  private[graft] def jvmBands(mh: Array[Long]): Array[(Int, Long)] =
    Array.tabulate(4) { b =>
      val v = (0 until 4).map(r => mh(b * 4 + r))
        .reduce((acc, m) => (acc % P) * 31 + m) % P
      (b, v)
    }

  /** Per-doc 16-hash minhash signatures as columns m0..m15 (the SQL
    * side of the jvmMinHash parity spec).
    */
  private[graft] def minHashSignatures(s: SparkSession,
      dir: String): DataFrame = {
    val sh = shingles(s, dir)
      .select(col("doc_id"), (col("sh") % 4294967296L).as("x"))
    val mins = (0 until K).map(i =>
      min((col("x") * aCoef(i) + bCoef(i)) % P).as(s"m$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Stop-shingle document-frequency cap: a shingle appearing in more
    * than this many documents is dropped from every shingle set before
    * the candidate self-join. Without it a common shingle s is a hot
    * join key producing df(s)² candidate rows — the quadratic blowup
    * that kills the join at 100 TB. With it, the worst key yields at
    * most DfCap² rows, a constant, so the shuffle stays uniform no
    * matter how large the corpus grows (standard stop-word pruning;
    * such shingles carry ~no near-dup signal anyway).
    */
  private[graft] val DfCap = 64

  /** Shingles with the df > DfCap tail removed; both the candidate
    * join and the per-doc set sizes use the pruned frame, so the
    * Jaccard stays internally consistent.
    */
  private[graft] def prunedShingles(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap)
      .select("sh")
    sh.join(rare, "sh").select("doc_id", "sh")
  }

  private[ops] def prunedShinglesSql: String = s"""
    $shinglesSql,
    rare AS (SELECT sh FROM shingle GROUP BY sh
             HAVING count(*) <= $DfCap),
    pruned AS (SELECT s.doc_id, s.sh FROM shingle s JOIN rare USING (sh))"""

  /** Verified df-capped shingle-join Jaccard pairs at ≥ 0.2 —
    * q_dedup_ngram_jaccard's semantics, defined once and shared with
    * the recall evaluation's ground truth so the two can never
    * silently diverge.
    */
  private def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    // cacheWide: compute-dense cache (md5-shingle pair join reads it)
    val sh = Tables.cacheWide(prunedShingles(s, dir))
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(cnt.toDF("doc_a", "na"), "doc_a")
      .join(cnt.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jacc"))
      .filter(col("jacc") >= 0.2)
  }

  /** The same pairs as CTEs ending in `tpairs(doc_a, doc_b, jacc)`
    * (includes prunedShinglesSql, hence also the unpruned `shingle`).
    */
  private def ngramPairsCtesSql: String = s"""$prunedShinglesSql,
      tcnt AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
      tcommon AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM pruned a JOIN pruned b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      tpairs AS (
        SELECT doc_a, doc_b,
          CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jacc
        FROM tcommon
        JOIN tcnt na ON na.doc_id = doc_a
        JOIN tcnt nb ON nb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.2)"""

  /** n-gram Jaccard near-dup: docs sharing a (df-capped) shingle are
    * candidates; Jaccard = |∩| / |∪| over the pruned distinct shingle
    * sets, threshold 0.2. The shingle equi-join IS the candidate
    * pruning — no all-pairs — and the DfCap bounds the worst join key.
    */
  val qNgramJaccard = QueryDef(
    "q_dedup_ngram_jaccard",
    (s, dir) => ngramJaccardPairs(s, dir).orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $ngramPairsCtesSql
      SELECT doc_a, doc_b, jacc FROM tpairs
      ORDER BY doc_a, doc_b"""))

  // MinHash: k=16 permutation hashes h_i(x) = ((2i+1)x + 7919i + 13) mod P,
  // banded 4×4; pairs sharing any band value are candidates, then the
  // true Jaccard is computed per candidate pair only.
  private val K = 16
  private def aCoef(i: Int): Long = 2L * i + 1
  private def bCoef(i: Int): Long = 7919L * i + 13

  // The permutation-minima and band-fold math exists ONCE per engine
  // side — every minhash operator (self-pair, incremental, recall)
  // composes these, so a change to the hash can never silently leave
  // one operator on the old math.

  /** SQL: the K permutation minima over a column `x`. */
  private def minsSqlStr: String = (0 until K).map(i =>
    s"min((x * ${aCoef(i)} + ${bCoef(i)}) % $P) AS m$i").mkString(", ")

  /** SQL: the fold of m{4b}..m{4b+3} into one band value. */
  private def bandSqlStr(b: Int): String = {
    val folded = (0 until 4).map(r => s"m${b * 4 + r}")
      .reduce((acc, m) => s"(($acc) % $P) * 31 + $m")
    s"($folded) % $P"
  }

  /** SQL: the UNION ALL band expansion of `mh`, threading
    * `extraCols` (e.g. ", is_old") through each branch.
    */
  private def bandsUnionSql(extraCols: String = ""): String =
    (0 until 4).map(b =>
      s"SELECT doc_id$extraCols, $b AS b, (${bandSqlStr(b)}) AS v FROM mh")
      .mkString(" UNION ALL ")

  /** Column side of minsSqlStr — aggregate minima over col("x"). */
  private def minsAggCols: Seq[Column] = (0 until K).map(i =>
    min((col("x") * aCoef(i) + bCoef(i)) % P).as(s"m$i"))

  /** Column side of bandSqlStr. */
  private def bandValCol(b: Int): Column =
    (0 until 4).map(r => col(s"m${b * 4 + r}"))
      .reduce((acc, m) => (acc % P) * 31 + m) % P

  /** MinHash+LSH candidate pairs with verified Jaccard, unordered —
    * shared by q_dedup_minhash_lsh (presentation) and q_dedup_clusters
    * (edge source). Candidate generation joins on (band, band-hash) —
    * at 100 TB the shuffle carries 4 rows per doc, and the quadratic
    * verify work is confined to same-bucket pairs.
    */
  private def minHashPairs(s: SparkSession, dir: String): DataFrame = {
      // minhash permutation input: fold the 60-bit shingle hash to 32
      // bits (uniform md5 bits, so the modulo keeps the distribution)
      val sh = shingles(s, dir)
        .select(col("doc_id"), col("sh"),
          (col("sh") % 4294967296L).as("x"))
        .cache()
      val mins = minsAggCols
      val mh = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      lshVerifiedPairs(sh, mh)
  }

  /** Band expansion + bucket equi-join + exact-Jaccard verification
    * over a signature frame `mh(doc_id, m0..m15)` — the LSH tail
    * shared by the SQL-composed (minHashPairs) and native-aggregate
    * (q_dedup_minhash_native) signature builders.
    */
  private def lshVerifiedPairs(sh: DataFrame, mh: DataFrame): DataFrame = {
      val bands = mh.select(col("doc_id"), explode(array((0 until 4).map(
          b => struct(lit(b).as("b"), bandValCol(b).as("v"))): _*))
          .as("bv"))
        .select(col("doc_id"), col("bv.b").as("b"), col("bv.v").as("v"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // verify candidates only: per-doc shingle sets brought to the pair
      val sets = sh.groupBy(col("doc_id"))
        .agg(collect_set(col("sh")).as("set"), count(lit(1)).as("n"))
      cand
        .join(sets.select(col("doc_id").as("doc_a"), col("set").as("sa"),
          col("n").as("na")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("set").as("sb"),
          col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (col("na") + col("nb") -
              size(array_intersect(col("sa"), col("sb")))))
            .as("jacc"))
  }

  /** The minhash pipeline CTEs AFTER the shared `shingle` CTE —
    * `hx`/`mh`/`bands`/`cand`/`cnt`/`common`/`pairs` — so callers
    * that already bring their own `shinglesSql` (e.g. the recall
    * evaluation, which also needs the PRUNED variant) can compose
    * without duplicate CTE names.
    */
  private val minHashCoreSql: String = {
    s"""hx AS (SELECT doc_id, sh, sh % 4294967296 AS x FROM shingle),
      mh AS (SELECT doc_id, $minsSqlStr FROM hx GROUP BY doc_id),
      bands AS (${bandsUnionSql()}),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bands x JOIN bands y
                 ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
      cnt AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
      common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM hx a JOIN hx b ON a.sh = b.sh AND a.doc_id < b.doc_id
        WHERE EXISTS (SELECT 1 FROM cand
                      WHERE cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id)
        GROUP BY 1, 2),
      pairs AS (
        SELECT cand.doc_a, cand.doc_b,
          CAST(coalesce(c, 0) AS DOUBLE) /
            (na.n + nb.n - coalesce(c, 0)) AS jacc
        FROM cand
        LEFT JOIN common ON common.doc_a = cand.doc_a
                        AND common.doc_b = cand.doc_b
        JOIN cnt na ON na.doc_id = cand.doc_a
        JOIN cnt nb ON nb.doc_id = cand.doc_b)"""
  }

  /** The full pair pipeline as CTEs ending in `pairs(doc_a, doc_b,
    * jacc)`, composable into larger oracle queries.
    */
  private val minHashCtesSql: String = s"""$shinglesSql,
      $minHashCoreSql"""

  val qMinHashLsh = QueryDef(
    "q_dedup_minhash_lsh",
    (s, dir) => minHashPairs(s, dir).orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $minHashCtesSql
      SELECT doc_a, doc_b, jacc FROM pairs ORDER BY doc_a, doc_b"""))

  /** The same MinHash+LSH near-dup pairs, but the signature is built
    * by the NATIVE graft_minhash TypedImperativeAggregate
    * ([[graft.functions.MinHashAgg]]) instead of 16 composed min()
    * columns: one aggregate walks each doc's shingles once with a
    * 128-byte state, emitting one ArrayType signature column.
    * Everything downstream (band equi-join, exact-Jaccard verify) is
    * [[lshVerifiedPairs]], shared with q_dedup_minhash_lsh — and the
    * oracle is VERBATIM q_dedup_minhash_lsh's SQL, so the driver
    * cross-checks the native aggregate against DuckDB's from-scratch
    * pipeline. SketchSpec additionally pins the raw signatures
    * bit-equal to minHashSignatures' columns. Performance (see
    * MinHashAgg's doc + SCALE_SMOKE.md round 9): at parity with the
    * composed codegen'd form once the ObjectHashAggregate sort
    * fallback is lifted below — both are production paths; this one
    * additionally serves the SQL-surface / sketch-column use cases.
    */
  // The fallback-threshold override below lives on a CLONED session
  // (same SparkContext, shared cache manager, isolated SQLConf) so it
  // cannot leak into later queries on the shared session, where a
  // 1M-group in-memory ObjectHashAggregate threshold would be
  // order-dependent OOM risk for unrelated object aggregates with much
  // larger per-group buffers. The clone is memoized per root session:
  // building a fresh session per invocation re-ran session init +
  // function registration on every bench rep (measured ~2× on this
  // query). WeakHashMap is safe here — the clone references
  // sharedState, not its parent session, so the key stays collectable.
  private val nativeSessionCache =
    new java.util.WeakHashMap[SparkSession, SparkSession]()
  private def minhashSession(s0: SparkSession): SparkSession =
    nativeSessionCache.synchronized {
      var s = nativeSessionCache.get(s0)
      if (s == null) {
        s = s0.newSession()
        // inherit the caller's whole runtime conf (shuffle partitions,
        // AQE knobs, timezone), THEN apply the one scoped override —
        // a bare newSession starts from the context conf only
        s0.conf.getAll.foreach { case (k, v) =>
          try s.conf.set(k, v) catch { case _: Exception => () }
        }
        graft.functions.GraftFunctions.register(s)
        s.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "1000000")
        nativeSessionCache.put(s0, s)
      }
      s
    }

  val qMinHashNative = QueryDef(
    "q_dedup_minhash_native",
    (s0, dir) => {
      // ObjectHashAggregate (the only plan a TypedImperativeAggregate
      // gets) falls back to SORT-based aggregation after 128 distinct
      // groups by default — a full sort of the shingle stream once the
      // corpus has more than 128 docs, which was most of the gap to
      // the codegen'd composed form. The 128-byte signature buffer
      // makes a large in-memory hash map cheap: 1M doc groups ≈
      // 200 MB/partition worst case, well inside executor sizing.
      // Conf isolation via the memoized cloned session above.
      val s = minhashSession(s0)
      val sh = shingles(s, dir).cache()
      val mh = sh.groupBy(col("doc_id"))
        .agg(graft.functions.GraftFunctions.minhash(col("sh")).as("sig"))
        .select(col("doc_id") +:
          (0 until K).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
      lshVerifiedPairs(sh, mh).orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH $minHashCtesSql
      SELECT doc_a, doc_b, jacc FROM pairs ORDER BY doc_a, doc_b"""))

  /** Near-dup Jaccard threshold above which two docs are considered
    * duplicates for clustering.
    */
  private val ClusterJacc = 0.2

  /** Cluster dedup: connected components over the MinHash-LSH near-dup
    * graph, canonical = min doc_id per component — the "keep one per
    * duplicate cluster" stage that follows pair generation in a real
    * pipeline (pairs alone over-delete when dups chain A–B–C).
    *
    * Hash-min label propagation: every vertex starts labeled with its
    * own id; each round takes the min label over itself and its
    * neighbors until fixpoint. Converges in O(component diameter)
    * rounds — near-dup clusters are shallow (dups of one source), so
    * 2–4 rounds in practice; at 100 TB-scale diameters switch to the
    * large-star/small-star algorithm (same join shape, O(log n)
    * rounds). Convergence is detected by the label sum, which strictly
    * decreases until fixpoint (labels only ever decrease).
    *
    * The fixpoint (min reachable id per vertex) is unique, so the
    * result is deterministic regardless of join order — the DuckDB
    * oracle computes the same closure with a recursive CTE.
    */
  /** Connected components over an undirected edge list
    * `(doc_a, doc_b)`. Returns `(v, l)` — one row per vertex that has
    * at least one edge, labeled with the minimum vertex id reachable
    * from it; isolated vertices are their own components and are NOT
    * emitted (join the vertex universe back with a left join +
    * coalesce).
    */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** Large-star/small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round rewires
    * every vertex's larger neighbors (large-star) then its smaller
    * neighbors (small-star) onto the local minimum, collapsing every
    * component into a star around its minimum id in O(log n) rounds —
    * vs O(component diameter) for plain hash-min propagation, which
    * stalls on chain-shaped duplicate graphs (A≈B≈C≈…).
    *
    * Loop state is eagerly checkpointed via [[Lineage.cut]] (lineage
    * truncated), NOT cache()-d: a plain cache evicted under memory
    * pressure silently recomputes the upstream pair pipeline once per
    * iteration (measured 4× slowdown under bench-wide cache pressure).
    * On a real cluster set `sc.setCheckpointDir(...)` and the same
    * loop upgrades to reliable (executor-loss-safe) checkpoints —
    * PipelineOpsSpec proves label equality across both modes.
    *
    * Convergence: per-vertex labels (min of self and neighbors) only
    * ever decrease, so the label sum strictly decreases until
    * fixpoint. The loop exit is then *certified* against the original
    * edge list — both endpoints of every input edge must carry the
    * same label — so a hypothetical premature plateau fails loudly
    * instead of returning labels that split a true cluster. The
    * fixpoint (min reachable id per vertex) is unique, hence
    * deterministic regardless of join order; the DuckDB oracle
    * computes the same closure with a recursive CTE.
    */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame): (DataFrame, Int) = Confs.scoped(
    pairs.sparkSession,
    // r15 (guide §2.2): the per-round edge checkpoints and label
    // aggregations materialize inside this loop; advisory-size-only
    // AQE coalescing scoped here keeps each round's stages at the
    // edge list's byte size (1 partition at sf0.1, 64 MB partitions
    // at corpus scale) instead of 32 tiny tasks per stage
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false") {
    val p = pairs.toDF("doc_a", "doc_b").cache()

    // symmetric, self-loop-free view of an (a, b) edge list
    def sym(e: DataFrame): DataFrame = {
      val ne = e.filter(col("a") =!= col("b"))
      ne.select(col("a").as("u"), col("b").as("v"))
        .union(ne.select(col("b").as("u"), col("a").as("v")))
        .distinct()
    }
    // per-vertex local minimum m = min(N(u) ∪ {u})
    def mins(e: DataFrame): DataFrame =
      e.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
    def labelSum(l: DataFrame): Long = {
      val r = l.agg(org.apache.spark.sql.functions.sum("m")).first()
      if (r.isNullAt(0)) 0L else r.getLong(0) // null = no edges at all
    }

    var edges = sym(p.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .transform(graft.ops.Lineage.cut)
    // labels stays LAZY over the checkpointed edges: mins() is one
    // hash aggregation, and re-deriving it (labelSum here, the
    // large-star join next round) is cheaper than a per-round
    // checkpoint job — the r14 profile measured the loop's wall as
    // driver job latency (~41 jobs for 3 rounds), not compute, so
    // each removed blocking action is a direct win. Lineage stays
    // linear: edges is cut every round.
    var labels = mins(edges)
    var prevSum = Long.MaxValue
    var curSum = labelSum(labels)
    var rounds = 0
    while (curSum < prevSum && rounds < 50) {
      // large-star: every neighbor v > u rewires to u's local min
      // (each undirected edge processed once, from its smaller end)
      val large = edges.filter(col("v") > col("u"))
        .join(labels, "u")
        .select(col("v").as("a"), col("m").as("b"))
      // el is referenced twice (mS and small) but both uses land in
      // the SAME action (the edges cut below), where the shared
      // distinct-exchange is reused — no checkpoint needed and the
      // lineage does not compound (it resets at the edges cut)
      val el = sym(large)
      // small-star: every neighbor v < u rewires to u's local min,
      // and u itself links to it (keeps u attached to its component)
      val mS = mins(el)
      val small = el.filter(col("v") < col("u"))
        .join(mS, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(mS.select(col("u").as("a"), col("m").as("b")))
      edges = sym(small).transform(graft.ops.Lineage.cut)
      labels = mins(edges)
      prevSum = curSum
      curSum = labelSum(labels)
      rounds += 1
    }
    require(curSum == prevSum,
      s"connectedComponents did not converge in $rounds rounds")
    val lab = labels.select(col("u").as("v"), col("m").as("l"))
      .transform(graft.ops.Lineage.cut)
    // certificate: label-consistency across every ORIGINAL edge (and
    // coverage of both endpoints) proves the labels are the unique
    // per-component minima — loop-exit heuristics can't silently lie
    val la = lab.toDF("doc_a", "la")
    val lb = lab.toDF("doc_b", "lb")
    val viol = p.join(la, Seq("doc_a"), "left")
      .join(lb, Seq("doc_b"), "left")
      .filter(col("la").isNull || col("lb").isNull ||
        col("la") =!= col("lb"))
      .count()
    require(viol == 0,
      s"connectedComponents certificate failed on $viol edges")
    p.unpersist(false)
    (lab, rounds)
  }

  val qClusters = QueryDef(
    "q_dedup_clusters",
    (s, dir) => {
      // Propagate labels only over vertices that HAVE an edge: docs
      // outside the near-dup graph are singletons by construction and
      // rejoin at the end. At corpus scale paired docs are a small
      // fraction of N, so every iteration touches |E| rows, not the
      // whole corpus.
      val labels = connectedComponents(
        minHashPairs(s, dir)
          .filter(col("jacc") >= ClusterJacc)
          .select(col("doc_a"), col("doc_b")))
      val lab = Tables.t(s, dir, "documents").select(col("doc_id"))
        .join(labels.toDF("doc_id", "l"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("l"), col("doc_id")).as("cluster"))
      val sz = lab.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      lab.join(sz, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          (col("doc_id") === col("cluster")).as("is_canonical"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $minHashCtesSql,
      edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jacc >= $ClusterJacc
        UNION ALL
        SELECT doc_b, doc_a FROM pairs WHERE jacc >= $ClusterJacc),
      cc AS (
        SELECT doc_id AS v, doc_id AS l FROM documents
        UNION
        SELECT e.v, cc.l FROM edges e JOIN cc ON cc.v = e.u),
      lab AS (SELECT v AS doc_id, min(l) AS cluster FROM cc GROUP BY v),
      sz AS (SELECT cluster, count(*) AS cluster_size FROM lab
             GROUP BY cluster)
      SELECT doc_id, cluster, cluster_size,
        doc_id = cluster AS is_canonical
      FROM lab JOIN sz USING (cluster) ORDER BY doc_id"""))

  /** Cohesion audit of the near-dup clusters: per edge-connected
    * cluster, member count, verified-pair count, the weakest and mean
    * intra-cluster Jaccard, and clique completeness 2E/(n(n−1)) — the
    * quality gate run BEFORE acting on a dedup partition (a
    * min_jacc barely at threshold with low completeness is a chain of
    * borderline pairs, i.e. a transitive-closure over-merge about to
    * delete non-duplicates; a complete high-Jaccard clique is safe).
    * Pairs and labels are the SAME frames q_dedup_clusters uses, so
    * the audit can never disagree with the partition it audits.
    *
    * Scale shape: the pair frame is the banded-LSH equi-join output
    * (already bounded), labels are edge-only CC; the audit adds two
    * hash aggregations on cluster keys. Mean Jaccard is an exact
    * decimal sum (Parity.dsum) so both engines emit identical bits.
    */
  val qClusterAudit = QueryDef(
    "q_dedup_cluster_audit",
    (s, dir) => {
      val p = minHashPairs(s, dir)
        .filter(col("jacc") >= ClusterJacc)
        .cache()
      val labels = connectedComponents(
        p.select(col("doc_a"), col("doc_b")))
        .toDF("doc_id", "cluster")
      val sz = labels.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      val eg = p.join(labels.toDF("doc_a", "cluster"), "doc_a")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_edges"),
          min(col("jacc")).as("min_jacc"),
          Parity.dsum(col("jacc")).as("sj"))
      sz.join(eg, "cluster")
        .select(col("cluster"), col("n_members"), col("n_edges"),
          col("min_jacc"),
          (col("sj") / col("n_edges").cast("double")).as("mean_jacc"),
          ((col("n_edges") * 2L).cast("double") /
            (col("n_members") * (col("n_members") - 1L)).cast("double"))
            .as("completeness"))
        .orderBy("cluster")
    },
    Some(s"""
      WITH RECURSIVE $minHashCtesSql,
      edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jacc >= $ClusterJacc
        UNION ALL
        SELECT doc_b, doc_a FROM pairs WHERE jacc >= $ClusterJacc),
      cc AS (
        SELECT doc_id AS v, doc_id AS l FROM documents
        UNION
        SELECT e.v, cc.l FROM edges e JOIN cc ON cc.v = e.u),
      lab AS (SELECT v AS doc_id, min(l) AS cluster FROM cc GROUP BY v),
      ep AS (SELECT doc_a, doc_b, jacc FROM pairs
             WHERE jacc >= $ClusterJacc),
      sz AS (
        SELECT cluster, count(*) AS n_members FROM lab
        WHERE cluster IN (SELECT lab2.cluster FROM ep
                          JOIN lab lab2 ON ep.doc_a = lab2.doc_id)
        GROUP BY cluster),
      eg AS (
        SELECT lab.cluster, count(*) AS n_edges,
          min(jacc) AS min_jacc, ${Parity.dsumSql("jacc")} AS sj
        FROM ep JOIN lab ON ep.doc_a = lab.doc_id
        GROUP BY lab.cluster)
      SELECT sz.cluster, n_members, n_edges, min_jacc,
        sj / CAST(n_edges AS DOUBLE) AS mean_jacc,
        CAST(2 * n_edges AS DOUBLE)
          / CAST(n_members * (n_members - 1) AS DOUBLE) AS completeness
      FROM sz JOIN eg ON sz.cluster = eg.cluster
      ORDER BY sz.cluster"""))

  /** Quality-aware survivorship: for every near-dup cluster, the doc
    * a pipeline should KEEP — the longest member (n_chars, ties to
    * the lowest doc_id) — rather than q_dedup_clusters' arbitrary
    * min-id canonical. Real dedup passes select survivors by quality
    * (longest/highest-scoring member), because near-dups are usually
    * truncations or boilerplate-wrapped copies of one best version.
    *
    * Shape: the same edge-only label propagation as
    * q_dedup_clusters (iterations touch |E| rows, never the corpus),
    * then ONE hash aggregation per cluster with the survivor as a
    * struct-max (the M4/OHLC argmax pattern) — no window over the
    * corpus, no sort. Output is one row per real dup cluster
    * (size ≥ 2 by construction: only edge-connected docs carry
    * labels).
    */
  val qKeepBest = QueryDef(
    "q_dedup_keep_best",
    (s, dir) => {
      val labels = connectedComponents(
        minHashPairs(s, dir)
          .filter(col("jacc") >= ClusterJacc)
          .select(col("doc_a"), col("doc_b")))
      val meta = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      labels.toDF("doc_id", "cluster").join(meta, "doc_id")
        .groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"),
          max(struct(col("n_chars").as("nc"),
            (-col("doc_id")).as("ni"), col("doc_id").as("doc_id")))
            .as("m"))
        .select(col("cluster"), col("cluster_size"),
          col("m.doc_id").as("keep_id"), col("m.nc").as("keep_chars"),
          (col("cluster_size") - 1).as("n_dropped"))
        .orderBy("cluster")
    },
    Some(s"""
      WITH RECURSIVE $minHashCtesSql,
      edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jacc >= $ClusterJacc
        UNION ALL
        SELECT doc_b, doc_a FROM pairs WHERE jacc >= $ClusterJacc),
      cc AS (
        SELECT doc_id AS v, doc_id AS l FROM documents
        UNION
        SELECT e.v, cc.l FROM edges e JOIN cc ON cc.v = e.u),
      lab AS (SELECT v AS doc_id, min(l) AS cluster FROM cc GROUP BY v),
      best AS (
        SELECT cluster, d.doc_id, n_chars,
          count(*) OVER (PARTITION BY cluster) AS cluster_size,
          row_number() OVER (PARTITION BY cluster
            ORDER BY n_chars DESC, d.doc_id) AS rn
        FROM lab JOIN documents d USING (doc_id))
      SELECT cluster, cluster_size,
        doc_id AS keep_id, n_chars AS keep_chars,
        cluster_size - 1 AS n_dropped
      FROM best WHERE rn = 1 AND cluster_size >= 2
      ORDER BY cluster"""))

  // SimHash dimensioning (Manku et al., WWW'07 use 64-bit/k=3): a
  // 60-bit signature (top 60 bits of md5 — 64 would overflow DuckDB's
  // signed-BIGINT hex parse) banded 4×15 bits. Hamming ≤ 3 ⇒ at least
  // one of the 4 bands intact (pigeonhole), and each band now keys
  // 2^15 = 32,768 buckets instead of round-1's 256 — bucket occupancy
  // is N/32768 per band at scale, so the in-bucket pairing stays
  // sub-quadratic far beyond the old 1,024-bucket ceiling.
  private val SimBits = 60
  private val SimBands = 4
  private val SimBandBits = SimBits / SimBands // 15
  private val SimBandMask = (1L << SimBandBits) - 1

  /** SimHash near-dup: 60-bit signature from sign-summed token-hash
    * bits; candidates generated by the 4×15-bit band pigeonhole
    * (hamming ≤ 3 ⇒ at least one intact band), verified with
    * bit_count(xor). The oracle brute-forces all pairs — identical
    * result because the band guarantee is exhaustive at this radius.
    */
  val qSimHash = QueryDef(
    "q_dedup_simhash",
    (s, dir) => {
      val tok = Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"),
          conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
            .as("x"))
      // Exploded (doc, bit) layout instead of 60 parallel sum(when(..))
      // aggregate columns: the wide-aggregate form compiles to a huge
      // generated method (~13 s of one-time Janino compile measured at
      // r2); this shape keeps every generated method small. The 60×
      // row explosion is absorbed by map-side partial aggregation —
      // post-shuffle volume is docs × 60 tiny rows, so the plan scales
      // the same while codegen stays narrow.
      val sums = tok
        .select(col("doc_id"), col("x"),
          explode(expr(s"sequence(0, ${SimBits - 1})")).as("j"))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(expr("2 * (CAST(shiftright(x, j) AS BIGINT) & 1) - 1"))
          .as("bs"))
      val sig = sums.groupBy(col("doc_id"))
        .agg(sum(expr(
          "IF(bs >= 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))"))
          .as("sig"))
      val banded = sig.select(col("doc_id"), col("sig"), explode(array(
          (0 until SimBands).map(b => struct(lit(b).as("b"),
            shiftright(col("sig"), b * SimBandBits)
              .bitwiseAND(SimBandMask).as("v"))): _*))
          .as("bv"))
        .select(col("doc_id"), col("sig"), col("bv.b").as("b"),
          col("bv.v").as("v"))
      banded.as("x").join(banded.as("y"),
          col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long")
            .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val sums = (0 until SimBits).map(j =>
        s"sum(CASE WHEN (x >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(", ")
      val pack = (0 until SimBits).map(j =>
        s"(CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                   FROM documents),
      hx AS (SELECT doc_id,
               CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS x FROM tok),
      sums AS (SELECT doc_id, $sums FROM hx GROUP BY doc_id),
      sig AS (SELECT doc_id, CAST($pack AS BIGINT) AS sig FROM sums)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 3
      ORDER BY doc_a, doc_b"""
    })

  /** Line-level dedup (the RefinedWeb/FineWeb recipe): boilerplate —
    * nav bars, footers, license blurbs — repeats VERBATIM across
    * documents at the line level while whole docs stay unique, so
    * doc-level dedup never sees it. Lines (sentence-split, ≥20 chars
    * to skip connective noise) are hashed to 48-bit integers; a
    * corpus-wide count per line hash marks duplicated lines, joined
    * back to score each doc's duplicated-line share — the signal used
    * to drop or trim boilerplate-heavy docs. Scale shape: one shuffle
    * on the uniform line hash for the count, one co-keyed join back,
    * one doc_id aggregation; no string ever shuffles (8-byte keys).
    */
  val qLineDedup = QueryDef(
    "q_dedup_lines",
    (s, dir) => {
      val lines = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), "\\. ")).as("line"))
        .filter(length(col("line")) >= 20)
        .select(col("doc_id"),
          conv(substring(md5(col("line")), 1, 12), 16, 10)
            .cast("long").as("lh"))
      val counts = lines.groupBy("lh").agg(count(lit(1)).as("cnt"))
      lines.join(counts, "lh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup_lines"))
        .withColumn("dup_share",
          col("n_dup_lines").cast("double") / col("n_lines"))
        .orderBy("doc_id")
    },
    Some("""
      WITH l AS (
        SELECT doc_id, CAST('0x' || substr(md5(ln), 1, 12) AS BIGINT) AS lh
        FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS ln
              FROM documents)
        WHERE len(ln) >= 20),
      c AS (SELECT lh, count(*) AS cnt FROM l GROUP BY lh)
      SELECT doc_id, count(*) AS n_lines,
        CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_lines,
        CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS dup_share
      FROM l JOIN c USING (lh)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Substring-level duplication score (the "dedup training data at
    * the substring level" signal of Lee et al. 2022): for every doc,
    * the share of its word-5-gram positions whose gram also appears in
    * at least one OTHER document, and the longest consecutive run of
    * such positions — a long run means a long verbatim span shared
    * with the rest of the corpus, the unit suffix-array dedup removes.
    *
    * Scale shape: grams carry positions but hash to 8-byte keys at the
    * source; one shuffle keys the gram-df aggregate, one equi-join
    * brings df back to positions, and the run-length (gaps-and-islands
    * row_number) windows partition BY DOC — thousands of small sorted
    * partitions, never a global window. No string leaves the scan
    * stage.
    */
  val qDupSpans = QueryDef(
    "q_dedup_spans",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val grams = Tables.t(s, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(col("toks")) - 4),
            i => struct(i.as("pos"), conv(substring(md5(
              concat_ws(" ", slice(col("toks"), i, lit(5)))), 1, 15), 16, 10)
              .cast("long").as("g")))).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
      // a gram is cross-doc duplicated iff ≥2 distinct docs carry it,
      // i.e. min(doc_id) != max(doc_id) over the gram partition — one
      // pass, one shuffle on the 8-byte gram key, and the gram
      // explode+md5 runs once (the agg+join-back formulation computes
      // it for both join sides)
      val gw = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      val dupPos = grams
        .withColumn("dmin", min(col("doc_id")).over(gw))
        .withColumn("dmax", max(col("doc_id")).over(gw))
        .filter(col("dmin") =!= col("dmax"))
        .select("doc_id", "pos")
      val islands = dupPos
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos"))))
        .groupBy(col("doc_id"), (col("pos") - col("rn")).as("island"))
        .agg(count(lit(1)).as("run"))
        .groupBy(col("doc_id"))
        .agg(sum(col("run")).as("dup_grams"), max(col("run")).as("max_run"))
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          greatest(size(toks) - 4, lit(0)).cast("long").as("n_grams"))
        .join(islands, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
          coalesce(col("max_run"), lit(0L)).as("max_run"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
      gpos AS (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 4)) AS pos
               FROM toks WHERE len(toks) >= 5),
      g AS (SELECT doc_id, pos,
              CAST('0x' || substr(md5(array_to_string(toks[pos:pos+4], ' ')),
                1, 15) AS BIGINT) AS g
            FROM gpos),
      df AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df
                            FROM g GROUP BY g) WHERE df >= 2),
      dup AS (SELECT doc_id, pos,
                row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
              FROM g JOIN df USING (g)),
      isl AS (SELECT doc_id, pos - rn AS island, count(*) AS run
              FROM dup GROUP BY doc_id, pos - rn),
      agg AS (SELECT doc_id, sum(run) AS dup_grams, max(run) AS max_run
              FROM isl GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(greatest(len(string_split(d.text, ' ')) - 4, 0) AS BIGINT)
          AS n_grams,
        CAST(coalesce(agg.dup_grams, 0) AS BIGINT) AS dup_grams,
        CAST(coalesce(agg.max_run, 0) AS BIGINT) AS max_run
      FROM documents d LEFT OUTER JOIN agg ON d.doc_id = agg.doc_id
      ORDER BY d.doc_id"""))

  /** Pairwise source-overlap matrix: shingle-set Jaccard between every
    * pair of sources — the corpus-level diagnostic behind mixture
    * design (two "different" crawls sharing half their shingles are
    * one source for weighting purposes) and leak detection between
    * intended train/eval source splits.
    *
    * Scale shape: the per-source shingle sets dedup FIRST (one shuffle
    * on the 8-byte gram), so the self-join on `sh` fans out at most
    * n_sources rows per key — output and join cost are bounded by
    * distinct-shingles × sources, and the final matrix is
    * C(n_sources, 2) rows. Source count is bounded metadata (20 here),
    * not corpus-sized.
    */
  val qSourceOverlap = QueryDef(
    "q_source_overlap",
    (s, dir) => {
      // cached: the set feeds the size aggregate AND both self-join
      // sides — same idiom as qNgramJaccard's pruned-shingle cache
      val srcSh = shingles(s, dir)
        .join(Tables.t(s, dir, "documents").select("doc_id", "source"),
          "doc_id")
        .select("source", "sh").distinct().cache()
      val sizes = srcSh.groupBy(col("source"))
        .agg(count(lit(1)).as("n_sh"))
      val inter = srcSh.toDF("sa", "sh")
        .join(srcSh.toDF("sb", "sh2"),
          col("sh") === col("sh2") && col("sa") < col("sb"))
        .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.toDF("source_a", "n_a")), "source_a")
        .join(broadcast(sizes.toDF("source_b", "n_b")), "source_b")
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          col("inter"),
          (col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""
      WITH $shinglesSql,
      ss AS (SELECT DISTINCT d.source, sh
             FROM shingle JOIN documents d USING (doc_id)),
      sz AS (SELECT source, count(*) AS n_sh FROM ss GROUP BY source),
      iv AS (SELECT a.source AS source_a, b.source AS source_b,
                    count(*) AS inter
             FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
             GROUP BY 1, 2)
      SELECT source_a, source_b, za.n_sh AS n_a, zb.n_sh AS n_b, inter,
             CAST(inter AS DOUBLE) / (za.n_sh + zb.n_sh - inter)
               AS jaccard
      FROM iv
      JOIN sz za ON za.source = source_a
      JOIN sz zb ON zb.source = source_b
      ORDER BY source_a, source_b"""))

  /** Shingle containment |A∩B| / |A| — the ASYMMETRIC near-dup
    * measure Jaccard misses: a short doc pasted inside a long one
    * scores near 1.0 here but low on Jaccard (the union is dominated
    * by the long doc). The quote/aggregator/boilerplate-wrapper case
    * in corpus dedup. Ordered pairs, so A⊂B and B⊂A report
    * separately.
    *
    * Scale shape: identical to q_dedup_ngram_jaccard — the df-capped
    * shingle equi-join generates candidates (worst key bounded by
    * DfCap², no all-pairs anywhere), one aggregation per ordered pair,
    * set sizes broadcast back. Thresholds (containment ≥ 0.5, |A| ≥
    * 10 pruned shingles) keep the report to genuine engulfment.
    */
  val qContainment = QueryDef(
    "q_dedup_containment",
    (s, dir) => {
      // cacheWide: compute-dense cache (see ngramJaccardPairs)
      val sh = Tables.cacheWide(prunedShingles(s, dir))
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(cnt.toDF("doc_a", "n_a"), "doc_a")
        .filter(col("n_a") >= 10)
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("inter"),
          (col("inter").cast("double") / col("n_a")).as("containment"))
        .filter(col("containment") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH $prunedShinglesSql,
      cnt AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM pruned a JOIN pruned b
          ON a.sh = b.sh AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n AS n_a, inter,
        CAST(inter AS DOUBLE) / n AS containment
      FROM pairs JOIN cnt ON doc_a = doc_id
      WHERE n >= 10 AND CAST(inter AS DOUBLE) / n >= 0.5
      ORDER BY doc_a, doc_b"""))

  /** Blocked edit-distance near-dup: the record-linkage workhorse for
    * short fields (titles, names) where token shingles are too coarse.
    * Classic blocking-key design: candidates = docs sharing an 8-char
    * prefix block, verified with Levenshtein over a 40-char title
    * proxy — O(pairs·40²) DP only on candidates, never all-pairs.
    * Both engines implement unweighted Levenshtein, but DuckDB counts
    * UTF-8 BYTES where Spark counts codepoints — so the compared
    * titles are first projected to printable ASCII (`[ -~]`, the
    * Java∩RE2 class both regex engines treat identically), replacing
    * anything else with `_`; on that domain byte == codepoint and
    * distances hash-match exactly on any corpus, not just ASCII
    * fixtures.
    *
    * Scale shape: a prefix-block equi-join with a block-size cap —
    * blocks holding > 64 docs are boilerplate prefixes and are
    * dropped (the shingle df-cap defense), bounding any one key's
    * fanout at 64² however skewed the corpus; the join stays a hash
    * join. Pairs then verify in a narrow map.
    */
  val qEditDist = QueryDef(
    "q_dedup_editdist",
    (s, dir) => {
      val ascii = regexp_replace(substring(col("text"), 1, 40),
        "[^ -~]", "_")
      val t0 = Tables.t(s, dir, "documents")
        .select(col("doc_id"), ascii.as("title"),
          substring(ascii, 1, 8).as("blk"))
      val okBlk = t0.groupBy("blk").agg(count(lit(1)).as("n"))
        .filter(col("n") <= 64).select("blk")
      val t = t0.join(okBlk, Seq("blk"), "left_semi")
      t.as("a").join(t.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.title"), col("b.title")).cast("long")
            .as("dist"))
        .filter(col("dist") <= 10)
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH t0 AS (
        SELECT doc_id,
          regexp_replace(substr(text, 1, 40), '[^ -~]', '_', 'g')
            AS title,
          substr(regexp_replace(substr(text, 1, 40), '[^ -~]', '_', 'g'),
            1, 8) AS blk
        FROM documents),
      ok AS (SELECT blk FROM t0 GROUP BY blk HAVING count(*) <= 64),
      t AS (SELECT * FROM t0 WHERE blk IN (SELECT blk FROM ok))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        levenshtein(a.title, b.title) AS dist
      FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE levenshtein(a.title, b.title) <= 10
      ORDER BY doc_a, doc_b"""))

  /** MinHash-LSH candidate recall vs the verified Jaccard ground
    * truth, per Jaccard band — the index-quality evaluation a
    * pipeline runs before trusting banded LSH at a new corpus or
    * threshold (the dedup-side twin of q_ann_recall). Truth = the
    * df-capped shingle-join pairs at jacc ≥ 0.2 (q_dedup_ngram_jaccard
    * semantics, exhaustive by construction); found = the pair
    * appearing among the banded-MinHash candidates. Recall should
    * rise with the band: 4×4 banding catches j≈0.2 pairs with
    * moderate probability and j≥0.6 near-certainly.
    *
    * Scale shape: both sides are the existing equi-join pipelines;
    * the evaluation adds one (doc_a, doc_b) hash join and a 5-row
    * aggregation. Banding arithmetic is double division + floor,
    * bit-identical across engines.
    */
  val qMinhashRecall = QueryDef(
    "q_dedup_minhash_recall",
    (s, dir) => {
      val truth = ngramJaccardPairs(s, dir)
      val cand = minHashPairs(s, dir)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("found"))
      truth.join(cand, Seq("doc_a", "doc_b"), "left")
        .select(least(floor(col("jacc") / 0.2), lit(4L)).cast("long")
            .as("band"),
          coalesce(col("found"), lit(0L)).as("found"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_truth"), sum(col("found")).as("n_found"))
        .select(col("band"), col("n_truth"), col("n_found"),
          (col("n_found").cast("double") / col("n_truth")).as("recall"))
        .orderBy("band")
    },
    Some(s"""
      WITH $ngramPairsCtesSql,
      $minHashCoreSql,
      joined AS (
        SELECT CAST(least(floor(t.jacc / 0.2), 4) AS BIGINT) AS band,
          CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END AS found
        FROM tpairs t
        LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM pairs) p
          ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b)
      SELECT band, count(*) AS n_truth,
        CAST(sum(found) AS BIGINT) AS n_found,
        CAST(sum(found) AS DOUBLE) / count(*) AS recall
      FROM joined GROUP BY band ORDER BY band"""))

  /** Incremental (cross-corpus) near-dedup: a NEW ingest batch is
    * deduplicated against the EXISTING corpus without ever re-pairing
    * the corpus with itself — the production shape for a continuously
    * growing 100 TB corpus, where full-corpus self-join dedup per
    * ingest would be quadratic in corpus size over time. Candidate
    * generation is the same banded-MinHash equi-join as
    * q_dedup_minhash_lsh, but one join side is only the new batch: the
    * per-ingest cost is O(batch × bucket occupancy), independent of
    * how many prior batches exist (the corpus-side signatures are
    * precomputed once and reused; at scale they live bucket-
    * partitioned on disk).
    *
    * Fixture split: sources src0..src9 (name length 4) are the
    * standing corpus, src10..src19 the new batch. Output: per new doc
    * with any corpus match at Jaccard ≥ 0.2, the match count, the
    * canonical (min) corpus doc, and the best Jaccard.
    */
  val qIncremental = QueryDef(
    "q_dedup_incremental",
    (s, dir) => {
      val side = Tables.t(s, dir, "documents")
        .select(col("doc_id"), (length(col("source")) <= 4).as("is_old"))
      val sh = shingles(s, dir)
        .select(col("doc_id"), col("sh"), (col("sh") % 4294967296L).as("x"))
        .join(side, "doc_id")
        .cache()
      val mins = minsAggCols
      val mh = sh.groupBy(col("doc_id"), col("is_old"))
        .agg(mins.head, mins.tail: _*)
      val bands = mh.select(col("doc_id"), col("is_old"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"), bandValCol(b).as("v"))): _*)).as("bv"))
        .select(col("doc_id"), col("is_old"),
          col("bv.b").as("b"), col("bv.v").as("v"))
      val cand = bands.filter(!col("is_old")).as("n")
        .join(bands.filter(col("is_old")).as("o"),
          col("n.b") === col("o.b") && col("n.v") === col("o.v"))
        .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
        .distinct()
      val sets = sh.groupBy(col("doc_id"))
        .agg(collect_set(col("sh")).as("set"), count(lit(1)).as("cnt"))
      cand
        .join(sets.select(col("doc_id").as("new_id"), col("set").as("sa"),
          col("cnt").as("na")), "new_id")
        .join(sets.select(col("doc_id").as("old_id"), col("set").as("sb"),
          col("cnt").as("nb")), "old_id")
        .select(col("new_id"), col("old_id"),
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (col("na") + col("nb") -
              size(array_intersect(col("sa"), col("sb"))))).as("jacc"))
        .filter(col("jacc") >= 0.2)
        .groupBy(col("new_id").as("doc_id"))
        .agg(count(lit(1)).as("n_matches"),
          min(col("old_id")).as("canonical_old"),
          max(col("jacc")).as("best_jacc"))
        .orderBy("doc_id")
    },
    Some {
      s"""
      WITH $shinglesSql,
      side AS (SELECT doc_id, length(source) <= 4 AS is_old
               FROM documents),
      hx AS (SELECT s.doc_id, s.sh, s.sh % 4294967296 AS x, d.is_old
             FROM shingle s JOIN side d USING (doc_id)),
      mh AS (SELECT doc_id, is_old, $minsSqlStr FROM hx
             GROUP BY doc_id, is_old),
      bands AS (${bandsUnionSql(", is_old")}),
      cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
               FROM bands n JOIN bands o
                 ON n.b = o.b AND n.v = o.v AND NOT n.is_old AND o.is_old),
      cnt AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
      common AS (
        SELECT c.new_id, c.old_id, count(*) AS cc
        FROM cand c
        JOIN hx a ON a.doc_id = c.new_id
        JOIN hx b ON b.doc_id = c.old_id AND b.sh = a.sh
        GROUP BY 1, 2),
      jacc AS (
        SELECT cand.new_id, cand.old_id,
          CAST(coalesce(cc, 0) AS DOUBLE) /
            (na.n + nb.n - coalesce(cc, 0)) AS jacc
        FROM cand
        LEFT JOIN common ON common.new_id = cand.new_id
                        AND common.old_id = cand.old_id
        JOIN cnt na ON na.doc_id = cand.new_id
        JOIN cnt nb ON nb.doc_id = cand.old_id)
      SELECT new_id AS doc_id, count(*) AS n_matches,
        min(old_id) AS canonical_old, max(jacc) AS best_jacc
      FROM jacc WHERE jacc >= 0.2
      GROUP BY 1 ORDER BY doc_id"""
    })

  /** Keep-latest-per-key (CDC / upsert compaction): collapse the
    * events stream to the newest row per (user_id, event_type), the
    * materialize step every mutable-table-over-log design runs before
    * serving reads. The newest row per key is the struct-MAX over
    * (ts, event_id, payload) — associative, so the whole compaction
    * is ONE pure hash aggregation with map-side partials (the
    * row_number form this replaced sorted every key partition; at
    * changelog scale the map-side combine also collapses most
    * versions before the exchange). `n_versions` reports the
    * collapsed depth per key (update-frequency skew surfaces here).
    */
  val qLatest = QueryDef(
    "q_dedup_latest",
    (s, dir) => {
      Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_versions"),
          max(struct(col("us"), col("event_id"), col("value"))).as("p"))
        .select(col("user_id"), col("event_type"),
          col("p.event_id").as("latest_event_id"),
          col("p.us").as("latest_us"),
          col("p.value").as("latest_value"), col("n_versions"))
        .orderBy("user_id", "event_type")
    },
    Some("""
      WITH r AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value,
          row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn,
          count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
        FROM events)
      SELECT user_id, event_type, event_id AS latest_event_id,
        us AS latest_us, value AS latest_value,
        CAST(n_versions AS BIGINT) AS n_versions
      FROM r WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** Corpus-wide duplicated-chunk removal (the FineWeb "dedup lines
    * across the whole dump" pass, at paragraph granularity): each
    * document is cut into fixed 12-word chunks, a chunk is duplicated
    * when its hash occurs in ≥2 distinct documents, and every
    * duplicated chunk is dropped from every document (the cleaned
    * text is fingerprinted, not shipped). Differs from q_dedup_lines
    * (per-doc internal repetition) and q_dedup_exact (whole-doc): this
    * is the cross-document partial-overlap scrub. Scale shape: chunk
    * hashes are 8-byte keys, the duplicate set comes from one
    * groupBy(hash) with map-side partial counts, and the verdict
    * rejoins on the same hash key — no pairwise comparison anywhere.
    */
  val qParagraphs = QueryDef(
    "q_dedup_paragraphs",
    (s, dir) => {
      val W = 12
      val ch = Tables.t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            expr(s"(size(toks) + ${W - 1}) div $W - 1"))).as("i"),
          col("toks"))
        .select(col("doc_id"), col("i"),
          concat_ws(" ",
            slice(col("toks"), (col("i") * W + 1).cast("int"), lit(W)))
            .as("chunk"))
      val dup = ch.groupBy(md5(col("chunk")).as("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
      ch.join(dup.withColumnRenamed("h", "hh"),
          md5(col("chunk")) === col("hh"), "left")
        .select(col("doc_id"), col("i"), col("chunk"),
          col("hh").isNotNull.as("is_dup"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_chunks"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(when(!col("is_dup"),
              struct(col("i"), col("chunk"))))),
            x => x.getField("chunk")))).as("kept_sig"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          (col("n_dup_chunks").cast("double")
            / col("n_chunks").cast("double")).as("removed_share"),
          col("kept_sig"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      ch AS (
        SELECT doc_id, i,
          array_to_string(toks[CAST(i * 12 + 1 AS INT)
                               : CAST(i * 12 + 12 AS INT)], ' ') AS chunk
        FROM (SELECT doc_id, toks,
                unnest(generate_series(0, (len(toks) + 11) // 12 - 1)) AS i
              FROM toks)),
      dup AS (
        SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS nd
        FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      v AS (
        SELECT ch.doc_id, ch.i, ch.chunk, dup.h IS NOT NULL AS is_dup
        FROM ch LEFT JOIN dup ON md5(ch.chunk) = dup.h)
      SELECT doc_id, count(*) AS n_chunks,
        CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_chunks,
        CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS removed_share,
        md5(coalesce(string_agg(CASE WHEN NOT is_dup THEN chunk END,
          ' ' ORDER BY i), '')) AS kept_sig
      FROM v GROUP BY doc_id ORDER BY doc_id"""))

  /** Soft dedup (frequency down-weighting): instead of dropping
    * duplicates, every copy of a duplicated document gets sampling
    * weight 1/n_copies — the corpus-level token distribution then
    * matches the fully-deduped one in expectation while keeping every
    * source's provenance row intact (the SoftDeDup treatment; hard
    * removal is q_dedup_exact). One groupBy on the content hash with
    * map-side partial counts, verdicts re-joined on the same 8-byte
    * key — identical scale shape to exact dedup, no pairwise work.
    */
  val qSoft = QueryDef(
    "q_dedup_soft",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      val counts = docs.groupBy("h").agg(
        count(lit(1)).as("n_copies"), min(col("doc_id")).as("canon"))
      docs.join(counts, "h")
        .select(col("doc_id"), col("source"), col("h"), col("n_copies"),
          (lit(1.0) / col("n_copies").cast("double")).as("weight"),
          (col("doc_id") === col("canon")).as("is_canonical"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source, md5(text) AS h FROM documents),
      c AS (
        SELECT h, count(*) AS n_copies, min(doc_id) AS canon
        FROM d GROUP BY h)
      SELECT doc_id, source, d.h, n_copies,
        1.0 / CAST(n_copies AS DOUBLE) AS weight,
        doc_id = canon AS is_canonical
      FROM d JOIN c ON d.h = c.h
      ORDER BY doc_id"""))

  /** TTL window for q_dedup_ttl: 1 day of event time, in micros. */
  private val DedupTtlUs = 86400000000L

  /** TTL-windowed exact dedup over the event stream — the BATCH twin
    * of StreamingIngest.dedupExact(stateTtl): a row is a duplicate iff
    * another row with the same content key arrived within the TTL of
    * the PREVIOUS arrival. The streaming side refreshes its event-time
    * timeout on EVERY arrival (dropped duplicates included), so — given
    * watermark progress between arrivals, which a continuous 100 TB
    * ingest always has — expiry is a session GAP, not a fixed horizon
    * from the kept row. That makes the offline replay exactly
    * gaps-and-islands: an island starts where the per-key gap exceeds
    * the TTL, and each island keeps one row (its first).
    * StreamingSpec pins the two implementations to each other on the
    * same scripted arrivals.
    *
    * Scale shape: ONE window sort per content key — the same shuffle a
    * backfill pays for sessionization; no joins, no state store. This
    * is how a bounded-state streaming dedup's output is reproduced
    * offline for an audit, and the island count per key is the state
    * churn the streaming run would have paid.
    */
  /** The gap-island TTL audit over an arbitrary keyed event frame —
    * q_dedup_ttl's core, exposed so the property spec can pin it
    * against a sequential per-key fold on generated arrivals. Input
    * needs `tsCol` (micros) and a unique `idCol` tiebreak; output is
    * one audit row per key: n_events, n_kept, dup_rate.
    */
  private[graft] def ttlIslandAudit(ev: DataFrame, keys: Seq[String],
      tsCol: String, idCol: String, ttlUs: Long): DataFrame = {
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    ev.withColumn("new_island",
        when(lag(col(tsCol), 1).over(wo).isNull ||
          col(tsCol) - lag(col(tsCol), 1).over(wo) > ttlUs, 1L)
          .otherwise(0L))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col("new_island")).as("n_kept"))
      .select(keys.map(col) ++ Seq(col("n_events"), col("n_kept"),
        (lit(1.0) - col("n_kept").cast("double") /
          col("n_events").cast("double")).as("dup_rate")): _*)
  }

  val qTtl = QueryDef(
    "q_dedup_ttl",
    (s, dir) => {
      ttlIslandAudit(
        Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us")),
        Seq("user_id", "event_type"), "us", "event_id", DedupTtlUs)
        .orderBy("user_id", "event_type")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events),
      flagged AS (
        SELECT user_id, event_type,
          CASE WHEN lag(us) OVER w IS NULL
                 OR us - lag(us) OVER w > $DedupTtlUs
               THEN 1 ELSE 0 END AS new_island
        FROM ev
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY us, event_id))
      SELECT user_id, event_type, count(*) AS n_events,
        CAST(sum(new_island) AS BIGINT) AS n_kept,
        1.0 - CAST(sum(new_island) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          AS dup_rate
      FROM flagged GROUP BY user_id, event_type
      ORDER BY user_id, event_type"""))

  /** URL-canonicalization dedup — the FIRST dedup pass of every
    * crawl pipeline: collapse scheme/host case, `www.` prefixes,
    * default ports, trailing slashes, fragments, and tracking query
    * params (`utm_*`, `ref`) into one canonical URL per page, THEN
    * keep one doc per canonical key. Orders of magnitude cheaper than
    * content dedup (pure string ops + one hash shuffle on the
    * canonical key, no shingling) and catches the recrawl/session-id
    * duplicate class content hashing also catches but at 100× the
    * cost.
    *
    * The fixture has no URL column, so a raw URL is SYNTHESIZED
    * deterministically per doc (both engines compute the identical
    * construction — the established fixture-derivation pattern) with
    * the real-world noise classes injected by doc_id residues: case
    * (`HTTPS`, `WWW.…EXAMPLE.COM`), `:443`, trailing `/`, `utm_*`
    * and `ref` params in varying order, `#fragment`. The
    * canonicalizer then PARSES the assembled string — it never sees
    * the parts — so the regex/split surface is honestly exercised.
    * Canonical form: lower scheme+host, no www./default port/
    * trailing slash/fragment, retained query params sorted.
    *
    * Scale shape: one narrow projection per doc (no explode), one
    * hash aggregation on the canonical key, TakeOrdered top-25 audit
    * — the cheapest query in the dedup family at any corpus size.
    */
  val qUrl = QueryDef(
    "q_dedup_url",
    (s, dir) => {
      Tables.t(s, dir, "documents")
        .selectExpr("doc_id", "source",
          "element_at(split(text, ' '), 1) AS p1",
          "CAST(doc_id % 50 AS STRING) AS slug")
        .selectExpr("doc_id",
          """concat(
             CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END,
             '://',
             CASE WHEN doc_id % 3 = 0
               THEN concat('www.', upper(source), '.EXAMPLE.COM')
               ELSE concat(source, '.example.com') END,
             CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
             '/', p1, '/', slug,
             CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
             CASE WHEN doc_id % 4 = 0
               THEN concat('?utm_source=feed&utm_campaign=x&id=', slug)
             WHEN doc_id % 4 = 1 THEN concat('?id=', slug)
             WHEN doc_id % 4 = 2 THEN concat('?ref=tw&id=', slug)
             ELSE '' END,
             CASE WHEN doc_id % 11 = 0 THEN '#sec2' ELSE '' END) AS url""")
        .selectExpr("doc_id", "url",
          "regexp_replace(url, '#.*$', '') AS u0")
        .selectExpr("doc_id", "url",
          "lower(regexp_extract(u0, '^([A-Za-z]+)://', 1)) AS scheme",
          "regexp_replace(u0, '^[A-Za-z]+://', '') AS rest")
        .selectExpr("doc_id", "url", "scheme",
          "regexp_replace(regexp_replace(" +
            "lower(split_part(rest, '/', 1)), '^www[.]', '')," +
            " ':(443|80)$', '') AS host",
          "substring(rest, length(split_part(rest, '/', 1)) + 1) AS pathq")
        .selectExpr("doc_id", "url", "scheme", "host",
          "regexp_replace(split_part(pathq, '?', 1), '/$', '') AS path",
          "CASE WHEN pathq LIKE '%?%' THEN split_part(pathq, '?', 2)" +
            " ELSE '' END AS qs")
        .selectExpr("doc_id", "url", "scheme", "host", "path",
          """array_join(array_sort(filter(split(qs, '&'),
               p -> substring(p, 1, 4) NOT IN ('utm_', 'ref=')
                    AND p != '')), '&') AS params""")
        .selectExpr("doc_id", "url",
          """concat(scheme, '://', host, path,
             CASE WHEN params != '' THEN concat('?', params)
                  ELSE '' END) AS canonical_url""")
        .groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_raw_forms"),
          min(col("doc_id")).as("keeper"))
        .orderBy(col("n_docs").desc, col("canonical_url"))
        .limit(25)
    },
    Some("""
      WITH raw AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END
          || '://'
          || CASE WHEN doc_id % 3 = 0
               THEN 'www.' || upper(source) || '.EXAMPLE.COM'
               ELSE source || '.example.com' END
          || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
          || '/' || string_split(text, ' ')[1]
          || '/' || CAST(doc_id % 50 AS VARCHAR)
          || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
          || CASE WHEN doc_id % 4 = 0
               THEN '?utm_source=feed&utm_campaign=x&id='
                    || CAST(doc_id % 50 AS VARCHAR)
             WHEN doc_id % 4 = 1
               THEN '?id=' || CAST(doc_id % 50 AS VARCHAR)
             WHEN doc_id % 4 = 2
               THEN '?ref=tw&id=' || CAST(doc_id % 50 AS VARCHAR)
             ELSE '' END
          || CASE WHEN doc_id % 11 = 0 THEN '#sec2' ELSE '' END AS url
        FROM documents),
      s0 AS (
        SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u0
        FROM raw),
      s1 AS (
        SELECT doc_id, url,
          lower(regexp_extract(u0, '^([A-Za-z]+)://', 1)) AS scheme,
          regexp_replace(u0, '^[A-Za-z]+://', '') AS rest
        FROM s0),
      s2 AS (
        SELECT doc_id, url, scheme,
          regexp_replace(regexp_replace(
            lower(split_part(rest, '/', 1)), '^www[.]', ''),
            ':(443|80)$', '') AS host,
          substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
        FROM s1),
      s3 AS (
        SELECT doc_id, url, scheme, host,
          regexp_replace(split_part(pathq, '?', 1), '/$', '') AS path,
          CASE WHEN pathq LIKE '%?%' THEN split_part(pathq, '?', 2)
               ELSE '' END AS qs
        FROM s2),
      s4 AS (
        SELECT doc_id, url, scheme, host, path,
          array_to_string(list_sort(list_filter(string_split(qs, '&'),
            p -> substr(p, 1, 4) NOT IN ('utm_', 'ref=')
                 AND p <> '')), '&') AS params
        FROM s3),
      canon AS (
        SELECT doc_id, url,
          scheme || '://' || host || path
          || CASE WHEN params <> '' THEN '?' || params ELSE '' END
            AS canonical_url
        FROM s4)
      SELECT canonical_url, count(*) AS n_docs,
        count(DISTINCT url) AS n_raw_forms,
        min(doc_id) AS keeper
      FROM canon GROUP BY 1
      ORDER BY n_docs DESC, canonical_url LIMIT 25"""))

  /** Bloom-filter incremental dedup audit — the membership test that
    * replaces the new-batch × historical-corpus join at 100 TB. The
    * historical docs (same `length(source) <= 4` split as
    * [[qIncremental]]) fold into a 2^18-bit bloom (k=3 md5-slice
    * positions, 32 bits per BIGINT word so no engine disagrees about
    * the sign bit) via a mergeable `bit_or` aggregation — the bloom is
    * 32 KB REGARDLESS of corpus age, broadcastable to every executor,
    * and maintained incrementally by OR-ing each sealed batch's
    * partial. New docs probe it with a broadcast join; only
    * bloom-positive docs would proceed to the exact historical
    * lookup, so the per-batch cost is independent of history size.
    *
    * This query is the AUDIT of that contract: it also runs the exact
    * membership join (the thing production skips) and reports, per
    * language, the flagged count, the true-dup count, the false
    * positives, and the measured FP rate — plus the structural
    * guarantee to assert on: a bloom NEVER false-negatives, so
    * n_flagged ≥ n_true_dup with every true dup flagged.
    *
    * All counts integer; fp_rate is one final int/int double division
    * (the [[GraphOps]] parity discipline).
    */
  val qBloom = QueryDef(
    "q_dedup_bloom",
    (s, dir) => {
      val M = 262144L // 2^18 bloom bits, 32 per word
      val docs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), md5(col("text")).as("d"),
          (length(col("source")) <= 4).as("is_old"))
      val pos = docs
        .withColumn("r", explode(array(lit(0), lit(1), lit(2))))
        .select(col("doc_id"), col("lang"), col("is_old"), col("d"),
          (conv(col("d").substr(lit(1) + lit(10) * col("r"), lit(10)),
            16, 10).cast("long") % M).as("p"))
        .selectExpr("doc_id", "lang", "is_old", "d",
          "p div 32 AS word", "CAST(p % 32 AS INT) AS bit")
      val bloom = pos.filter(col("is_old"))
        .groupBy("word")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("wbits"))
      val probed = pos.filter(!col("is_old"))
        .join(broadcast(bloom), Seq("word"), "left")
        .selectExpr("doc_id", "lang", "d",
          "CASE WHEN wbits IS NULL THEN 0" +
            " ELSE CAST(shiftright(wbits, bit) & 1 AS INT) END AS hit")
        .groupBy("doc_id", "lang", "d")
        .agg(min("hit").as("flagged"))
      val histD = docs.filter(col("is_old"))
        .select(col("d")).distinct().withColumn("seen", lit(1))
      probed.join(histD, Seq("d"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_new"),
          sum(col("flagged")).as("n_flagged"),
          sum(coalesce(col("seen"), lit(0))).as("n_true_dup"),
          sum(when(col("flagged") === 1 && col("seen").isNull, 1L)
            .otherwise(0L)).as("n_false_pos"))
        .selectExpr("lang", "n_new", "n_flagged", "n_true_dup",
          "n_false_pos",
          "CASE WHEN n_new = n_true_dup THEN CAST(0 AS DOUBLE)" +
            " ELSE CAST(n_false_pos AS DOUBLE)" +
            " / CAST(n_new - n_true_dup AS DOUBLE) END AS fp_rate")
        .orderBy("lang")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, lang, md5(text) AS d,
          length(source) <= 4 AS is_old
        FROM documents),
      pos AS (
        SELECT doc_id, lang, is_old, d,
          CAST('0x' || substr(d, CAST(1 + 10 * r AS BIGINT), 10)
            AS BIGINT) % 262144 AS p
        FROM docs CROSS JOIN (SELECT unnest(range(0, 3)) AS r)),
      cells AS (
        SELECT doc_id, lang, is_old, d,
          p // 32 AS word, CAST(p % 32 AS INT) AS bit
        FROM pos),
      bloom AS (
        SELECT word,
          CAST(bit_or(CAST(1 AS BIGINT) << bit) AS BIGINT) AS wbits
        FROM cells WHERE is_old GROUP BY 1),
      probed AS (
        SELECT doc_id, lang, d,
          CAST(min(CASE WHEN wbits IS NULL THEN 0
            ELSE CAST((wbits >> bit) & 1 AS INT) END) AS INT) AS flagged
        FROM cells LEFT JOIN bloom USING (word)
        WHERE NOT is_old GROUP BY 1, 2, 3),
      hist AS (SELECT DISTINCT d, 1 AS seen FROM docs WHERE is_old),
      joined AS (
        SELECT probed.*, hist.seen
        FROM probed LEFT JOIN hist USING (d)),
      agg AS (
        SELECT lang, count(*) AS n_new,
          CAST(sum(flagged) AS BIGINT) AS n_flagged,
          CAST(sum(COALESCE(seen, 0)) AS BIGINT) AS n_true_dup,
          CAST(sum(CASE WHEN flagged = 1 AND seen IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
        FROM joined GROUP BY 1)
      SELECT lang, n_new, n_flagged, n_true_dup, n_false_pos,
        CASE WHEN n_new = n_true_dup THEN CAST(0 AS DOUBLE)
          ELSE CAST(n_false_pos AS DOUBLE)
            / CAST(n_new - n_true_dup AS DOUBLE) END AS fp_rate
      FROM agg ORDER BY lang"""))

  /** Content-defined chunking (CDC) dedup — split each document at
    * positions the CONTENT chooses (a token whose hash ≡ 0 mod 16
    * ends a chunk, expected chunk ≈ 16 tokens), then dedup at chunk
    * granularity across the corpus. Because boundaries depend only on
    * local content, an insertion or deletion reshapes ONE chunk and
    * leaves the rest byte-identical — the property that lets CDC find
    * shared material fixed-width sliding windows ([[qDupSpans]])
    * re-discover at every offset, at 1/w the chunk count. This is the
    * rolling-hash chunking of storage dedup (LBFS/Venti lineage)
    * applied to corpus curation; the min/max chunk-size clamps of
    * production CDC (FastCDC) are deliberately omitted — they
    * reintroduce boundary-shift coupling and the pure hash-test core
    * is the part that matters for cross-doc dedup.
    *
    * Output: the per-doc audit — chunk count, chunks shared with at
    * least one OTHER doc, and the shared ratio — top 25 by ratio.
    *
    * Scale shape: the chunking is ARRAY-NATIVE — boundary tokens are
    * marked in place (append chr(1)) and the re-joined string is
    * re-split on the marker, so a document never explodes to token
    * rows and the chunk derivation needs NO shuffle at all (the first
    * cut of this query window-aggregated exploded tokens: 43 MB of
    * 10×-smoke shuffle and two full token-stream exchanges — all of
    * it gone). Only chunk rows (~1/16 the tokens) move, keyed by the
    * chunk hash for the sharing aggregation. Linear at any corpus
    * size.
    */
  val qCdc = QueryDef(
    "q_dedup_cdc",
    (s, dir) => {
      val chunks = Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("""filter(split(
            array_join(transform(
              filter(split(text, ' '), t -> t != ''),
              t -> IF(CAST(conv(substring(md5(t), 1, 15), 16, 10)
                        AS BIGINT) % 16 = 0,
                      concat(t, chr(1)), t)), ' '),
            concat(chr(1), ' ?')), c -> c != '')"""))
            .as("cstr"))
        .select(col("doc_id"), md5(col("cstr")).as("ch"))
      val sharing = chunks.groupBy("ch")
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunks.join(sharing, "ch")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .selectExpr("doc_id", "n_chunks", "n_shared",
          "CAST(n_shared AS DOUBLE) / CAST(n_chunks AS DOUBLE)" +
            " AS shared_ratio")
        .orderBy(col("shared_ratio").desc, col("doc_id"))
        .limit(25)
    },
    Some("""
      WITH marked AS (
        SELECT doc_id,
          list_filter(string_split_regex(
            array_to_string(list_transform(
              list_filter(string_split(text, ' '), t -> t <> ''),
              t -> CASE WHEN CAST('0x' || substr(md5(t), 1, 15)
                     AS BIGINT) % 16 = 0
                   THEN t || chr(1) ELSE t END), ' '),
            chr(1) || ' ?'), c -> c <> '') AS cs
        FROM documents),
      chunks AS (
        SELECT doc_id, md5(unnest(cs)) AS ch FROM marked),
      sharing AS (
        SELECT ch, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY 1)
      SELECT doc_id, count(*) AS n_chunks,
        CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_shared,
        CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS shared_ratio
      FROM chunks JOIN sharing USING (ch)
      GROUP BY doc_id
      ORDER BY shared_ratio DESC, doc_id LIMIT 25"""))

  val all: Seq[QueryDef] =
    Seq(qExact, qNgramJaccard, qMinHashLsh, qSimHash, qClusters,
      qLineDedup, qDupSpans, qSourceOverlap, qContainment, qEditDist,
      qIncremental, qMinhashRecall, qLatest, qParagraphs, qSoft,
      qKeepBest, qTtl, qMinHashNative, qClusterAudit, qUrl, qBloom,
      qCdc)
}
