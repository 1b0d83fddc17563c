package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Parity.{dsum, dsumSql}

import graft.functions.GraftFunctions

/** Similarity search + embedding near-dup over `embeddings`
  * (`Array[Float]`, 64-dim) — brute-force cosine as the correctness
  * baseline, LSH-bucketed variants as the scale path (bucket
  * equi-join instead of all-pairs), and an IVF cell probe with a
  * deterministic coarse quantizer.
  *
  * The dot-product kernel is the fused codegen expression
  * [[graft.functions.DotProduct]] (~50× over the interpreted
  * higher-order-function formulation at bench scale), and per-vector
  * norms are computed once, not per pair.
  *
  * Cross-engine determinism: dot products and L2 distances are
  * left-to-right folds of float→double casts in both engines (a Java
  * loop here, DuckDB `list_reduce` there — same operation order), so
  * cosines and centroid assignments are bit-identical.
  */
object Similarity {

  /** Per-vector prep: id, embedding, norm — computed once. */
  private def vectors(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val d = GraftFunctions.dotp(col("embedding"), col("embedding"))
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(d).as("nrm"))
  }

  private def pairCos(dot: Column, na: Column, nb: Column): Column =
    dot / (na * nb)

  /** DuckDB: same fold, same order. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
         for i in generate_series(1, 64)]), (acc, v) -> acc + v)"""

  private val vectorsSql: String = s"""
    vectors AS (SELECT vec_id, embedding,
      sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)"""

  /** The all-pairs baseline refuses to run above this many vectors:
    * O(n²) compares are the point at fixture scale (it IS the oracle
    * ground truth) and a scale-killer anywhere else — the production
    * pair generator is q_embed_pairs_lsh.
    */
  private val BruteForceMaxRows = 100000L

  /** Embedding-cosine near-dup pairs (threshold 0.4). Brute-force
    * all-pairs as the oracle-checked, fixture-scale-only baseline
    * (hard row-count gate); the canonical scale path is
    * q_embed_pairs_lsh below. The smaller side is broadcast so the
    * pair generation never shuffles the big side.
    */
  val qCosinePairs = QueryDef(
    "q_embed_cosine_pairs",
    (s, dir) => {
      val e = vectors(s, dir)
      // footer-metadata count: no extra Spark job per execution
      val n = Tables.rowCount(s, dir, "embeddings")
      require(n <= BruteForceMaxRows,
        s"q_embed_cosine_pairs is the O(n²) fixture-scale baseline " +
          s"($n rows > $BruteForceMaxRows); use q_embed_pairs_lsh at scale")
      val a = e.toDF("id_a", "emb_a", "nrm_a")
      val b = e.toDF("id_b", "emb_b", "nrm_b")
      a.join(broadcast(b), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          pairCos(GraftFunctions.dotp(col("emb_a"), col("emb_b")),
            col("nrm_a"), col("nrm_b")).as("cos"))
        .filter(col("cos") > 0.4)
        .orderBy("id_a", "id_b")
    },
    Some(s"""
      WITH $vectorsSql
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
      FROM vectors a JOIN vectors b ON a.vec_id < b.vec_id
      WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) > 0.4
      ORDER BY id_a, id_b"""))

  /** Brute-force cosine top-k (k=5) for a query set (vec_id < 5):
    * the correctness baseline for ANN. The query side is broadcast;
    * ranking shuffles only (query, cos) pairs.
    */
  val qAnnTopK = QueryDef(
    "q_ann_topk",
    (s, dir) => {
      val e = vectors(s, dir)
      val q = e.filter(col("vec_id") < 5).toDF("query_id", "q_emb", "q_nrm")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      // an explicit Cross against the bounded 5-row broadcast (the
      // documented brute-force-baseline shape): a `=!=` join condition
      // would plan the SAME nested loop but print as Inner, which plan
      // audits can't tell apart from a degraded equi-join
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select("query_id", "vec_id", "cos", "rnk")
        .orderBy("query_id", "rnk")
    },
    Some(s"""
      WITH $vectorsSql
      SELECT query_id, vec_id, cos, rnk FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
          ${dotSql("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos,
          CAST(row_number() OVER (PARTITION BY q.vec_id
            ORDER BY ${dotSql("q.embedding", "e.embedding")} /
                       (q.nrm * e.nrm) DESC,
                     e.vec_id) AS BIGINT) AS rnk
        FROM vectors q JOIN vectors e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < 5)
      WHERE rnk <= 5 ORDER BY query_id, rnk"""))

  // ---------------------------------------------- adaptive LSH sizing
  //
  // Bucket counts are DERIVED from the corpus size, not fixed: the
  // smallest b with 2^b buckets holding the table at the target mean
  // occupancy, clamped to [minBits, MaxBits]. Integer arithmetic only
  // — the DuckDB oracle derives the identical value, and a float
  // log2() can differ by 1 ulp across engines exactly at power-of-two
  // boundaries. At the fixture SFs (500–2000 vectors) this reproduces
  // the previously hand-tuned constants (6 ann bits / 5 pair bits);
  // at 1e9 vectors it yields 25 ann bits — occupancy, and therefore
  // per-bucket join cost, stays constant as the corpus grows.
  private[graft] def derivedBits(n: Long, minBits: Int,
      occupancy: Long): Int = {
    var b = minBits
    while (b < MaxBits && (1L << b) * occupancy < n) b += 1
    b
  }

  /** Spark-side ceiling: 2^30 buckets ≈ 3·10^10 vectors at occupancy
    * 32 — past that the knob saturates (documented, not silent: bucket
    * occupancy starts growing linearly again).
    */
  private val MaxBits = 30

  /** Oracle-side ceiling: the SQL mirror must UNROLL the signature
    * terms, so it computes a fixed `MaxSqlBits`-bit signature and
    * masks down to the derived width. Derivations agree exactly for
    * n ≤ 2^16 · occupancy (≥ 2M vectors — three orders of magnitude
    * above any fixture; DuckDB could not check beyond that anyway).
    */
  private val MaxSqlBits = 16

  /** DuckDB twin of [[derivedBits]]: min b in [minBits, MaxSqlBits]
    * with (1<<b)·occupancy ≥ count, else MaxSqlBits — pure-integer
    * scan of the candidate range, no floating log.
    */
  private def bitsSql(minBits: Int, occupancy: Long): String =
    s"""(SELECT min(b) FROM
          (SELECT unnest(generate_series($minBits, $MaxSqlBits)) AS b),
          (SELECT count(*) AS n FROM vectors) c
        WHERE (CAST(1 AS BIGINT) << b) * $occupancy >= c.n
           OR b = $MaxSqlBits)"""

  /** q_ann_lsh target: ~32 vectors per bucket. */
  private val AnnOccupancy = 32L
  private val MinAnnBits = 6

  // Random-hyperplane signature; integer hyperplane weights
  // w[i][j] = ((i*131 + j*31 + 7) % 211) - 105 are exact in both
  // engines, so bucket ids are bit-identical. (Multi-table LSH lives
  // in hplaneWeights below — a linear seed here would leave tables
  // correlated, so there is deliberately no seed knob.)

  // Hyperplane weights are compile-time constants, so the signature
  // dot products run through the fused codegen kernel against literal
  // float arrays (integers ≤211 are exact in float, so the fold is
  // still bit-identical to the DuckDB list_reduce mirror) instead of
  // an interpreted aggregate() fold — ~7× on the signature stage.
  private def bucketWeights(i: Int): Array[Float] =
    Array.tabulate(64)(j => ((i * 131 + j * 31 + 7) % 211 - 105).toFloat)

  private def bucketCol(emb: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      val d = GraftFunctions.dotp(emb, typedlit(bucketWeights(i)))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Full MaxSqlBits-wide signature; callers mask to the derived
    * width (`% (1 << bits)` keeps the low bits — exactly the terms
    * the Spark side computed).
    */
  private def bucketSql(emb: String): String = {
    (0 until MaxSqlBits).map { i =>
      val d = s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [CAST($emb[j + 1] AS DOUBLE) *
         CAST((($i * 131 + j * 31 + 7) % 211) - 105 AS DOUBLE)
         for j in generate_series(0, 63)]), (acc, v) -> acc + v)"""
      s"(CASE WHEN $d >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** LSH-bucketed ANN — signature computation is a narrow map,
    * candidates come from a bucket equi-join, and the exact cosine
    * runs on same-bucket pairs only. The bucket count is derived from
    * the corpus row count (footer metadata, no extra job) so mean
    * occupancy stays ~[[AnnOccupancy]] from sf0.001 through 10^10
    * vectors. Emits each vector's nearest same-bucket neighbor.
    */
  val qAnnLsh = QueryDef(
    "q_ann_lsh",
    (s, dir) => {
      val nBits = derivedBits(Tables.rowCount(s, dir, "embeddings"),
        MinAnnBits, AnnOccupancy)
      val e = vectors(s, dir)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          bucketCol(col("embedding"), nBits).as("bucket"))
      val a = e.toDF("vec_id", "emb_a", "nrm_a", "bucket")
      val b = e.toDF("nbr_id", "emb_b", "nrm_b", "bucket")
      // per-vector argmax as a struct-max (cos desc, nbr_id asc via
      // negation) — one hash aggregation, no sort of the bucket
      // candidate set
      a.join(b, Seq("bucket"))
        .filter(col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("bucket"), col("nbr_id"),
          pairCos(GraftFunctions.dotp(col("emb_a"), col("emb_b")),
            col("nrm_a"), col("nrm_b")).as("cos"))
        .groupBy("vec_id", "bucket")
        .agg(max(struct(col("cos"), (-col("nbr_id")).as("nnbr"))).as("p"))
        .select(col("vec_id"), col("bucket"),
          (-col("p.nnbr")).as("nbr_id"), col("p.cos").as("cos"))
        .orderBy("vec_id")
    },
    Some(s"""
      WITH $vectorsSql,
      nb AS (SELECT ${bitsSql(MinAnnBits, AnnOccupancy)} AS bits),
      sig AS (
        SELECT vec_id, embedding, nrm,
          CAST(${bucketSql("embedding")} AS BIGINT) %
            (CAST(1 AS BIGINT) << (SELECT bits FROM nb)) AS bucket
        FROM vectors)
      SELECT vec_id, bucket, nbr_id, cos FROM (
        SELECT a.vec_id, a.bucket, b.vec_id AS nbr_id,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos,
          row_number() OVER (PARTITION BY a.vec_id
            ORDER BY ${dotSql("a.embedding", "b.embedding")} /
                       (a.nrm * b.nrm) DESC,
                     b.vec_id) AS rnk
        FROM sig a JOIN sig b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
      WHERE rnk = 1 ORDER BY vec_id"""))

  // Multi-table LSH: L independent hyperplane tables; a pair is a
  // candidate if it collides in ANY table, so the per-pair miss rate
  // is (1 - p^b)^LshTables while every join stays a bucket equi-join.
  // The fixture's true pairs live at cos 0.4–0.6 (hyperplane
  // agreement p ≈ 0.65), the hardest LSH regime, hence the E2LSH-style
  // wide-OR: 16 tables of 5-bit signatures → measured recall 0.86
  // (sf0.001) / 0.75 (sf0.01) vs brute force. The per-table bit width
  // is derived from the corpus size (constant [[PairOccupancy]] mean
  // bucket occupancy → constant per-table join cost as N grows).
  // LshTables stays a constant: it is the RECALL knob, not a scale
  // knob — to hold recall R as b widens, L must track
  // ln(1-R)/ln(1-p^b), a cost-vs-recall policy choice the caller
  // owns, not something to silently re-derive.
  private val LshTables = 16
  private val MinPairBits = 5

  /** Per-table target: ~64 vectors per bucket. */
  private val PairOccupancy = 64L

  // Hyperplane weights must be INDEPENDENT across tables — a linear
  // formula in (i, j, table) leaves the tables correlated and the
  // union of candidates stops growing (measured: recall flat at 0.24
  // from L=3 to L=4). Knuth-style multiplicative hashing decorrelates
  // them; all arithmetic is exact BIGINT, identical in both engines.
  private def hplaneWeights(table: Int, i: Int): Array[Float] =
    Array.tabulate(64) { j =>
      (((i.toLong * 1000003L + j.toLong * 7919L +
        table.toLong * 104729L + 12345L) * 2654435761L %
        1000000007L) % 211L - 105L).toFloat
    }

  private def hplaneCol(emb: Column, table: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      val d = GraftFunctions.dotp(emb, typedlit(hplaneWeights(table, i)))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Full MaxSqlBits-wide per-table signature (mask to derived width
    * at the use site, like [[bucketSql]]).
    */
  private def hplaneSql(emb: String, table: Int): String = {
    (0 until MaxSqlBits).map { i =>
      val d = s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [CAST($emb[j + 1] AS DOUBLE) *
         CAST(((($i*1000003 + j*7919 + $table*104729 + 12345)
                * 2654435761) % 1000000007) % 211 - 105 AS DOUBLE)
         for j in generate_series(0, 63)]), (acc, v) -> acc + v)"""
      s"(CASE WHEN $d >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Canonical near-dup pair generator — the scale path that replaces
    * the all-pairs baseline: 16 independent 5-bit hyperplane tables,
    * candidates = union of per-table bucket collisions (distinct),
    * then the exact cosine verifies each candidate once. No all-pairs
    * join anywhere in the plan (PlanSpec asserts no
    * BroadcastNestedLoopJoin); shuffles carry 16 band rows per vector
    * plus the candidate set.
    */
  /** The multi-table LSH candidate pair set (id_a < id_b, distinct) —
    * shared by the pair generator and the recall evaluator.
    */
  private def lshCandidates(s: SparkSession, dir: String): DataFrame = {
    val nBits = derivedBits(Tables.rowCount(s, dir, "embeddings"),
      MinPairBits, PairOccupancy)
    val e = vectors(s, dir)
    // One packed int64 join key `k = v·L + t` instead of the (t, v)
    // column pair: the bucket value is < 2^nBits and t < LshTables,
    // so the packing is bijective and the exchange rows shrink to
    // (vec_id, k) — 16 B of key+payload per band row where the
    // two-column key carried 20 B and hashed twice. Both join inputs
    // are the SAME plan, so the sort-merge join reuses one exchange
    // (PlanSpec asserts the ReusedExchange) — the band table is
    // shuffled once, not twice.
    val sig = e.select(col("vec_id"), explode(array(
        (0 until LshTables).map(l =>
          hplaneCol(col("embedding"), l, nBits) * LshTables + l): _*))
        .as("k"))
    sig.as("x").join(sig.as("y"),
        col("x.k") === col("y.k") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
      // session-cached like the graph family's edge list (cache() is
      // idempotent by canonicalized plan): three consumers share the
      // candidate pair pool — q_embed_pairs_lsh, q_pairs_contrastive,
      // q_pairs_hardneg — and each re-derived the band self-join from
      // scratch, the dominant cost of all three. The pair frame is
      // (id_a, id_b) only (16 B/row); Bench's family-boundary purge
      // clears it with the family.
      .cache()
  }

  /** WITH-clause prefix producing the `cand` CTE of [[lshCandidates]]
    * in DuckDB (vectors, derived bits, per-table signatures, bands).
    */
  private val lshCandWithSql: String = {
    val sigCols = (0 until LshTables).map(l =>
      s"""CAST(${hplaneSql("embedding", l)} AS BIGINT) %
          (CAST(1 AS BIGINT) << (SELECT bits FROM nb)) AS b$l""")
      .mkString(", ")
    val bands = (0 until LshTables).map(l =>
      s"SELECT vec_id, $l AS t, b$l AS v FROM sig")
      .mkString(" UNION ALL ")
    s"""$vectorsSql,
      nb AS (SELECT ${bitsSql(MinPairBits, PairOccupancy)} AS bits),
      sig AS (SELECT vec_id, $sigCols FROM vectors),
      bands AS ($bands),
      cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
               FROM bands x JOIN bands y
                 ON x.t = y.t AND x.v = y.v AND x.vec_id < y.vec_id)"""
  }

  val qEmbedPairsLsh = QueryDef(
    "q_embed_pairs_lsh",
    (s, dir) => {
      val e = vectors(s, dir)
      lshCandidates(s, dir)
        .join(e.toDF("id_a", "emb_a", "nrm_a"), "id_a")
        .join(e.toDF("id_b", "emb_b", "nrm_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          pairCos(GraftFunctions.dotp(col("emb_a"), col("emb_b")),
            col("nrm_a"), col("nrm_b")).as("cos"))
        .filter(col("cos") > 0.4)
        .orderBy("id_a", "id_b")
    },
    Some(s"""
      WITH $lshCandWithSql
      SELECT id_a, id_b, cos FROM (
        SELECT cand.id_a, cand.id_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM cand
        JOIN vectors a ON a.vec_id = cand.id_a
        JOIN vectors b ON b.vec_id = cand.id_b)
      WHERE cos > 0.4 ORDER BY id_a, id_b"""))

  /** LSH recall evaluation: joins the brute-force ground-truth pair
    * set (cos > 0.4, the hard-gated baseline) against the LSH
    * candidate set and reports hit counts and recall per 0.1-wide
    * cosine band — the index-quality measurement a pipeline runs
    * before trusting an ANN path, here oracle-checked cross-engine
    * (cosines are bit-identical, so band edges and counts agree
    * exactly). Fixture-gated like the baseline it consumes.
    */
  val qAnnRecall = QueryDef(
    "q_ann_recall",
    (s, dir) => {
      val truth = qCosinePairs.run(s, dir)
        .select(col("id_a"), col("id_b"),
          least(floor((col("cos") - 0.4) / 0.1), lit(2))
            .cast("int").as("band"))
      val cand = lshCandidates(s, dir).withColumn("hit", lit(1L))
      truth.join(cand, Seq("id_a", "id_b"), "left")
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
        .select(col("band"), col("n_true"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_true")).as("recall"))
        .orderBy("band")
    },
    Some(s"""
      WITH $lshCandWithSql,
      bf AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM vectors a JOIN vectors b ON a.vec_id < b.vec_id
        WHERE ${dotSql("a.embedding", "b.embedding")} /
          (a.nrm * b.nrm) > 0.4)
      SELECT band, count(*) AS n_true,
        CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hit,
        CAST(coalesce(sum(hit), 0) AS DOUBLE) / count(*) AS recall
      FROM (
        SELECT CAST(least(floor((bf.cos - 0.4) / 0.1), 2) AS INT)
                 AS band,
               CASE WHEN cand.id_a IS NOT NULL THEN 1 END AS hit
        FROM bf LEFT JOIN cand
          ON bf.id_a = cand.id_a AND bf.id_b = cand.id_b)
      GROUP BY band ORDER BY band"""))

  /** Retrieval ranking quality of the production LSH path: for each
    * query vector, the rank of the first same-`label` neighbor inside
    * the bucketed top-10 and its reciprocal (the per-query term of
    * MRR — the ranking metric reported alongside recall before
    * trusting an ANN index for retrieval). Label match is the graded
    * relevance the fixture supports; 1/rank for rank ∈ 1..10 is an
    * exact IEEE division, so no cross-engine log-discount drift (the
    * reason this is MRR and not NDCG's log2 discount).
    *
    * Scale shape: identical to q_ann_lsh — a narrow signature map, a
    * bucket equi-join whose occupancy is held constant by the derived
    * bit width, and a per-query top-10 window over same-bucket
    * candidates only. The query set is a filter, so evaluating more
    * queries widens the window input linearly, never quadratically.
    * Queries whose bucket holds no other vector drop out (no
    * retrieval ⇒ no rank to score) — identically in both engines.
    */
  val qAnnMrr = QueryDef(
    "q_ann_mrr",
    (s, dir) => {
      val nBits = derivedBits(Tables.rowCount(s, dir, "embeddings"),
        MinAnnBits, AnnOccupancy)
      val lab = Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val e = vectors(s, dir)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          bucketCol(col("embedding"), nBits).as("bucket"))
      val q = e.filter(col("vec_id") < 20)
        .toDF("query_id", "q_emb", "q_nrm", "bucket")
        .join(lab.toDF("query_id", "q_label"), "query_id")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("nbr_id"))
      e.toDF("nbr_id", "emb_b", "nrm_b", "bucket")
        .join(broadcast(q), Seq("bucket"))
        .filter(col("nbr_id") =!= col("query_id"))
        .select(col("query_id"), col("q_label"), col("nbr_id"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("emb_b")),
            col("q_nrm"), col("nrm_b")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .join(lab.toDF("nbr_id", "n_label"), "nbr_id")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_ret"),
          min(when(col("n_label") === col("q_label"), col("rnk")))
            .as("first_rel"))
        .select(col("query_id"), col("n_ret"),
          coalesce(col("first_rel"), lit(0L)).as("first_rel"),
          coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"))
        .orderBy("query_id")
    },
    Some(s"""
      WITH $vectorsSql,
      nb AS (SELECT ${bitsSql(MinAnnBits, AnnOccupancy)} AS bits),
      sig AS (
        SELECT vec_id, embedding, nrm,
          CAST(${bucketSql("embedding")} AS BIGINT) %
            (CAST(1 AS BIGINT) << (SELECT bits FROM nb)) AS bucket
        FROM vectors),
      lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
              FROM embeddings),
      ranked AS (
        SELECT query_id, q_label, nbr_id, rnk FROM (
          SELECT q.vec_id AS query_id, ql.label AS q_label,
            e.vec_id AS nbr_id,
            CAST(row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${dotSql("q.embedding", "e.embedding")} /
                         (q.nrm * e.nrm) DESC,
                       e.vec_id) AS BIGINT) AS rnk
          FROM sig q
          JOIN lab ql ON ql.vec_id = q.vec_id
          JOIN sig e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
          WHERE q.vec_id < 20)
        WHERE rnk <= 10)
      SELECT query_id, count(*) AS n_ret,
        COALESCE(min(CASE WHEN nl.label = q_label THEN rnk END),
          0) AS first_rel,
        COALESCE(CAST(1 AS DOUBLE) /
            min(CASE WHEN nl.label = q_label THEN rnk END),
          CAST(0 AS DOUBLE)) AS rr
      FROM ranked JOIN lab nl ON nl.vec_id = ranked.nbr_id
      GROUP BY query_id ORDER BY query_id"""))

  // ------------------------------------------------------------------ IVF

  // Deterministic coarse quantizer: the 8 seed vectors (vec_id % 59
  // = 0, lowest ids) ARE the centroids — data-derived but fully
  // SQL-expressible, so assignment + probe are oracle-checked end to
  // end. The iteratively trained (Lloyd) quantizer lives in
  // trainedCentroids/ivfAssign below: trained once per (session,
  // dir), cached, spec-verified — never re-trained inside a query.
  private val IvfK = 8
  private val NProbe = 3 // measured top-1 recall 3/5–5/5 across SFs

  /** Squared-L2 distance of `embedding` to `cent` — identical fold
    * order in both engines.
    */
  private def l2Col: Column = l2Between("embedding", "cent")

  /** Squared-L2 of two array columns (`a` float-or-double, `b` double)
    * — identical fold order in both engines. Fused codegen kernel
    * ([[graft.functions.L2Distance]], bit-identical to the previous
    * `aggregate(sequence(0, 63), ...)` HOF formulation, which
    * interpreted the lambda per element — r14 optimization, guide
    * §1.2 step 2 / §4.1); requires GraftFunctions.register, which
    * every caller gets via [[vectors]].
    */
  private def l2Between(a: String, b: String): Column =
    GraftFunctions.l2(col(a), col(b))

  private def seedCentroids(e: DataFrame): DataFrame = {
    val w = Window.orderBy("vec_id") // 8 rows post-limit: single task
    e.filter(col("vec_id") % 59 === 0).orderBy("vec_id").limit(IvfK)
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("cent"))
      .withColumn("cell", row_number().over(w).cast("int"))
      .select("cell", "cent")
  }

  // The coarse quantizer exists ONCE per engine side — q_ann_ivf and
  // q_ann_ivf_pq both probe THESE cells, so a change to the seeding,
  // IvfK, or the (dist, cell) tie-break cannot make the two operators
  // silently probe different partitions.

  /** The seed centroids as collected (cell, 64 doubles) rows — IvfK=8
    * rows, bounded. The persistence face of the quantizer for
    * [[graft.engine.AnnStore]]; AnnSpec pins the served top-k equal
    * to q_ann_ivf's, so the two derivations cannot drift silently.
    */
  private[graft] def ivfCentroids(s: SparkSession,
      dir: String): Seq[(Int, Array[Double])] =
    seedCentroids(vectors(s, dir)).collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray).toSeq

  /** One row per vector with its assigned cell — q_ann_ivf's `cells`
    * frame (same argmin, same (dist, cell) tie-break), factored for
    * the engine-plane ANN store to persist partitioned by cell.
    */
  private[graft] def ivfCells(s: SparkSession, dir: String): DataFrame = {
    val e = vectors(s, dir)
    ivfDists(e)
      .groupBy(col("vec_id"), col("embedding"), col("nrm"))
      .agg(min(struct(col("dist"), col("cell"))).as("m"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("m.cell").as("cell"))
  }

  /** Every vector × every seed with its squared-L2 — the frame both
    * cell assignment and query probing argmin over.
    */
  private def ivfDists(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(seedCentroids(e))).withColumn("dist", l2Col)

  /** Assign `dir`'s embeddings to a FIXED centroid set (no retrain —
    * q_ann_ivf_incremental's no-retrain contract, factored for
    * [[graft.engine.AnnStore.append]]): same broadcast-argmin plan,
    * same (dist, cell) tie-break, same left-to-right L2 fold as
    * [[ivfCells]], so an assignment against round-tripped centroids
    * is bit-equal to the build-time one (doubles survive
    * toString/parse exactly). Keeps `dist` — the caller's
    * radius-drift accounting needs it.
    */
  private[graft] def ivfAssignTo(s: SparkSession, dir: String,
      cents: Seq[(Int, Array[Double])]): DataFrame = {
    val centDf = s.createDataFrame(
      cents.map { case (c, arr) => (c, arr.toSeq) })
      .toDF("cell", "cent")
    // label rides along (cast long, the embeddings fixture contract):
    // the served index persists it so AnnStore.query can offer
    // FILTERED vector search (rank within a label subset) without a
    // second metadata lookup
    GraftFunctions.register(s)
    val d = GraftFunctions.dotp(col("embedding"), col("embedding"))
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), sqrt(d).as("nrm"),
        col("label").cast("long").as("label"))
      .crossJoin(broadcast(centDf))
      .withColumn("dist", l2Col)
      .groupBy(col("vec_id"), col("embedding"), col("nrm"),
        col("label"))
      .agg(min(struct(col("dist"), col("cell"))).as("m"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("label"), col("m.cell").as("cell"), col("m.dist").as("dist"))
  }

  /** SQL: the seeds CTE (same selection as seedCentroids). */
  private val ivfSeedsSql: String = s"""
      seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cell,
               [CAST(x AS DOUBLE) for x in embedding] AS cent
        FROM embeddings WHERE vec_id % 59 = 0 ORDER BY vec_id
        LIMIT $IvfK)"""

  /** SQL: the squared-L2 of `v.embedding` against `s.cent` — the
    * same fold order as l2Col.
    */
  private val ivfL2Sql: String = """list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [(CAST(v.embedding[i] AS DOUBLE) - s.cent[i]) *
         (CAST(v.embedding[i] AS DOUBLE) - s.cent[i])
         for i in generate_series(1, 64)]), (acc, x) -> acc + x)"""

  /** IVF-style ANN, nprobe=3: every vector is assigned to its nearest
    * centroid cell (argmin over an 8-row broadcast — a narrow map, no
    * driver collect, no shuffle beyond the final agg); each query
    * probes its 3 nearest cells and ranks exact cosines within them.
    * Rows scanned per query drop ~K/nprobe×; at 100 TB, K grows with
    * the corpus and the same two joins carry the plan.
    */
  val qAnnIvf = QueryDef(
    "q_ann_ivf",
    (s, dir) => {
      val e = vectors(s, dir)
      val dists = ivfDists(e)
      // one row per vector: lexicographic min of (dist, cell) — the
      // partial aggregate collapses the 8 candidate rows map-side
      val cells = dists
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("m.cell").as("cell"))
      val wp = Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("cell"))
      val probes = dists.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("cell"), col("dist"))
        .withColumn("pr", row_number().over(wp))
        .filter(col("pr") <= NProbe)
        .select("query_id", "q_emb", "q_nrm", "cell")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cells.join(probes, Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("query_id", "rnk")
    },
    Some {
      s"""
      WITH $vectorsSql,
      $ivfSeedsSql,
      dists AS (
        SELECT v.vec_id, v.embedding, v.nrm, s.cell, $ivfL2Sql AS dist
        FROM vectors v CROSS JOIN seeds s),
      cells AS (
        SELECT vec_id, embedding, nrm, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS rn FROM dists)
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, cell
        FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS pr FROM dists WHERE vec_id < 5)
        WHERE pr <= $NProbe)
      SELECT query_id, vec_id, cos, rnk FROM (
        SELECT p.query_id, c.vec_id,
          ${dotSql("p.q_emb", "c.embedding")} / (p.q_nrm * c.nrm) AS cos,
          CAST(row_number() OVER (PARTITION BY p.query_id
            ORDER BY ${dotSql("p.q_emb", "c.embedding")} /
                       (p.q_nrm * c.nrm) DESC,
                     c.vec_id) AS BIGINT) AS rnk
        FROM cells c JOIN probes p USING (cell)
        WHERE c.vec_id <> p.query_id)
      WHERE rnk <= 3 ORDER BY query_id, rnk"""
    })

  // ------------------------------------------------- trained quantizer

  // squared-L2 distances of `embedding` to each centroid in `cents`.
  // The per-centroid kernel is the fused graft_l2 (bit-identical to
  // the interpreted aggregate(sequence(0,63),...) HOF it replaced —
  // r14 optimization): one native call per centroid instead of 64
  // interpreted lambda evals. Callers reach this through vectors(),
  // which registers the function.
  private val distsExpr: String =
    "transform(cents, c -> graft_l2(embedding, c))"

  /** Attach `cell` = 1-based index of the nearest centroid (ties to
    * the lowest index via array_position of the min distance). The
    * distance array is materialized once per row, not re-evaluated
    * for each argument of array_position.
    */
  private def withCell(vectors: DataFrame,
      centroids: Array[Array[Double]]): DataFrame =
    vectors
      .withColumn("cents",
        array(centroids.toIndexedSeq.map(c =>
          array(c.toIndexedSeq.map(lit): _*)): _*))
      .withColumn("dists", expr(distsExpr))
      .withColumn("cell",
        expr("array_position(dists, array_min(dists))").cast("int"))
      .drop("cents", "dists")

  // Lloyd-trained centroids are a property of the dataset, not of any
  // one query: train once per (session, dir), then every caller gets
  // the cached array (broadcast into plans as literals). At 100 TB the
  // trainer would run as a scheduled job persisting centroids to a
  // table; the cache keyed on the immutable input dir is the local
  // equivalent.
  // weak session keys: a closed/discarded SparkSession must not be
  // pinned forever by its cached centroids (a long-lived process may
  // cycle many sessions)
  private val centroidCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Array[Array[Double]]]]()

  private def centroidsFor(s: SparkSession) =
    Tables.perSession(centroidCache, s)

  /** Deterministic Lloyd trainer: k=8 centroids seeded from fixed
    * vec_ids, 3 iterations whose per-dimension means use exact
    * DECIMAL sums (order-independent). Cached per (session, dir) —
    * the expensive iterative part never re-runs for the same input.
    */
  private[graft] def trainedCentroids(s: SparkSession,
      dir: String): Array[Array[Double]] =
    centroidsFor(s).getOrElseUpdate(dir, {
      val vecs = vectors(s, dir)
      var centroids: Array[Array[Double]] = vecs
        .filter(col("vec_id") % 59 === 0).orderBy("vec_id").limit(8)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      (1 to 3).foreach { _ =>
        val means = withCell(vecs, centroids)
          .select(col("cell"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy(col("cell"), col("dim"))
          .agg((sum(col("v").cast(Parity.Dec)) / count(lit(1)))
            .cast("double").as("m"))
          .collect()
        val next = centroids.map(_.clone())
        means.foreach(r =>
          next(r.getInt(0) - 1)(r.getInt(1)) = r.getDouble(2))
        centroids = next
      }
      centroids
    })

  /** Assignment under the trained quantizer (cached training; the
    * assignment itself is a narrow map). Exposed for the spec, which
    * checks assignment optimality, recall vs brute force, and that
    * re-invocation does not re-train.
    */
  private[graft] def ivfAssign(s: SparkSession, dir: String): DataFrame =
    withCell(vectors(s, dir), trainedCentroids(s, dir))

  /** Per-label embedding centroids in long form (label, dim, c) with
    * member count and centroid norm — the class-prototype /
    * cluster-summary aggregate (semantic dedup representatives,
    * label-balanced retrieval). One shuffle keyed (label, dim): 64
    * uniform keys per label, no skew at any scale, map-side partial
    * aggregation collapses each partition to ≤ labels×64 rows.
    *
    * Determinism: DECIMAL sums don't help here (float→DECIMAL rounding
    * is engine-dependent for values that don't terminate at 10
    * digits), so each component is quantized to integer units of 2^-20
    * first — the ×2^20 scaling is exact (power of two) and round()
    * ties go away-from-zero in both engines — making the sums exact
    * int64 arithmetic and the means bit-identical. The norm then sums
    * identical doubles in dim order (belt-and-braces round to 9).
    */
  val qEmbedCentroids = QueryDef(
    "q_embed_centroids",
    (s, dir) => {
      val Q = 1048576.0 // 2^20
      val wl = Window.partitionBy(col("label")).orderBy(col("dim"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          round(col("v").cast("double") * Q).cast("long").as("q"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          (sum(col("q")).cast("double") / (count(lit(1)) * Q)).as("c"))
        .withColumn("norm", round(sqrt(sum(col("c") * col("c")).over(wl)), 9))
        .select("label", "dim", "n", "c", "norm")
        .orderBy("label", "dim")
    },
    Some("""
      WITH vals AS (
        SELECT CAST(label AS BIGINT) AS label,
          unnest(generate_series(1, 64)) AS dim, embedding
        FROM embeddings),
      cent AS (
        SELECT label, CAST(dim AS BIGINT) AS dim, count(*) AS n,
          CAST(sum(CAST(round(
              CAST(embedding[CAST(dim AS INT)] AS DOUBLE) * 1048576.0)
            AS BIGINT)) AS DOUBLE) / (count(*) * 1048576.0) AS c
        FROM vals GROUP BY label, dim)
      SELECT label, dim, n, c,
        round(sqrt(sum(c * c) OVER (PARTITION BY label ORDER BY dim
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)), 9)
          AS norm
      FROM cent ORDER BY label, dim"""))

  // ------------------------------------------------- product quantization

  // PQ(8×8): 64 dims → 8 subspaces of 8 dims, each coded against a
  // 16-entry codebook → 4 bits/subspace, 32 bits/vector — a 64×
  // compression of the float payload. The codebook is deterministic
  // (subvectors of the 16 lowest vec_id % 29 == 0 donors), so both
  // engines derive identical codes; a production build would train it
  // with k-means per subspace exactly like trainedCentroids.
  private val PqM = 8
  private val PqDim = 8
  private val PqK = 16

  /** (m, k, cent) codebook rows: donor k's m-th subvector. */
  private def pqCodebook(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("vec_id") // 16 rows post-limit: single task
    Tables.t(s, dir, "embeddings")
      .filter(col("vec_id") % 29 === 0).orderBy("vec_id").limit(PqK)
      .withColumn("k", row_number().over(w))
      .select(col("k"), explode(array((0 until PqM).map(m =>
        struct(lit(m).as("m"),
          transform(slice(col("embedding"), m * PqDim + 1, PqDim),
            v => v.cast("double")).as("cent"))): _*)).as("mc"))
      .select(col("mc.m").as("m"), col("k"), col("mc.cent").as("cent"))
  }

  /** (vec_id, m, sub): every vector's subvectors. */
  private def pqSubs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), explode(array((0 until PqM).map(m =>
        struct(lit(m).as("m"),
          transform(slice(col("embedding"), m * PqDim + 1, PqDim),
            v => v.cast("double")).as("sub"))): _*)).as("ms"))
      .select(col("vec_id"), col("ms.m").as("m"), col("ms.sub").as("sub"))

  /** Squared L2 between two 8-dim double arrays — strict left fold,
    * same order as the DuckDB list_reduce mirror.
    */
  private def subL2(a: Column, b: Column): Column =
    aggregate(sequence(lit(0), lit(PqDim - 1)), lit(0.0), (acc, j) => {
      val d = element_at(a, j + 1) - element_at(b, j + 1)
      acc + d * d
    })

  /** (vec_id, m, k, dist): each subvector's nearest codebook entry —
    * the narrow map at the heart of PQ encoding (codebook broadcast,
    * no shuffle until the per-vector regroup).
    */
  private def pqAssign(s: SparkSession, dir: String): DataFrame =
    pqSubs(s, dir).join(broadcast(pqCodebook(s, dir)), "m")
      .select(col("vec_id"), col("m"), col("k"),
        subL2(col("sub"), col("cent")).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("k"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.k").as("k"),
        col("best.dist").as("dist"))

  /** Shared oracle CTEs ending in `assign(vec_id, m, k, dist)`. */
  private val pqCtesSql: String = s"""
    donors AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS k,
             embedding
      FROM embeddings WHERE vec_id % 29 = 0 ORDER BY vec_id LIMIT $PqK),
    axes AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
    codebook AS (
      SELECT m, k,
        [CAST(embedding[m*$PqDim + j] AS DOUBLE)
         for j in generate_series(1, $PqDim)] AS cent
      FROM donors CROSS JOIN axes),
    subs AS (
      SELECT vec_id, m,
        [CAST(embedding[m*$PqDim + j] AS DOUBLE)
         for j in generate_series(1, $PqDim)] AS sub
      FROM embeddings CROSS JOIN axes),
    pqd AS (
      SELECT s.vec_id, s.m, c.k,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          [(s.sub[j] - c.cent[j]) * (s.sub[j] - c.cent[j])
           for j in generate_series(1, $PqDim)]),
          (acc, v) -> acc + v) AS dist
      FROM subs s JOIN codebook c USING (m)),
    assign AS (
      SELECT vec_id, m, k, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m
          ORDER BY dist, k) AS rn FROM pqd) WHERE rn = 1)"""

  // 16^m weights for packing 4-bit codes into one BIGINT
  private def pqWeight(m: Int): Long = 1L << (4 * m)

  /** PQ encode: pack the 8 sub-codes into one 32-bit integer and
    * report the total squared reconstruction error. The quantization
    * quality metric a pipeline monitors; codes are what an ANN index
    * stores — 4 B/vector instead of 256 B.
    *
    * Determinism: codes are integer argmins over identical doubles;
    * recon sums the 8 subspace errors in fixed m order (d0+…+d7,
    * left-associated in both engines).
    */
  val qEmbedPq = QueryDef(
    "q_embed_pq",
    (s, dir) => {
      val aggs = (0 until PqM).flatMap(m => Seq(
        min(when(col("m") === m, col("k"))).as(s"k$m"),
        min(when(col("m") === m, col("dist"))).as(s"d$m")))
      pqAssign(s, dir)
        .groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
        .select(col("vec_id"),
          (0 until PqM).map(m =>
            (col(s"k$m") - 1).cast("long") * pqWeight(m)).reduce(_ + _)
            .as("code"),
          (0 until PqM).map(m => col(s"d$m")).reduce(_ + _).as("recon"))
        .orderBy("vec_id")
    },
    Some {
      val codeCase = (0 until PqM).map(m =>
        s"WHEN $m THEN CAST(k - 1 AS BIGINT) * ${pqWeight(m)}").mkString(" ")
      val dmins = (0 until PqM).map(m =>
        s"min(CASE WHEN m = $m THEN dist END) AS d$m").mkString(", ")
      val dsum = (0 until PqM).map(m => s"d$m").mkString(" + ")
      s"""
      WITH $pqCtesSql,
      pq AS (
        SELECT vec_id,
          CAST(sum(CASE m $codeCase END) AS BIGINT) AS code,
          $dmins
        FROM assign GROUP BY vec_id)
      SELECT vec_id, code, $dsum AS recon FROM pq ORDER BY vec_id"""
    })

  /** PQ ANN via asymmetric distance computation: each query builds an
    * 8×16 lookup table of subspace distances to the codebook (tiny,
    * broadcast), and every database vector's distance is 8 table
    * lookups on its stored code — no float vector is touched at scan
    * time. This is the memory-bound scan PQ buys at 100 TB: the scan
    * reads 4-byte codes (64× less IO), the (m, k) equi-join carries
    * the lookups, and exact re-ranking (if wanted) touches only the
    * top candidates.
    */
  val qAnnAdc = QueryDef(
    "q_ann_adc",
    (s, dir) => {
      val tbl = pqSubs(s, dir).filter(col("vec_id") < 5)
        .toDF("query_id", "m", "sub")
        .join(broadcast(pqCodebook(s, dir)), "m")
        .select(col("query_id"), col("m"), col("k"),
          subL2(col("sub"), col("cent")).as("t"))
      val lookups = pqAssign(s, dir)
        .join(broadcast(tbl), Seq("m", "k"))
        .filter(col("query_id") =!= col("vec_id"))
      val tmins = (0 until PqM).map(m =>
        min(when(col("m") === m, col("t"))).as(s"t$m"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adist"), col("vec_id"))
      lookups.groupBy("query_id", "vec_id").agg(tmins.head, tmins.tail: _*)
        .select(col("query_id"), col("vec_id"),
          (0 until PqM).map(m => col(s"t$m")).reduce(_ + _).as("adist"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("query_id", "rnk")
    },
    Some {
      val tmins = (0 until PqM).map(m =>
        s"min(CASE WHEN a.m = $m THEN t END) AS t$m").mkString(", ")
      val tsum = (0 until PqM).map(m => s"t$m").mkString(" + ")
      s"""
      WITH $pqCtesSql,
      tbl AS (
        SELECT q.vec_id AS query_id, c.m, c.k,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [(q.sub[j] - c.cent[j]) * (q.sub[j] - c.cent[j])
             for j in generate_series(1, $PqDim)]),
            (acc, v) -> acc + v) AS t
        FROM subs q JOIN codebook c USING (m) WHERE q.vec_id < 5),
      adc AS (
        SELECT t.query_id, a.vec_id, $tmins
        FROM assign a JOIN tbl t ON t.m = a.m AND t.k = a.k
        WHERE t.query_id <> a.vec_id
        GROUP BY t.query_id, a.vec_id)
      SELECT query_id, vec_id, adist, rnk FROM (
        SELECT query_id, vec_id, $tsum AS adist,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY $tsum, vec_id) AS BIGINT) AS rnk
        FROM adc)
      WHERE rnk <= 3 ORDER BY query_id, rnk"""
    })

  /** Output dimensionality of the random-projection reduction. */
  private val RpDim = 8

  /** Deterministic ±1 sign matrix for the projection — small-integer
    * arithmetic so both engines derive the identical matrix, and ±1
    * is exact in float so the fused dot-product fold is bit-identical
    * to the DuckDB list_reduce mirror.
    */
  private def rpSigns(i: Int): Array[Float] =
    Array.tabulate(64)(j =>
      if ((i * 61 + j * 29 + 3) % 97 % 2 == 0) 1.0f else -1.0f)

  /** Random-projection dimensionality reduction (Achlioptas-style ±1
    * matrix): 64-dim float embeddings down to 8 dims, the cheap
    * distance-preserving transform that feeds clustering / dedup when
    * the full vectors are too wide to shuffle. A narrow per-row map —
    * each output dim is one fused codegen dot product against a
    * literal sign vector; no shuffle but the presentation sort, so it
    * scales with input splits.
    */
  val qEmbedRp = QueryDef(
    "q_embed_rp",
    (s, dir) => {
      GraftFunctions.register(s)
      val projs = (0 until RpDim).map(i =>
        GraftFunctions.dotp(col("embedding"), typedlit(rpSigns(i)))
          .as(s"p$i"))
      Tables.t(s, dir, "embeddings")
        .select(col("vec_id") +: projs: _*)
        .orderBy("vec_id")
    },
    Some {
      val projs = (0 until RpDim).map { i =>
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
          [CAST(embedding[j + 1] AS DOUBLE) *
           (CASE WHEN (($i * 61 + j * 29 + 3) % 97) % 2 = 0
                 THEN 1.0 ELSE -1.0 END)
           for j in generate_series(0, 63)]), (acc, v) -> acc + v) AS p$i"""
      }.mkString(", ")
      s"""
      SELECT vec_id, $projs
      FROM embeddings ORDER BY vec_id"""
    })

  /** Int8 scalar quantization — the storage-compression pass for an
    * embedding lakehouse (4× smaller than float32, ~1% cosine error;
    * PQ above is the search-time codec, this is the storage codec).
    * Per-vector symmetric scale = max|x|/127, codes = round(x/scale).
    * A pure NARROW map: no shuffle, no broadcast, no state — the plan
    * that scales to any corpus by adding splits. Cross-engine: Spark
    * `round()` and DuckDB `round()` both tie away from zero, scale
    * and code arithmetic are correctly-rounded double ops, and the
    * reconstruction-error fold is ordered left-to-right in both
    * engines.
    */
  val qEmbedQuantize = QueryDef(
    "q_embed_quantize",
    (s, dir) => {
      // Each intermediate is aliased through its own projection
      // boundary so downstream lambdas see ATTRIBUTES: inlining e.g.
      // qscale's array_max into the codes lambda would re-reduce the
      // whole vector once per element (64× the work per row).
      Tables.t(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), v => v.cast("double")).as("e"))
        .select(col("vec_id"), col("e"),
          (array_max(transform(col("e"), x => abs(x))) / lit(127.0))
            .as("qscale"))
        .select(col("vec_id"), col("e"), col("qscale"),
          when(col("qscale") === 0.0,
            transform(col("e"), _ => lit(0L)))
            .otherwise(transform(col("e"),
              x => round(x / col("qscale")).cast("long"))).as("codes"))
        .select(col("vec_id"), col("qscale"),
          aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
          array_min(col("codes")).as("code_min"),
          array_max(col("codes")).as("code_max"),
          (aggregate(
            zip_with(col("e"), col("codes"),
              (x, c) => (x - c * col("qscale")) * (x - c * col("qscale"))),
            lit(0.0), (a, d) => a + d) / lit(64.0)).as("mse"))
        .orderBy("vec_id")
    },
    Some("""
      WITH q AS (
        SELECT vec_id, embedding,
          list_max(list_transform(embedding,
            x -> abs(CAST(x AS DOUBLE)))) AS mx
        FROM embeddings),
      c AS (
        SELECT vec_id, embedding, mx, mx / 127.0 AS qscale,
          [CASE WHEN mx = 0 THEN 0
                ELSE CAST(round(CAST(embedding[i] AS DOUBLE) / (mx / 127.0))
                          AS BIGINT) END
           for i in generate_series(1, 64)] AS codes
        FROM q)
      SELECT vec_id, qscale,
        list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
          (a, x) -> a + x) AS code_sum,
        list_min(codes) AS code_min,
        list_max(codes) AS code_max,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          [(CAST(embedding[i] AS DOUBLE) - codes[i] * qscale) *
           (CAST(embedding[i] AS DOUBLE) - codes[i] * qscale)
           for i in generate_series(1, 64)]),
          (a, d) -> a + d) / 64.0 AS mse
      FROM c ORDER BY vec_id"""))

  // ------------------------------------------------- semantic dedup

  /** Seed stride for semantic-dedup cells: every `vec_id % stride == 0`
    * vector is a cluster seed, so the cell count GROWS with the corpus
    * (N/64 cells) and mean occupancy stays ~64 — within-cell pairwise
    * work is ~32·N compares at any N, never N².
    */
  private val SemStride = 64

  private val SemThreshold = 0.4

  /** SemDeDup-style semantic deduplication: cluster the corpus with a
    * deterministic HIERARCHICAL coarse quantizer — super-seeds are
    * every SemStride²-th vector, seeds every SemStride-th; each seed
    * is grouped under its nearest-L2 super-seed, and each vector is
    * assigned by first picking its nearest super-seed, then its
    * nearest seed within that super-cell. Within each cell, every
    * vector with a lower-id neighbor at cosine ≥ [[SemThreshold]] is
    * marked a duplicate of the lowest such id. Clustering bounds the
    * pairwise step to cell occupancy (~64), catching the
    * near-duplicate mass exact and shingle dedup miss.
    *
    * Scale shape: the flat assignment was N×(N/64) L2 distances; the
    * two-level one is N×(N/4096) super-distances + ~64 in-super-cell
    * seed distances per vector — a 64× cut in the quadratic term, and
    * the same construction composes to more levels when N/4096
    * super-seeds themselves outgrow a broadcast. Both engines
    * implement the identical two-stage rule (ties broken by ascending
    * id at both levels), so the whole pipeline stays oracle-checkable.
    */
  val qSemanticDedup = QueryDef(
    "q_semantic_dedup",
    (s, dir) => {
      val e = vectors(s, dir)
      val sup = e.filter(col("vec_id") % (SemStride * SemStride) === 0)
        .select(col("vec_id").as("super_id"),
          transform(col("embedding"), v => v.cast("double")).as("scent"))
      val seeds = e.filter(col("vec_id") % SemStride === 0)
        .select(col("vec_id").as("seed_id"),
          transform(col("embedding"), v => v.cast("double")).as("cent"))
      // level 1a: group the N/64 seeds under their nearest super-seed
      // (tiny cross: (N/64) x (N/4096) rows)
      val seedCells = seeds.crossJoin(broadcast(sup))
        .withColumn("sdist", l2Between("cent", "scent"))
        .groupBy(col("seed_id"), col("cent"))
        .agg(min(struct(col("sdist"), col("super_id"))).as("m"))
        .select(col("seed_id"), col("cent"),
          col("m.super_id").as("super_id"))
      // level 1b: each vector -> nearest super-seed (N x N/4096)
      val vsup = e.crossJoin(broadcast(sup))
        .withColumn("sdist", l2Between("embedding", "scent"))
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(min(struct(col("sdist"), col("super_id"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("m.super_id").as("super_id"))
      // level 2: nearest seed WITHIN the super-cell (equi-join on
      // super_id against the broadcast seed directory; ~64 seeds/cell)
      val cells = vsup.join(broadcast(seedCells), Seq("super_id"))
        .withColumn("dist", l2Between("embedding", "cent"))
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(min(struct(col("dist"), col("seed_id"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("m.seed_id").as("cell"))
      val a = cells.toDF("id_a", "emb_a", "nrm_a", "cell")
      val b = cells.toDF("vec_id", "emb_b", "nrm_b", "cell")
      val matches = a.join(b,
          a("cell") === b("cell") && col("id_a") < col("vec_id"))
        .select(col("vec_id"), b("cell"), col("id_a"),
          pairCos(GraftFunctions.dotp(col("emb_a"), col("emb_b")),
            col("nrm_a"), col("nrm_b")).as("cos"))
        .filter(col("cos") >= SemThreshold)
      val best = matches.groupBy(col("vec_id"))
        .agg(min(struct(col("id_a"), col("cos"))).as("m"))
        .select(col("vec_id"), col("m.id_a").as("dup_of"),
          col("m.cos").as("dup_cos"))
      cells.select(col("vec_id"), col("cell"))
        .join(best, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          col("dup_of").isNotNull.as("is_dup"),
          col("dup_of"), col("dup_cos"))
        .orderBy("vec_id")
    },
    Some {
      def l2(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        [(CAST($a[i] AS DOUBLE) - $b[i]) *
         (CAST($a[i] AS DOUBLE) - $b[i])
         for i in generate_series(1, 64)]), (acc, x) -> acc + x)"""
      s"""
      WITH $vectorsSql,
      sup AS (
        SELECT vec_id AS super_id,
               [CAST(x AS DOUBLE) for x in embedding] AS scent
        FROM embeddings WHERE vec_id % ${SemStride * SemStride} = 0),
      seeds AS (
        SELECT vec_id AS seed_id,
               [CAST(x AS DOUBLE) for x in embedding] AS cent
        FROM embeddings WHERE vec_id % $SemStride = 0),
      seed_cells AS (
        SELECT seed_id, cent, super_id FROM (
          SELECT s.seed_id, s.cent, p.super_id,
            row_number() OVER (PARTITION BY s.seed_id
              ORDER BY ${l2("s.cent", "p.scent")}, p.super_id) AS rn
          FROM seeds s CROSS JOIN sup p)
        WHERE rn = 1),
      vsup AS (
        SELECT vec_id, embedding, nrm, super_id FROM (
          SELECT v.vec_id, v.embedding, v.nrm, p.super_id,
            row_number() OVER (PARTITION BY v.vec_id
              ORDER BY ${l2("v.embedding", "p.scent")}, p.super_id) AS rn
          FROM vectors v CROSS JOIN sup p)
        WHERE rn = 1),
      dists AS (
        SELECT v.vec_id, v.embedding, v.nrm, s.seed_id,
          ${l2("v.embedding", "s.cent")} AS dist
        FROM vsup v JOIN seed_cells s ON v.super_id = s.super_id),
      cells AS (
        SELECT vec_id, embedding, nrm, seed_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, seed_id) AS rn FROM dists)
        WHERE rn = 1),
      matches AS (
        SELECT b.vec_id, b.cell, a.vec_id AS id_a,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id < b.vec_id),
      best AS (
        SELECT vec_id, id_a AS dup_of, cos AS dup_cos FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY id_a, cos) AS rn
          FROM matches WHERE cos >= $SemThreshold)
        WHERE rn = 1)
      SELECT c.vec_id, c.cell, best.dup_of IS NOT NULL AS is_dup,
             best.dup_of, best.dup_cos
      FROM cells c LEFT JOIN best USING (vec_id)
      ORDER BY c.vec_id"""
    })

  /** Matryoshka truncation evaluation: how much cosine structure
    * survives keeping only the first `MrlDims` of 64 dimensions — the
    * measurement behind serving truncated (MRL-style) embeddings at a
    * fraction of the storage/compute. For every ground-truth near-dup
    * pair (the gated brute-force set, cos > 0.4), the truncated-space
    * cosine is compared to the full one; per 0.1-wide cosine band:
    * pair count, exact-decimal mean absolute error, and worst error.
    * Prefix dot products fold left-to-right (Spark `aggregate` HOF ↔
    * DuckDB list comprehension), so both engines see bit-identical
    * truncated cosines. Fixture-gated like the baseline it consumes;
    * at scale the same comparison runs over q_embed_pairs_lsh
    * candidates instead.
    */
  val qMatryoshka = QueryDef(
    "q_embed_matryoshka",
    (s, dir) => {
      val MrlDims = 16
      def dot16(a: Column, b: Column): Column =
        aggregate(sequence(lit(1), lit(MrlDims)), lit(0.0),
          (acc, i) => acc + element_at(a, i).cast("double") *
            element_at(b, i).cast("double"))
      val e16 = Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm16",
          sqrt(dot16(col("embedding"), col("embedding"))))
      val truth = qCosinePairs.run(s, dir)
      truth
        .join(broadcast(e16.toDF("id_a", "emb_a", "nrm_a")), "id_a")
        .join(broadcast(e16.toDF("id_b", "emb_b", "nrm_b")), "id_b")
        .select(
          least(floor((col("cos") - 0.4) / 0.1), lit(2)).cast("int")
            .as("band"),
          abs(col("cos") - dot16(col("emb_a"), col("emb_b")) /
            (col("nrm_a") * col("nrm_b"))).as("err"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          (Parity.dsum(col("err")) / count(lit(1))).as("mae"),
          max(col("err")).as("max_err"))
        .orderBy("band")
    },
    Some {
      def dot16(a: String, b: String): String =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
             for i in generate_series(1, 16)]), (acc, v) -> acc + v)"""
      s"""
      WITH $vectorsSql,
      e16 AS (SELECT vec_id, embedding,
        sqrt(${dot16("embedding", "embedding")}) AS nrm16 FROM embeddings),
      bf AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM vectors a JOIN vectors b ON a.vec_id < b.vec_id
        WHERE ${dotSql("a.embedding", "b.embedding")} /
          (a.nrm * b.nrm) > 0.4),
      errs AS (
        SELECT CAST(least(floor((cos - 0.4) / 0.1), 2) AS INT) AS band,
          abs(cos - ${dot16("ea.embedding", "eb.embedding")} /
            (ea.nrm16 * eb.nrm16)) AS err
        FROM bf
        JOIN e16 ea ON ea.vec_id = bf.id_a
        JOIN e16 eb ON eb.vec_id = bf.id_b)
      SELECT band, count(*) AS n,
        ${Parity.dsumSql("err")} / count(*) AS mae,
        max(err) AS max_err
      FROM errs GROUP BY band ORDER BY band"""
    })

  /** IVF recall@3: the cell-probe ANN's top-3 against the brute-force
    * top-3 per query — the index-quality measurement for the IVF path,
    * composing the two oracle-checked queries (their cosines are
    * bit-identical cross-engine, so the hit sets agree exactly).
    * nprobe=3 over 8 cells: expect high but not always perfect recall;
    * this query MEASURES it instead of asserting it.
    */
  val qIvfRecall = QueryDef(
    "q_ann_ivf_recall",
    (s, dir) => {
      val truth = qAnnTopK.run(s, dir).filter(col("rnk") <= 3)
        .select(col("query_id"), col("vec_id"))
      val ivf = qAnnIvf.run(s, dir)
        .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
      truth.join(ivf, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("n_true"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_true")).as("recall"))
        .orderBy("query_id")
    },
    Some(s"""
      WITH truth0 AS (${qAnnTopK.oracle.get}),
      truth AS (SELECT query_id, vec_id FROM truth0 WHERE rnk <= 3),
      ivf AS (SELECT query_id, vec_id FROM (${qAnnIvf.oracle.get}))
      SELECT t.query_id, count(*) AS n_true,
        CAST(coalesce(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 END), 0)
          AS BIGINT) AS n_hit,
        CAST(coalesce(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 END), 0)
          AS DOUBLE) / count(*) AS recall
      FROM truth t LEFT JOIN ivf i
        ON t.query_id = i.query_id AND t.vec_id = i.vec_id
      GROUP BY t.query_id ORDER BY t.query_id"""))

  /** IVF nprobe→recall TUNING CURVE: recall@3 against the brute-force
    * truth for nprobe ∈ {1, 2, 4, 8} of the 8 IVF cells — the
    * operating curve that decides the scan-fraction/recall trade
    * BEFORE a 100 TB index is frozen (every vector-search deployment
    * publishes exactly this plot). Candidates are scored ONCE with
    * their probe rank attached; the four sweep settings come from a
    * 4-value explode FILTERED on that rank — the expensive cosine
    * work is never repeated per setting, and each vector lives in
    * exactly one cell so no dedup is needed. Recall is exact-integer
    * hits / truths per setting; monotonicity in nprobe is structural
    * (probe sets are nested).
    */
  val qIvfSweep = QueryDef(
    "q_ann_ivf_sweep",
    (s, dir) => {
      val e = vectors(s, dir)
      val dists = ivfDists(e)
      val cells = dists
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("m.cell").as("cell"))
      val wp = Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("cell"))
      val probes = dists.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("cell"), col("dist"))
        .withColumn("pr", row_number().over(wp))
        .filter(col("pr") <= 8)
        .select("query_id", "q_emb", "q_nrm", "cell", "pr")
      val scored = cells.join(probes, Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("pr"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")).as("cos"))
      val sweep = array(lit(1), lit(2), lit(4), lit(8))
      val w = Window.partitionBy(col("nprobe"), col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val top = scored
        .withColumn("nprobe", explode(sweep))
        .filter(col("pr") <= col("nprobe"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("nprobe"), col("query_id"), col("vec_id"),
          lit(1L).as("hit"))
      val truth = qAnnTopK.run(s, dir).filter(col("rnk") <= 3)
        .select(col("query_id"), col("vec_id"))
        .withColumn("nprobe", explode(sweep))
      truth.join(top, Seq("nprobe", "query_id", "vec_id"), "left")
        .groupBy(col("nprobe"))
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
        .select(col("nprobe"), col("n_true"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_true")).as("recall"))
        .orderBy("nprobe")
    },
    Some {
      s"""
      WITH $vectorsSql,
      $ivfSeedsSql,
      dists AS (
        SELECT v.vec_id, v.embedding, v.nrm, s.cell, $ivfL2Sql AS dist
        FROM vectors v CROSS JOIN seeds s),
      cells AS (
        SELECT vec_id, embedding, nrm, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS rn FROM dists)
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
          cell, pr
        FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS pr FROM dists WHERE vec_id < 5)
        WHERE pr <= 8),
      scored AS (
        SELECT p.query_id, c.vec_id, p.pr,
          ${dotSql("p.q_emb", "c.embedding")} / (p.q_nrm * c.nrm) AS cos
        FROM cells c JOIN probes p USING (cell)
        WHERE c.vec_id <> p.query_id),
      sweep AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
      top AS (
        SELECT nprobe, query_id, vec_id, 1 AS hit FROM (
          SELECT w.nprobe, s.query_id, s.vec_id,
            row_number() OVER (PARTITION BY w.nprobe, s.query_id
              ORDER BY s.cos DESC, s.vec_id) AS rnk
          FROM scored s CROSS JOIN sweep w
          WHERE s.pr <= w.nprobe)
        WHERE rnk <= 3),
      truth0 AS (${qAnnTopK.oracle.get}),
      truth AS (
        SELECT w.nprobe, t.query_id, t.vec_id
        FROM truth0 t CROSS JOIN sweep w WHERE t.rnk <= 3)
      SELECT CAST(t.nprobe AS INT) AS nprobe, count(*) AS n_true,
        CAST(coalesce(sum(p.hit), 0) AS BIGINT) AS n_hit,
        CAST(coalesce(sum(p.hit), 0) AS DOUBLE) / count(*) AS recall
      FROM truth t LEFT JOIN top p
        ON t.nprobe = p.nprobe AND t.query_id = p.query_id
          AND t.vec_id = p.vec_id
      GROUP BY t.nprobe ORDER BY t.nprobe"""
    })

  /** IVF-PQ search (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI'11): the production ANN shape — IVF cell
    * probing restricts the candidate set (nprobe=3 of 8 cells), then
    * ranking runs entirely over 4-bit PQ codes via the ADC lookup
    * table, never touching the float vectors of the candidates. The
    * index scan cost per query is |cell| code lookups (4 B/vector
    * payload), and the only full-width work is the per-query table
    * build (M×K=128 sub-distances against the broadcast codebook).
    *
    * Scale shape: candidates come from the (cell) equi-join of the
    * probed cells — never all-pairs; the ADC table and codebook are
    * broadcast; the per-candidate work is an 8-row integer-keyed
    * lookup-and-sum. Composes q_ann_ivf's quantizer with q_ann_adc's
    * ranking, both already oracle-proven deterministic.
    */
  val qAnnIvfPq = QueryDef(
    "q_ann_ivf_pq",
    (s, dir) => {
      val e = vectors(s, dir)
      val dists = ivfDists(e)
      val cells = dists
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"))
      val wp = Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("cell"))
      val probes = dists.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("cell"), col("dist"))
        .withColumn("pr", row_number().over(wp))
        .filter(col("pr") <= NProbe)
        .select("query_id", "cell")
      val cands = cells.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
      val tbl = pqSubs(s, dir).filter(col("vec_id") < 5)
        .toDF("query_id", "m", "sub")
        .join(broadcast(pqCodebook(s, dir)), "m")
        .select(col("query_id"), col("m"), col("k"),
          subL2(col("sub"), col("cent")).as("t"))
      val tmins = (0 until PqM).map(m =>
        min(when(col("m") === m, col("t"))).as(s"t$m"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adist"), col("vec_id"))
      cands.join(pqAssign(s, dir), "vec_id")
        .join(broadcast(tbl), Seq("query_id", "m", "k"))
        .groupBy("query_id", "vec_id").agg(tmins.head, tmins.tail: _*)
        .select(col("query_id"), col("vec_id"),
          (0 until PqM).map(m => col(s"t$m")).reduce(_ + _).as("adist"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("query_id", "rnk")
    },
    Some {
      val tmins = (0 until PqM).map(m =>
        s"min(CASE WHEN a.m = $m THEN t END) AS t$m").mkString(", ")
      val tsum = (0 until PqM).map(m => s"t$m").mkString(" + ")
      s"""
      WITH $pqCtesSql,
      $ivfSeedsSql,
      dists AS (
        SELECT v.vec_id, s.cell, $ivfL2Sql AS dist
        FROM embeddings v CROSS JOIN seeds s),
      cells AS (
        SELECT vec_id, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS rn FROM dists)
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, cell
        FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS pr FROM dists WHERE vec_id < 5)
        WHERE pr <= $NProbe),
      cands AS (
        SELECT p.query_id, c.vec_id
        FROM cells c JOIN probes p USING (cell)
        WHERE c.vec_id <> p.query_id),
      tbl AS (
        SELECT q.vec_id AS query_id, c.m, c.k,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [(q.sub[j] - c.cent[j]) * (q.sub[j] - c.cent[j])
             for j in generate_series(1, $PqDim)]),
            (acc, v) -> acc + v) AS t
        FROM subs q JOIN codebook c USING (m) WHERE q.vec_id < 5),
      adc AS (
        SELECT cd.query_id, cd.vec_id, $tmins
        FROM cands cd
        JOIN assign a ON a.vec_id = cd.vec_id
        JOIN tbl t ON t.query_id = cd.query_id
                  AND t.m = a.m AND t.k = a.k
        GROUP BY cd.query_id, cd.vec_id)
      SELECT query_id, vec_id, adist, rnk FROM (
        SELECT query_id, vec_id, $tsum AS adist,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY $tsum, vec_id) AS BIGINT) AS rnk
        FROM adc)
      WHERE rnk <= 3 ORDER BY query_id, rnk"""
    })

  /** Semantic-outlier filter: each vector's cosine to its OWN label
    * centroid, with a low-cosine outlier flag — the embedding-space
    * curation gate (CCNet/DataComp-style) that drops documents far
    * from their cluster's semantic center before training.
    *
    * Determinism: the centroid is kept in exact integer space — the
    * per-dimension SUM of 2^20-quantized values (never divided until
    * the final double step) — and every dot product is an ordered
    * left fold over dims 1..64 (Spark `aggregate`, DuckDB
    * `list_reduce` — same order, same IEEE ops), so both engines
    * produce bit-identical cosines with no rounding fudge.
    *
    * Scale shape: one map-side-combining aggregation to build the
    * per-label sums (labels × 64 rows — tiny), broadcast back to the
    * vector scan, then a narrow per-row fold. No shuffle of the
    * vector payload at any point; linear in corpus size.
    */
  /** 2^20-quantized exact integer centroid sums per key: one row per
    * key with the 64-long per-dimension sum array and the row count —
    * the shared sum stage of q_semantic_outlier, q_embed_confusion
    * and (keyed by cohort) q_dq_embed_drift's mirror. Defined ONCE so
    * the three consumers can never drift apart.
    */
  private[graft] def quantizedSums(e: DataFrame,
      keyCol: Column): DataFrame = {
    val Q = 1048576.0 // 2^20, same quantum as q_embed_centroids
    e.select(keyCol.as("k"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("k"), col("pos"),
        round(col("v").cast("double") * Q).cast("long").as("q"))
      .groupBy(col("k"), col("pos"))
      .agg(sum(col("q")).as("sd"), count(lit(1)).as("n"))
      .groupBy(col("k"))
      .agg(transform(array_sort(collect_list(
          struct(col("pos"), col("sd")))), x => x("sd")).as("sarr"),
        max(col("n")).as("n"))
  }

  val qSemanticOutlier = QueryDef(
    "q_semantic_outlier",
    (s, dir) => {
      val Q = 1048576.0 // 2^20, same quantum as q_embed_centroids
      val e = Tables.t(s, dir, "embeddings")
      val sums = quantizedSums(e, col("label").cast("long"))
        .select(col("k").as("label"), col("sarr"), col("n"))
      GraftFunctions.register(s)
      val vn = e
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding"),
          sqrt(GraftFunctions.dotp(col("embedding"), col("embedding")))
            .as("nrm"))
        .join(broadcast(sums), "label")
      val dotVS = expr(
        """aggregate(zip_with(embedding, sarr,
             (v, s) -> CAST(v AS DOUBLE) * CAST(s AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, x) -> acc + x)""")
      val cnormSq = expr(
        """aggregate(transform(sarr, s -> CAST(s AS DOUBLE) * CAST(s AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, x) -> acc + x)""")
      vn.select(col("vec_id"), col("label"),
          (dotVS / (col("n") * Q) /
            (col("nrm") * sqrt(cnormSq) / (col("n") * Q))).as("cos"))
        .select(col("vec_id"), col("label"), col("cos"),
          (col("cos") < 0.0).as("is_outlier"))
        .orderBy("vec_id")
    },
    Some(s"""
      WITH dims AS (
        SELECT CAST(label AS BIGINT) AS label,
          unnest(generate_series(1, 64)) AS dim, embedding
        FROM embeddings),
      persum AS (
        SELECT label, dim,
          sum(CAST(round(CAST(embedding[CAST(dim AS INT)] AS DOUBLE)
            * 1048576.0) AS BIGINT)) AS sd,
          count(*) AS n
        FROM dims GROUP BY label, dim),
      sums AS (
        SELECT label, list(sd ORDER BY dim) AS sarr, max(n) AS n
        FROM persum GROUP BY label),
      scored AS (
        SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [CAST(e.embedding[i] AS DOUBLE) * CAST(s.sarr[i] AS DOUBLE)
             for i in generate_series(1, 64)]), (acc, x) -> acc + x)
            / (s.n * 1048576.0)
            / (sqrt(${dotSql("e.embedding", "e.embedding")})
               * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   [CAST(s.sarr[i] AS DOUBLE) * CAST(s.sarr[i] AS DOUBLE)
                    for i in generate_series(1, 64)]), (acc, x) -> acc + x))
                 / (s.n * 1048576.0)) AS cos
        FROM embeddings e JOIN sums s ON CAST(e.label AS BIGINT) = s.label)
      SELECT vec_id, label, cos, cos < 0.0 AS is_outlier
      FROM scored ORDER BY vec_id"""))

  /** Filtered vector search (metadata-constrained ANN) — the other
    * half of every production vector-store query: top-k nearest
    * among vectors satisfying a predicate (here label % 2 = 0). The
    * filter applies to the CANDIDATE side inside the probed IVF
    * cells — pre-filtering, not post-filtering a top-k that could
    * come back short — so the result is the true filtered top-k of
    * the probed cells at any selectivity. Same plan skeleton as
    * q_ann_ivf plus one hash join against the (vec_id, label)
    * metadata projection; no new shuffle shape.
    */
  val qAnnFiltered = QueryDef(
    "q_ann_filtered",
    (s, dir) => {
      val e = vectors(s, dir)
      val dists = ivfDists(e)
      val labels = Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val cells = dists
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("m.cell").as("cell"))
        .join(labels, "vec_id")
        .filter(col("label") % 2 === 0) // the metadata predicate
      val wp = Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("cell"))
      val probes = dists.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("cell"), col("dist"))
        .withColumn("pr", row_number().over(wp))
        .filter(col("pr") <= NProbe)
        .select("query_id", "q_emb", "q_nrm", "cell")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cells.join(probes, Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("label"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("query_id", "rnk")
    },
    Some {
      s"""
      WITH $vectorsSql,
      $ivfSeedsSql,
      dists AS (
        SELECT v.vec_id, v.embedding, v.nrm, s.cell, $ivfL2Sql AS dist
        FROM vectors v CROSS JOIN seeds s),
      cells AS (
        SELECT c.vec_id, c.embedding, c.nrm, c.cell,
          CAST(e2.label AS BIGINT) AS label
        FROM (
          SELECT vec_id, embedding, nrm, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY dist, cell) AS rn FROM dists)
          WHERE rn = 1) c
        JOIN embeddings e2 ON c.vec_id = e2.vec_id
        WHERE e2.label % 2 = 0),
      probes AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, cell
        FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS pr FROM dists WHERE vec_id < 5)
        WHERE pr <= $NProbe)
      SELECT query_id, vec_id, label, cos, rnk FROM (
        SELECT p.query_id, c.vec_id, c.label,
          ${dotSql("p.q_emb", "c.embedding")} / (p.q_nrm * c.nrm) AS cos,
          CAST(row_number() OVER (PARTITION BY p.query_id
            ORDER BY ${dotSql("p.q_emb", "c.embedding")} /
                       (p.q_nrm * c.nrm) DESC,
                     c.vec_id) AS BIGINT) AS rnk
        FROM cells c JOIN probes p USING (cell)
        WHERE c.vec_id <> p.query_id)
      WHERE rnk <= 3 ORDER BY query_id, rnk"""
    })

  /** Embedding whitening (per-dimension standardization): subtract
    * the corpus mean and divide by the corpus stddev, dimension-wise —
    * the normalization retrieval pipelines apply before indexing so
    * no dimension dominates the metric. Determinism is the
    * q_embed_centroids discipline: elements quantize to 2²⁰-scaled
    * integers first, so every moment is an EXACT integer sum (a
    * decimal cast of a full-precision double square rounds at the
    * 10th decimal place differently across engines — learned the hard
    * way) and the mean/stddev/z-scores derive from identical doubles.
    * Scale shape: one posexplode aggregation for the 64 per-dimension
    * moments (tiny, broadcast back), then a narrow per-vector map;
    * the reported norms fold in dimension order.
    */
  val qEmbedWhiten = QueryDef(
    "q_embed_whiten",
    (s, dir) => {
      val Q = 1048576.0 // 2^20
      val ex = Tables.t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("i"),
          round(col("xf").cast("double") * Q).cast("long").as("q"))
      val n = count(lit(1)).cast("double")
      // q² sums into DECIMAL(38,0): a LongType sum overflows past
      // ~8M vectors (ANSI Spark would throw, non-ANSI would wrap),
      // while DuckDB's BIGINT sum silently promotes to HUGEINT —
      // decimal keeps the Spark side exact at any corpus size and
      // its →double cast correctly rounded like the oracle's
      val sqq = sum((col("q") * col("q"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      val dims = ex.groupBy("i").agg(
        (sum(col("q")).cast("double") / (n * Q)).as("mu"),
        sqrt((sqq.cast("double")
          - sum(col("q")).cast("double") * sum(col("q")).cast("double")
            / n) / (n - 1) / (Q * Q)).as("sd"))
      ex.join(broadcast(dims), "i")
        .select(col("vec_id"), col("i"),
          ((col("q") / Q) * (col("q") / Q)).as("xx"),
          (((col("q") / Q - col("mu")) / col("sd"))
            * ((col("q") / Q - col("mu")) / col("sd"))).as("zz"))
        .groupBy("vec_id")
        .agg(
          sort_array(collect_list(struct(col("i"), col("xx")))).as("rx"),
          sort_array(collect_list(struct(col("i"), col("zz")))).as("rz"))
        .select(col("vec_id"),
          sqrt(aggregate(transform(col("rx"), e => e.getField("xx")),
            lit(0.0), (a, v) => a + v)).as("norm_raw"),
          sqrt(aggregate(transform(col("rz"), e => e.getField("zz")),
            lit(0.0), (a, v) => a + v)).as("norm_white"))
        .orderBy("vec_id")
    },
    Some("""
      WITH ex AS (
        SELECT vec_id, i - 1 AS i,
          CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings,
          unnest(generate_series(1, len(embedding))) AS t(i)),
      dims AS (
        -- sum(q*q) routes HUGEINT→VARCHAR→DOUBLE for the correctly
        -- rounded parse matching Spark's decimal→double cast (the
        -- dsumSql discipline)
        SELECT i,
          CAST(sum(q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1048576.0)
            AS mu,
          sqrt((CAST(CAST(sum(q * q) AS VARCHAR) AS DOUBLE)
            - CAST(sum(q) AS DOUBLE) * CAST(sum(q) AS DOUBLE)
              / CAST(count(*) AS DOUBLE))
            / (CAST(count(*) AS DOUBLE) - 1)
            / (1048576.0 * 1048576.0)) AS sd
        FROM ex GROUP BY i),
      z AS (
        -- CAST forces DOUBLE division: a bare BIGINT / 1048576.0 is
        -- DECIMAL division in DuckDB, not the double Spark computes
        SELECT vec_id, ex.i,
          (CAST(q AS DOUBLE) / 1048576.0) * (CAST(q AS DOUBLE)
            / 1048576.0) AS xx,
          ((CAST(q AS DOUBLE) / 1048576.0 - mu) / sd)
            * ((CAST(q AS DOUBLE) / 1048576.0 - mu) / sd) AS zz
        FROM ex JOIN dims ON ex.i = dims.i),
      g AS (
        SELECT vec_id,
          list(xx ORDER BY i) AS rx, list(zz ORDER BY i) AS rz
        FROM z GROUP BY vec_id)
      SELECT vec_id,
        sqrt(list_reduce(list_prepend(0.0, rx), (a, v) -> a + v))
          AS norm_raw,
        sqrt(list_reduce(list_prepend(0.0, rz), (a, v) -> a + v))
          AS norm_white
      FROM g ORDER BY vec_id"""))

  /** Contrastive training-pair mining: for every anchor vector, its
    * best POSITIVE (highest-cosine LSH candidate in [0.3, 0.98) —
    * similar but not a duplicate) and its hardest NEGATIVE (the
    * highest-cosine candidate still below 0.15 — the close-but-wrong
    * example that makes a contrastive loss learn). Anchors lacking
    * either side drop out. This is the (anchor, positive, hard
    * negative) triplet feed an embedding-model trainer consumes, and
    * it reuses the banded-LSH candidate generator end to end — no
    * all-pairs join anywhere; negatives come from band collisions,
    * which is exactly the "hard" pool (random negatives would be
    * trivially far). Both per-anchor argmaxes fold in ONE hash
    * aggregation as struct-maxes ordered (cos desc, id asc) — no
    * window, no sort of the candidate set — so both engines pick
    * identical rows; cosines are bit-identical by the existing
    * dot/norm machinery.
    */
  val qContrastivePairs = QueryDef(
    "q_pairs_contrastive",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = vectors(s, dir)
      val scored = lshCandidates(s, dir)
        .join(e.toDF("id_a", "emb_a", "nrm_a"), "id_a")
        .join(e.toDF("id_b", "emb_b", "nrm_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          pairCos(GraftFunctions.dotp(col("emb_a"), col("emb_b")),
            col("nrm_a"), col("nrm_b")).as("cos"))
      // symmetrize with ONE explode, not a self-union: a union would
      // reference `scored` twice and duplicate the whole LSH
      // candidate-generation lineage in the plan (2× the dominant
      // cost); the explode emits both directions in a single pass
      val sym = scored
        .select(explode(array(
          struct(col("id_a").as("anchor"), col("id_b").as("other"),
            col("cos")),
          struct(col("id_b").as("anchor"), col("id_a").as("other"),
            col("cos")))).as("e"))
        .select(col("e.anchor").as("anchor"),
          col("e.other").as("other"), col("e.cos").as("cos"))
      // both per-anchor argmaxes in ONE hash aggregation (no window,
      // no sort): each band's winner is an associative struct-max
      // ordered (cos desc, other asc) — the other id enters negated
      // so cos-ties resolve to the smallest id, the same tie-break
      // the oracle's row_number uses. A window formulation would
      // sort the whole symmetric candidate set; max() folds it
      // map-side.
      val banded = sym.withColumn("band",
          when(col("cos") >= 0.3 && col("cos") < 0.98, "pos")
            .when(col("cos") >= 0.0 && col("cos") < 0.15, "neg"))
        .filter(col("band").isNotNull)
      banded.groupBy("anchor")
        .agg(
          max(when(col("band") === "pos",
            struct(col("cos"), (-col("other")).as("nid")))).as("p"),
          max(when(col("band") === "neg",
            struct(col("cos"), (-col("other")).as("nid")))).as("ng"))
        .select(col("anchor"),
          (-col("p.nid")).as("pos_id"), col("p.cos").as("pos_cos"),
          (-col("ng.nid")).as("neg_id"), col("ng.cos").as("neg_cos"))
        .filter(col("pos_id").isNotNull && col("neg_id").isNotNull)
        .orderBy("anchor")
    },
    Some(s"""
      WITH $lshCandWithSql,
      scored AS (
        SELECT cand.id_a, cand.id_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
            AS cos
        FROM cand
        JOIN vectors a ON a.vec_id = cand.id_a
        JOIN vectors b ON b.vec_id = cand.id_b),
      sym AS (SELECT id_a AS anchor, id_b AS other, cos FROM scored
              UNION ALL SELECT id_b, id_a, cos FROM scored),
      pos AS (SELECT anchor, other AS pos_id, cos AS pos_cos FROM (
                SELECT anchor, other, cos, row_number() OVER (
                  PARTITION BY anchor ORDER BY cos DESC, other) AS rn
                FROM sym WHERE cos >= 0.3 AND cos < 0.98)
              WHERE rn = 1),
      neg AS (SELECT anchor, other AS neg_id, cos AS neg_cos FROM (
                SELECT anchor, other, cos, row_number() OVER (
                  PARTITION BY anchor ORDER BY cos DESC, other) AS rn
                FROM sym WHERE cos >= 0.0 AND cos < 0.15)
              WHERE rn = 1)
      SELECT pos.anchor AS anchor, pos_id, pos_cos, neg_id, neg_cos
      FROM pos JOIN neg ON pos.anchor = neg.anchor
      ORDER BY pos.anchor"""))

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick 5 of the top-12 candidates per query,
    * trading relevance against redundancy — score(c) = 0.7·cos(q,c) −
    * 0.3·max_{s∈S} cos(c,s). THE standard diversification pass between
    * ANN retrieval and a context window: near-duplicate hits waste
    * prompt tokens, and plain top-k returns near-duplicates precisely
    * when the corpus has them.
    *
    * The greedy loop runs over the BOUNDED candidate pool (12/query),
    * never the corpus: candidate generation is the ANN stage
    * (q_ann_lsh/ivf at scale; brute-force here for oracle truth), so
    * each of the 4 selection rounds is a candidates-sized hash
    * aggregation — argmax as a struct-max (score, then lowest id on
    * ties), the M4/OHLC pattern — plus one equi-join against the ≤5-row
    * selected set. No window over the corpus, no driver collect. The
    * pool and its pair-sim table are eagerly localCheckpoint-ed ONCE
    * (36 / ~400 rows) and the selected set per round, so the greedy
    * rounds are 4 tiny joins over materialized inputs rather than a
    * lazily unrolled plan that re-derives the corpus scan 2^4 times.
    *
    * Determinism: rel/sim are the shared left-to-right dot fold;
    * 0.7·rel − 0.3·msim is the same IEEE mul/sub sequence on both
    * engines; max(sim) is order-independent.
    */
  val qAnnMmr = QueryDef(
    "q_ann_mmr",
    (s, dir) => Confs.scoped(s,
      // r15 (guide §2.2): the greedy rounds' ≤36-row checkpoints
      // materialize inside this body — byte-sized coalescing, see
      // qKcenter
      "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        -> "false") {
      val e = vectors(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .toDF("qid", "q_emb", "q_nrm")
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("rel").desc, col("cid"))
      val cand = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"), col("embedding"),
          col("nrm"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")).as("rel"))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 12)
        .select("qid", "cid", "embedding", "nrm", "rel")
        // 3 queries × 12 candidates = 36 rows; eagerly materialized so
        // the greedy rounds below never re-run the corpus scan + window
        // (the lazily unrolled loop would re-derive it 2^4 times —
        // the q_sample_kcenter plan-blowup lesson)
        .transform(graft.ops.Lineage.cut)
      val sims = cand.select(col("qid"), col("cid").as("a"),
          col("embedding").as("ea"), col("nrm").as("na"))
        .join(cand.select(col("qid"), col("cid").as("b"),
          col("embedding").as("eb"), col("nrm").as("nb")), Seq("qid"))
        .filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          pairCos(GraftFunctions.dotp(col("ea"), col("eb")),
            col("na"), col("nb")).as("sim"))
        .transform(graft.ops.Lineage.cut) // ≤ 3 × 12 × 11 pair rows
      var selected = cand.groupBy("qid")
        .agg(max(struct(col("rel"), (-col("cid")).as("nc"),
          col("cid").as("cid"))).as("m"))
        .select(col("qid"), col("m.cid").as("cid"),
          lit(1L).as("pick"), col("m.rel").as("mmr"))
      for (i <- 2 to 5) {
        val msim = sims
          .join(selected.select(col("qid"), col("cid").as("b")),
            Seq("qid", "b"))
          .groupBy(col("qid"), col("a")).agg(max(col("sim")).as("msim"))
          .select(col("qid").as("mqid"), col("a"), col("msim"))
        val next = cand
          .join(selected.select("qid", "cid"), Seq("qid", "cid"),
            "left_anti")
          .join(msim, col("qid") === col("mqid") &&
            col("cid") === col("a"))
          .select(col("qid"), col("cid"),
            (lit(0.7) * col("rel") - lit(0.3) * col("msim")).as("score"))
          .groupBy(col("qid"))
          .agg(max(struct(col("score"), (-col("cid")).as("nc"),
            col("cid").as("cid"))).as("m"))
          .select(col("qid"), col("m.cid").as("cid"),
            lit(i.toLong).as("pick"), col("m.score").as("mmr"))
        // ≤ 3·i rows; eager checkpoint keeps round i's plan from
        // embedding round i−1 twice (anti-join + max-sim join)
        selected = selected.unionByName(next).transform(graft.ops.Lineage.cut)
      }
      selected.orderBy("qid", "pick")
    },
    Some {
      val steps = (2 to 5).map { k =>
        s"""m$k AS (
        SELECT s.qid, s.a, max(s.sim) AS msim
        FROM sims s JOIN sel${k - 1} p ON s.qid = p.qid AND s.b = p.cid
        GROUP BY s.qid, s.a),
      s$k AS (
        SELECT qid, cid, CAST($k AS BIGINT) AS pick, score AS mmr FROM (
          SELECT c.qid, c.cid,
            0.7 * c.rel - 0.3 * m.msim AS score,
            row_number() OVER (PARTITION BY c.qid
              ORDER BY 0.7 * c.rel - 0.3 * m.msim DESC, c.cid) AS rn
          FROM cand c JOIN m$k m ON m.qid = c.qid AND m.a = c.cid
          WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} x
                            WHERE x.qid = c.qid AND x.cid = c.cid))
        WHERE rn = 1),
      sel$k AS (SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM s$k)"""
      }.mkString(",\n      ")
      s"""
      WITH $vectorsSql,
      q AS (SELECT vec_id AS qid, embedding AS q_emb, nrm AS q_nrm
            FROM vectors WHERE vec_id < 3),
      cand AS (
        SELECT qid, cid, embedding, nrm, rel FROM (
          SELECT q.qid, e.vec_id AS cid, e.embedding, e.nrm,
            ${dotSql("q.q_emb", "e.embedding")} / (q.q_nrm * e.nrm)
              AS rel,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY ${dotSql("q.q_emb", "e.embedding")} /
                         (q.q_nrm * e.nrm) DESC, e.vec_id) AS rn
          FROM q JOIN vectors e ON e.vec_id <> q.qid)
        WHERE rn <= 12),
      sims AS (
        SELECT a.qid, a.cid AS a, b.cid AS b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
            AS sim
        FROM cand a JOIN cand b
          ON a.qid = b.qid AND a.cid <> b.cid),
      sel1 AS (
        SELECT qid, cid, CAST(1 AS BIGINT) AS pick, rel AS mmr FROM (
          SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
            ORDER BY rel DESC, cid) AS rn FROM cand)
        WHERE rn = 1),
      $steps
      SELECT qid, cid, pick, mmr FROM sel5 ORDER BY qid, pick"""
    })

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal,
    * 2-approximation of the optimal cover): 8 maximally-spread
    * vectors plus the coverage radius at each pick — the
    * diversity-sampling primitive for seeding labeling budgets,
    * eval-set selection, and coverage-targeted curation (where the
    * PPS/stratified samplers in Curation target frequency, this
    * targets geometry).
    *
    * Squared L2 via dot products only (|a|² + |b|² − 2·a·b): no sqrt,
    * no division, so no NaN edge and every distance is the same IEEE
    * op sequence in both engines. Each of the 8 rounds is one
    * broadcast against the single NEWEST center, a `least` fold into
    * the running per-vector min-distance, and a 1-row global
    * struct-argmax — k·N distance evals total, no window over the
    * corpus, no driver collect (the 1-row argmax stays a DataFrame,
    * the BPE-loop pattern). min is exact (no fp re-association), so
    * the incremental fold is bit-equal to the oracle's min over the
    * full center set. Loop state: the running min (`mind`) is
    * eagerly localCheckpoint-ed per round — the Dedup
    * connected-components discipline — because the lazily unrolled
    * plan would otherwise EMBED round i−1 twice inside round i and
    * double in size every round (measured 7 s at sf0.1 from plan
    * blowup alone); the 1-row center stays lazy over it (r14,
    * re-derived by the broadcast build and the final union, both
    * bounded). At 100 TB the same shape checkpoints to the cluster
    * store instead.
    */
  val qKcenter = QueryDef(
    "q_sample_kcenter",
    (s, dir) => Confs.scoped(s,
      // r15 (guide §2.2): the 7 running-min checkpoints materialize
      // inside this body; byte-sized coalescing keeps them at the
      // per-vector min table's size, not 32 tiny partitions
      "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        -> "false") {
      GraftFunctions.register(s)
      val e = Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          GraftFunctions.dotp(col("embedding"), col("embedding"))
            .as("n2"))
      def argmax(df: DataFrame, v: Column): DataFrame = df
        .groupBy()
        .agg(max(struct(v.as("v"), (-col("vec_id")).as("ni"),
          col("vec_id").as("vec_id"))).as("m"))
        .select(col("m.vec_id").as("vec_id"), col("m.v").as("v"))
      var newC = argmax(e, col("n2")).join(e, "vec_id")
        .select(col("vec_id"), col("embedding"), col("n2"),
          lit(null).cast("double").as("v"))
        .transform(graft.ops.Lineage.cut)
      var picks = newC.select(col("vec_id"), lit(1L).as("pick"),
        col("v").as("dist"))
      var mind: DataFrame = null
      for (i <- 2 to 8) {
        val c = broadcast(newC.select(col("embedding").as("c_emb"),
          col("n2").as("c_n2")))
        val d2 = e.crossJoin(c)
          .select(col("vec_id"),
            (col("n2") + col("c_n2") - lit(2.0) *
              GraftFunctions.dotp(col("embedding"), col("c_emb")))
              .as("d2"))
        mind = (if (mind == null) d2.select(col("vec_id"),
            col("d2").as("mind"))
          else mind.join(d2, "vec_id")
            .select(col("vec_id"),
              least(col("mind"), col("d2")).as("mind")))
          .transform(graft.ops.Lineage.cut)
        // newC stays LAZY over the checkpointed mind: it is one tiny
        // argmax + fixture join, re-derived by the broadcast build
        // and the final picks union — both bounded — while dropping
        // one blocking checkpoint job per round (r14: the loop's
        // wall is driver job latency, 58 jobs for 8 rounds, not
        // compute). Lineage stays linear: mind is cut every round.
        newC = argmax(mind, col("mind")).join(e, "vec_id")
          .select(col("vec_id"), col("embedding"), col("n2"), col("v"))
        picks = picks.unionByName(newC.select(col("vec_id"),
          lit(i.toLong).as("pick"), col("v").as("dist")))
      }
      picks.select("pick", "vec_id", "dist").orderBy("pick")
    },
    Some {
      val d2 = s"v.n2 + c.n2 - 2 * ${dotSql("v.embedding", "c.embedding")}"
      val steps = (2 to 8).map { i =>
        s"""m$i AS (
        SELECT v.vec_id, min($d2) AS mind
        FROM vectors2 v, cen${i - 1} c GROUP BY v.vec_id),
      c$i AS (
        SELECT v.vec_id, v.embedding, v.n2,
          CAST($i AS BIGINT) AS pick, m.mind AS dist
        FROM (SELECT vec_id, mind, row_number() OVER
                (ORDER BY mind DESC, vec_id) AS rn FROM m$i) m
        JOIN vectors2 v ON v.vec_id = m.vec_id WHERE m.rn = 1),
      cen$i AS (SELECT * FROM cen${i - 1} UNION ALL SELECT * FROM c$i)"""
      }.mkString(",\n      ")
      s"""
      WITH vectors2 AS (
        SELECT vec_id, embedding,
          ${dotSql("embedding", "embedding")} AS n2 FROM embeddings),
      c1 AS (
        SELECT vec_id, embedding, n2, CAST(1 AS BIGINT) AS pick,
          CAST(NULL AS DOUBLE) AS dist
        FROM (SELECT *, row_number() OVER (ORDER BY n2 DESC, vec_id)
                AS rn FROM vectors2)
        WHERE rn = 1),
      cen1 AS (SELECT * FROM c1),
      $steps
      SELECT pick, vec_id, dist FROM cen8 ORDER BY pick"""
    })

  /** Embedding-space label-noise audit: bucket every vector with the
    * SAME adaptive random-hyperplane LSH as q_ann_lsh, take each
    * bucket's majority label, and report per label how many vectors
    * sit in buckets whose majority disagrees with them — the standard
    * neighborhood-consistency detector a training-data release runs
    * over (embedding, label) pairs before fine-tuning (mislabeled
    * examples land in buckets dominated by their TRUE class). A
    * flagged vector is a review candidate, not an auto-drop; the
    * per-label flag rate localizes which class's annotations drifted.
    *
    * Scale shape: signature is a narrow codegen map (compile-time
    * hyperplane literals), then two hash aggregations on (bucket,
    * label) / bucket and one broadcast-size join of per-bucket
    * majorities back onto the (bucket, label) counts — no per-vector
    * join anywhere, so the audit costs less than one ANN query at any
    * corpus size. Majority ties break to the smallest label on both
    * engines (struct-max on (c, -label) ↔ ORDER BY c DESC, label).
    */
  val qLabelPurity = QueryDef(
    "q_embed_label_purity",
    (s, dir) => {
      GraftFunctions.register(s)
      val nBits = derivedBits(Tables.rowCount(s, dir, "embeddings"),
        MinAnnBits, AnnOccupancy)
      val bl = Tables.t(s, dir, "embeddings")
        .select(col("label"),
          bucketCol(col("embedding"), nBits).as("bucket"))
        .groupBy("bucket", "label")
        .agg(count(lit(1)).as("c"))
      val maj = bl.groupBy("bucket")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("bucket"), (-col("m.nl")).as("maj_label"))
      bl.join(maj, "bucket")
        .groupBy("label")
        .agg(sum(col("c")).as("n_vecs"),
          count(lit(1)).as("n_buckets"),
          sum(when(col("label") =!= col("maj_label"), col("c"))
            .otherwise(0L)).as("n_flagged"))
        .select(col("label"), col("n_vecs"), col("n_buckets"),
          col("n_flagged"),
          (col("n_flagged").cast("double") /
            col("n_vecs").cast("double")).as("flag_rate"))
        .orderBy("label")
    },
    Some(s"""
      WITH vectors AS (SELECT vec_id, embedding FROM embeddings),
      nb AS (SELECT ${bitsSql(MinAnnBits, AnnOccupancy)} AS bits),
      sig AS (
        SELECT label,
          CAST(${bucketSql("embedding")} AS BIGINT) %
            (CAST(1 AS BIGINT) << (SELECT bits FROM nb)) AS bucket
        FROM embeddings),
      bl AS (
        SELECT bucket, label, count(*) AS c
        FROM sig GROUP BY bucket, label),
      maj AS (
        SELECT bucket, label AS maj_label FROM (
          SELECT bucket, label,
            row_number() OVER (PARTITION BY bucket
              ORDER BY c DESC, label) AS rnk
          FROM bl) WHERE rnk = 1)
      SELECT bl.label, CAST(sum(c) AS BIGINT) AS n_vecs,
        count(*) AS n_buckets,
        CAST(sum(CASE WHEN bl.label <> maj_label THEN c ELSE 0 END)
          AS BIGINT) AS n_flagged,
        CAST(sum(CASE WHEN bl.label <> maj_label THEN c ELSE 0 END)
          AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS flag_rate
      FROM bl JOIN maj ON bl.bucket = maj.bucket
      GROUP BY bl.label ORDER BY bl.label"""))

  /** Nearest-centroid confusion matrix: classify every vector by its
    * highest-cosine LABEL CENTROID (same exact 2^20-quantized integer
    * centroid sums as q_semantic_outlier, all 10 centroids broadcast)
    * and report (true label, predicted, count, share-of-label) — the
    * label-quality readout complementary to q_embed_label_purity: the
    * purity audit localizes noisy NEIGHBORHOODS, the confusion matrix
    * names which class PAIRS bleed into each other, which is what
    * decides a relabel-vs-merge call before fine-tuning.
    *
    * Argmax is a struct-max over (cos, −centroid label): ties break
    * to the smallest label on both engines, and the cosines are the
    * identical IEEE expressions, so the matrix is bit-deterministic.
    *
    * Scale shape: one narrow scan × 10-row broadcast (the centroid
    * table), a per-vector hash-agg argmax (no window, no sort), one
    * ≤|labels|² aggregation. Cost ≈ one pass over the embedding
    * column at any corpus size.
    */
  val qConfusion = QueryDef(
    "q_embed_confusion",
    (s, dir) => {
      val Q = 1048576.0 // 2^20, same quantum as q_embed_centroids
      val e = Tables.t(s, dir, "embeddings")
      GraftFunctions.register(s)
      // r15 (guide §4): the per-(vector, centroid) fold was two
      // interpreted 64-element HOFs — dot(embedding, sarr) AND the
      // centroid norm, the latter a per-centroid CONSTANT re-folded on
      // every crossJoin row. The norm now computes once per centroid
      // on the 10-row broadcast side (same HOF, same fold, identical
      // double), and the dot runs through the fused graft_dot codegen
      // kernel over the pre-cast double array — per-element op
      // sequence unchanged: acc + (double) v * (double) s, strict
      // left-to-right, null element → null (RewriteSpec pins parity).
      val cnormSq = expr(
        """aggregate(transform(sarr, s -> CAST(s AS DOUBLE) * CAST(s AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, x) -> acc + x)""")
      val sums = quantizedSums(e, col("label").cast("long"))
        .select(col("k").as("clabel"),
          transform(col("sarr"), x => x.cast("double")).as("sarrd"),
          col("n"), sqrt(cnormSq).as("cnorm"))
      val dotVS = GraftFunctions.dotp(col("embedding"), col("sarrd"))
      val scored = e
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding"),
          sqrt(GraftFunctions.dotp(col("embedding"), col("embedding")))
            .as("nrm"))
        .crossJoin(broadcast(sums))
        .select(col("vec_id"), col("label"), col("clabel"),
          (dotVS / (col("n") * Q) /
            (col("nrm") * col("cnorm") / (col("n") * Q))).as("cos"))
      val pred = scored
        .groupBy(col("vec_id"), col("label"))
        .agg(max(struct(col("cos"), (-col("clabel")).as("nc"))).as("m"))
        .select(col("label"), (-col("m.nc")).as("pred"))
      val totals = pred.groupBy(col("label"))
        .agg(count(lit(1)).as("n_label"))
      pred.groupBy(col("label"), col("pred"))
        .agg(count(lit(1)).as("n_vecs"))
        .join(totals, "label")
        .select(col("label"), col("pred"), col("n_vecs"),
          (col("n_vecs").cast("double") /
            col("n_label").cast("double")).as("share"))
        .orderBy("label", "pred")
    },
    Some(s"""
      WITH dims AS (
        SELECT CAST(label AS BIGINT) AS clabel,
          unnest(generate_series(1, 64)) AS dim, embedding
        FROM embeddings),
      persum AS (
        SELECT clabel, dim,
          sum(CAST(round(CAST(embedding[CAST(dim AS INT)] AS DOUBLE)
            * 1048576.0) AS BIGINT)) AS sd,
          count(*) AS n
        FROM dims GROUP BY clabel, dim),
      sums AS (
        SELECT clabel, list(sd ORDER BY dim) AS sarr, max(n) AS n
        FROM persum GROUP BY clabel),
      scored AS (
        SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, s.clabel,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [CAST(e.embedding[i] AS DOUBLE) * CAST(s.sarr[i] AS DOUBLE)
             for i in generate_series(1, 64)]), (acc, x) -> acc + x)
            / (s.n * 1048576.0)
            / (sqrt(${dotSql("e.embedding", "e.embedding")})
               * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   [CAST(s.sarr[i] AS DOUBLE) * CAST(s.sarr[i] AS DOUBLE)
                    for i in generate_series(1, 64)]), (acc, x) -> acc + x))
                 / (s.n * 1048576.0)) AS cos
        FROM embeddings e CROSS JOIN sums s),
      pred AS (
        SELECT label, clabel AS pred FROM (
          SELECT label, clabel,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, clabel) AS rnk
          FROM scored) WHERE rnk = 1),
      totals AS (SELECT label, count(*) AS n_label FROM pred GROUP BY 1)
      SELECT p.label, p.pred, count(*) AS n_vecs,
        CAST(count(*) AS DOUBLE) / CAST(max(t.n_label) AS DOUBLE)
          AS share
      FROM pred p JOIN totals t ON p.label = t.label
      GROUP BY p.label, p.pred ORDER BY p.label, p.pred"""))

  /** Hybrid retrieval: Reciprocal Rank Fusion (RRF, k=60) of a
    * lexical BM25 ranking over `documents` and a cosine ranking over
    * `embeddings` (the fixtures align doc_id = vec_id) — the fusion
    * every production search stack runs over its keyword and vector
    * legs. Each leg contributes 1/(60 + rank) from its TOP-100 list
    * only: RRF needs nothing below the cut, so each ranker fuses to
    * TakeOrderedAndProject and the rank window runs on a 100-row
    * frame — constant work per leg at any corpus size (the 100 TB
    * shape, not a global ranking window). A doc on one list only
    * gets the other leg's contribution as 0. Two divisions and one
    * two-term sum in a fixed order — bit-identical cross-engine.
    */
  val qHybrid = QueryDef(
    "q_ann_hybrid",
    (s, dir) => {
      val TopK = 100
      // lexical leg: q_text_bm25's shared scoring stage, fused to its
      // top-100
      val lexTop = TextOps.bm25TermScores(s, dir)
        .groupBy(col("doc_id"))
        .agg(Parity.dsum(col("tscore")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(TopK)
      val lexRank = lexTop.select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).as("r_lex"))
      // vector leg: cosine to the query vector (vec_id 0), top-100
      val e = vectors(s, dir)
      val q = e.filter(col("vec_id") === 0L)
        .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val vecTop = e.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          pairCos(GraftFunctions.dotp(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")).as("cos"))
        .orderBy(col("cos").desc, col("doc_id"))
        .limit(TopK)
      val vecRank = vecTop.select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("doc_id"))).as("r_vec"))
      lexRank.join(vecRank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_lex"), col("r_vec"),
          (coalesce(lit(1.0) / (lit(60.0) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_vec")), lit(0.0)))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(15)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
      tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
        WHERE term IN ('spark', 'window', 'join')
        GROUP BY doc_id, term),
      dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT)
                AS sum_dl FROM dl),
      lex_top AS (
        SELECT tf.doc_id,
          ${Parity.dsumSql(
            """((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)
             + 1.0)
            * (CAST(tf AS DOUBLE) * 2.2)
            / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl /
               (CAST(sum_dl AS DOUBLE) / n_docs)))""")} AS score
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
        ORDER BY score DESC, doc_id LIMIT 100),
      lex_rank AS (
        SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC,
          doc_id) AS INT) AS r_lex
        FROM lex_top),
      $vectorsSql,
      q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM vectors
            WHERE vec_id = 0),
      vec_top AS (
        SELECT vec_id AS doc_id,
          ${dotSql("q.q_emb", "v.embedding")} / (q.q_nrm * v.nrm) AS cos
        FROM vectors v CROSS JOIN q
        WHERE v.vec_id <> 0
        ORDER BY cos DESC, doc_id LIMIT 100),
      vec_rank AS (
        SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC,
          doc_id) AS INT) AS r_vec
        FROM vec_top)
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, r_lex, r_vec,
        coalesce(1.0 / (60.0 + r_lex), 0.0) +
        coalesce(1.0 / (60.0 + r_vec), 0.0) AS rrf
      FROM lex_rank l FULL OUTER JOIN vec_rank v ON l.doc_id = v.doc_id
      ORDER BY rrf DESC, doc_id LIMIT 15"""))

  /** IVF index MAINTENANCE: assign a fresh embedding batch (vec_id
    * parity — the stand-in for "today's scrape") to the cells of an
    * index quantized on YESTERDAY's half only, without retraining —
    * exactly what a production ANN index does between scheduled
    * re-trains. Per cell: old/new member counts, the old cell's
    * radius (max squared-L2 to its centroid), and how many newcomers
    * land OUTSIDE that radius — the drift alarm that tells the index
    * owner a cell needs splitting or the quantizer needs retraining
    * (q_dq_embed_drift watches the encoder; this watches the index).
    *
    * Every statistic is exact cross-engine: distances are the shared
    * left-to-right l2 fold, per-cell radius is a max (order-free),
    * outside-ness is a comparison — no float summation anywhere.
    *
    * Scale shape: one broadcast of ≤ 8 old-half seed centroids, a
    * narrow argmin map per vector, two hash aggregations, and an
    * ≤ 8-row broadcast join — the q_ann_ivf assignment plan plus a
    * constant-size stats join; the new batch is never compared to old
    * VECTORS, only to old cell SUMMARIES.
    */
  val qIvfIncremental = QueryDef(
    "q_ann_ivf_incremental",
    (s, dir) => {
      val e = vectors(s, dir)
      val w = Window.orderBy("vec_id") // ≤ 8 rows post-limit
      val oldSeeds = e
        .filter(col("vec_id") % 59 === 0 && col("vec_id") % 2 === 0)
        .orderBy("vec_id").limit(IvfK)
        .select(col("vec_id"),
          transform(col("embedding"), v => v.cast("double")).as("cent"))
        .withColumn("cell", row_number().over(w).cast("int"))
        .select("cell", "cent")
      val asg = e.crossJoin(broadcast(oldSeeds))
        .withColumn("dist", l2Col)
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"),
          col("m.dist").as("dist"))
      val olds = asg.filter(col("vec_id") % 2 === 0)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_old"),
          max(col("dist")).as("old_radius2"))
      val news = asg.filter(col("vec_id") % 2 === 1)
        .join(broadcast(olds.select("cell", "old_radius2")), "cell")
        .groupBy("cell")
        .agg(count(lit(1)).as("n_new"),
          sum(when(col("dist") > col("old_radius2"), 1L).otherwise(0L))
            .as("n_new_outside"))
      olds.join(news, Seq("cell"), "left")
        .select(col("cell"), col("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          col("old_radius2"),
          coalesce(col("n_new_outside"), lit(0L)).as("n_new_outside"))
        .orderBy("cell")
    },
    Some(s"""
      WITH $vectorsSql,
      oseeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cell,
               [CAST(x AS DOUBLE) for x in embedding] AS cent
        FROM embeddings WHERE vec_id % 59 = 0 AND vec_id % 2 = 0
        ORDER BY vec_id LIMIT $IvfK),
      d AS (
        SELECT v.vec_id, s.cell, $ivfL2Sql AS dist
        FROM vectors v, oseeds s),
      asg AS (
        SELECT vec_id, cell, dist FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cell) AS rn FROM d)
        WHERE rn = 1),
      olds AS (
        SELECT cell, count(*) AS n_old, max(dist) AS old_radius2
        FROM asg WHERE vec_id % 2 = 0 GROUP BY cell),
      news AS (
        SELECT a.cell, count(*) AS n_new,
          CAST(sum(CASE WHEN a.dist > o.old_radius2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new_outside
        FROM asg a JOIN olds o ON a.cell = o.cell
        WHERE a.vec_id % 2 = 1 GROUP BY a.cell)
      SELECT o.cell, o.n_old, coalesce(n.n_new, 0) AS n_new,
        o.old_radius2, coalesce(n.n_new_outside, 0) AS n_new_outside
      FROM olds o LEFT JOIN news n ON o.cell = n.cell
      ORDER BY o.cell"""))

  /** Embedding-space cohort drift — the vector-side member of the
    * drift-monitor family (q_source_drift covers token distributions,
    * q_dq_profile_drift tabular stats): split the corpus into two
    * deterministic scrape cohorts (vec_id parity — the fixture's
    * stand-in for old-crawl vs new-crawl), compute each (label,
    * cohort) mean vector EXACTLY (the q_embed_centroids integer
    * trick: components quantized to 2^-20 units so sums are exact
    * int64 and the means identical doubles in both engines), and
    * report per label the centroid cosine, the L2 shift, and a drift
    * flag — the "did the new scrape move a class's embedding mass"
    * alarm an embedding-based curation pipeline checks before mixing
    * cohorts.
    *
    * Determinism: per-dim means are exact-int/exact-int divisions
    * (identical doubles); the 64-term cos/L2 reductions are double
    * sums rounded to 9 decimals — order wobble is ≤ 64 ulp ≈ 1e-14,
    * five orders below the rounding granularity (the
    * q_embed_centroids norm discipline). Labels with only one cohort
    * present drop out (drift needs both sides).
    *
    * Scale shape: one shuffle keyed (label, cohort, dim) — ≤
    * labels×2×64 uniform keys, map-side partials collapse each
    * partition to that many rows; everything after operates on
    * labels×64 rows. No per-vector joins, no windows.
    */
  val qEmbedCohortDrift = QueryDef(
    "q_embed_cohort_drift",
    (s, dir) => {
      val Q = 1048576.0 // 2^20
      val vals = Tables.t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          (col("vec_id") % 2 === 0).as("is_a"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("label"), col("is_a"),
          (col("pos") + 1).cast("long").as("dim"),
          round(col("v").cast("double") * Q).cast("long").as("q"))
      val agg = vals.groupBy("label", "is_a", "dim")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"))
        .withColumn("m", col("sq").cast("double") / (col("n") * Q))
      val a = agg.filter(col("is_a"))
        .select(col("label"), col("dim"), col("m").as("ma"),
          col("n").as("na"))
      val b = agg.filter(!col("is_a"))
        .select(col("label"), col("dim"), col("m").as("mb"),
          col("n").as("nb"))
      a.join(b, Seq("label", "dim"))
        .groupBy("label")
        .agg(max("na").as("n_a"), max("nb").as("n_b"),
          sum(col("ma") * col("mb")).as("dot"),
          sum(col("ma") * col("ma")).as("aa"),
          sum(col("mb") * col("mb")).as("bb"),
          sum((col("ma") - col("mb")) * (col("ma") - col("mb")))
            .as("d2"))
        .select(col("label"), col("n_a"), col("n_b"),
          round(col("dot") / (sqrt(col("aa")) * sqrt(col("bb"))), 9)
            .as("cos_ab"),
          round(sqrt(col("d2")), 9).as("l2_shift"))
        .withColumn("drifted",
          col("cos_ab") < 0.98 || col("l2_shift") > 0.05)
        .orderBy("label")
    },
    Some("""
      WITH vals AS (
        SELECT CAST(label AS BIGINT) AS label,
          vec_id % 2 = 0 AS is_a, i AS dim,
          CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings,
          (SELECT unnest(generate_series(1, 64)) AS i)),
      agg AS (
        SELECT label, is_a, dim, count(*) AS n,
          CAST(sum(q) AS DOUBLE) / (count(*) * 1048576.0) AS m
        FROM vals GROUP BY 1, 2, 3),
      j AS (
        SELECT a.label, a.dim, a.m AS ma, b.m AS mb,
          a.n AS na, b.n AS nb
        FROM agg a JOIN agg b
          ON a.label = b.label AND a.dim = b.dim
          AND a.is_a AND NOT b.is_a),
      r AS (
        SELECT label, max(na) AS n_a, max(nb) AS n_b,
          round(sum(ma * mb) /
            (sqrt(sum(ma * ma)) * sqrt(sum(mb * mb))), 9) AS cos_ab,
          round(sqrt(sum((ma - mb) * (ma - mb))), 9) AS l2_shift
        FROM j GROUP BY 1)
      SELECT label, n_a, n_b, cos_ab, l2_shift,
        (cos_ab < 0.98 OR l2_shift > 0.05) AS drifted
      FROM r ORDER BY label"""))

  /** Out-of-distribution scoring under a per-label DIAGONAL Gaussian
    * — the Mahalanobis-distance OOD detector (diagonal covariance, the
    * form that needs only per-dim sufficient statistics and therefore
    * distributes): score(x) = Σ_d (x_d − μ_d)² / (σ²_d + ε) against
    * the vector's OWN label's Gaussian. Complements
    * [[qSemanticOutlier]] (centroid cosine finds DIRECTION outliers;
    * Mahalanobis finds per-dimension SCALE outliers the cosine is
    * blind to — a vector far along a low-variance axis).
    *
    * Cross-engine determinism: μ/σ² derive from exact quantized
    * integer sums (2^-20 units; Σq as DECIMAL(38,0) here / HUGEINT
    * there, so per-label Σq² never wraps at any corpus size), the
    * divisions are one fixed double expression, and the 64-dim score
    * is a strictly sequential left fold in both engines (the
    * [[Similarity]] dot-product discipline).
    *
    * Scale shape: one grouped pass → |labels|×64 sufficient-stat
    * rows, broadcast μ/σ² arrays, one narrow scoring map, TakeOrdered
    * top-20. Never shuffles the embedding column.
    */
  val qEmbedOod = QueryDef(
    "q_embed_ood",
    (s, dir) => {
      val Q = 1048576.0 // 2^20, same quantum as q_embed_centroids
      val e = Tables.t(s, dir, "embeddings")
      val qd = e
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("label"), col("pos"),
          round(col("v").cast("double") * Q).cast("long").as("q"))
      val stats = qd.groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          sum(col("q").cast("decimal(38,0)")).as("sq"),
          sum((col("q") * col("q")).cast("decimal(38,0)")).as("sqq"))
        .selectExpr("label", "pos", "n",
          "CAST(sq AS DOUBLE) / n / 1048576.0D AS mu",
          "CAST(sqq AS DOUBLE) / n / (1048576.0D * 1048576.0D)" +
            " - (CAST(sq AS DOUBLE) / n / 1048576.0D)" +
            " * (CAST(sq AS DOUBLE) / n / 1048576.0D) AS vr")
      val arrs = stats.groupBy("label")
        .agg(transform(array_sort(collect_list(
            struct(col("pos"), col("mu")))), x => x("mu")).as("mus"),
          transform(array_sort(collect_list(
            struct(col("pos"), col("vr")))), x => x("vr")).as("vrs"))
      e.select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding"))
        .join(broadcast(arrs), "label")
        .selectExpr("vec_id", "label",
          """aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, i) ->
             acc
             + (CAST(element_at(embedding, i) AS DOUBLE)
                - element_at(mus, i))
             * (CAST(element_at(embedding, i) AS DOUBLE)
                - element_at(mus, i))
             / (element_at(vrs, i) + 1e-9)) AS ood_score""")
        .orderBy(col("ood_score").desc, col("vec_id"))
        .limit(20)
    },
    Some("""
      WITH dims AS (
        SELECT CAST(label AS BIGINT) AS label,
          unnest(generate_series(1, 64)) AS dim, embedding
        FROM embeddings),
      persum AS (
        SELECT label, dim, count(*) AS n,
          sum(CAST(round(CAST(embedding[CAST(dim AS INT)] AS DOUBLE)
            * 1048576.0) AS BIGINT)) AS sq,
          sum(CAST(round(CAST(embedding[CAST(dim AS INT)] AS DOUBLE)
            * 1048576.0) AS BIGINT)
            * CAST(round(CAST(embedding[CAST(dim AS INT)] AS DOUBLE)
            * 1048576.0) AS BIGINT)) AS sqq
        FROM dims GROUP BY 1, 2),
      mv AS (
        SELECT label, dim,
          CAST(sq AS DOUBLE) / n / 1048576.0 AS mu,
          CAST(sqq AS DOUBLE) / n / (1048576.0 * 1048576.0)
            - (CAST(sq AS DOUBLE) / n / 1048576.0)
            * (CAST(sq AS DOUBLE) / n / 1048576.0) AS vr
        FROM persum),
      arrs AS (
        SELECT label, list(mu ORDER BY dim) AS mus,
          list(vr ORDER BY dim) AS vrs
        FROM mv GROUP BY label),
      scored AS (
        SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [(CAST(e.embedding[i] AS DOUBLE) - a.mus[i])
             * (CAST(e.embedding[i] AS DOUBLE) - a.mus[i])
             / (a.vrs[i] + 1e-9)
             for i in generate_series(1, 64)]), (acc, x) -> acc + x)
            AS ood_score
        FROM embeddings e JOIN arrs a ON CAST(e.label AS BIGINT) = a.label)
      SELECT vec_id, label, ood_score FROM scored
      ORDER BY ood_score DESC, vec_id LIMIT 20"""))

  /** Hard-negative mining for metric learning: per anchor, the top-3
    * most-similar vectors with a DIFFERENT label — the pairs that
    * actually move a contrastive loss ([[qContrastivePairs]] mines
    * label-blind positives and EASY negatives near cos 0; hard
    * negatives are the near-boundary wrong-label cases, and mining
    * them from the LSH candidate pool is exactly how production
    * pipelines avoid the O(n²) similarity matrix).
    *
    * Scale shape: reuses the shared [[lshCandidates]] machinery
    * (packed band keys, one reused exchange); labels RIDE the two
    * pair-scoring joins the query already pays (a labeled vector
    * projection instead of separate (id, label) joins after the
    * explode — the first cut shuffled the symmetrized pair pool twice
    * more for labels and measured 12× wall at the 10× smoke), the
    * wrong-label filter runs BEFORE symmetrization so only hard-
    * negative candidates are exploded, and the per-anchor top-3
    * window partitions are bounded by LSH bucket occupancy × tables
    * (the derived-bits invariant keeps that ~constant at any corpus
    * size), never corpus-sized. Cos ties break to the smaller
    * negative id in both engines, so ranks are bit-deterministic.
    */
  val qHardNeg = QueryDef(
    "q_pairs_hardneg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      GraftFunctions.register(s)
      val ev = Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          sqrt(GraftFunctions.dotp(col("embedding"), col("embedding")))
            .as("nrm"),
          col("label").cast("long").as("lab"))
      val scored = lshCandidates(s, dir)
        .join(ev.toDF("id_a", "emb_a", "nrm_a", "lab_a"), "id_a")
        .join(ev.toDF("id_b", "emb_b", "nrm_b", "lab_b"), "id_b")
        .filter(col("lab_a") =!= col("lab_b"))
        .select(col("id_a"), col("id_b"), col("lab_a"), col("lab_b"),
          pairCos(GraftFunctions.dotp(col("emb_a"), col("emb_b")),
            col("nrm_a"), col("nrm_b")).as("cos"))
      // single-explode symmetrization (the qContrastivePairs lineage
      // argument: a union would run candidate generation twice)
      val sym = scored.select(explode(array(
          struct(col("id_a").as("anchor"), col("id_b").as("neg"),
            col("lab_a"), col("lab_b").as("lab_n"), col("cos")),
          struct(col("id_b").as("anchor"), col("id_a").as("neg"),
            col("lab_b").as("lab_a"), col("lab_a").as("lab_n"),
            col("cos")))).as("e"))
        .select(col("e.anchor").as("anchor"), col("e.neg").as("neg"),
          col("e.lab_a").as("lab_a"), col("e.lab_n").as("lab_n"),
          col("e.cos").as("cos"))
      sym
        .withColumn("rank", row_number().over(Window.partitionBy("anchor")
          .orderBy(col("cos").desc, col("neg"))))
        .filter(col("rank") <= 3)
        .select(col("anchor"), col("rank").cast("long").as("rank"),
          col("neg"), col("lab_a"), col("lab_n"), col("cos"))
        .orderBy("anchor", "rank")
    },
    Some(s"""
      WITH $lshCandWithSql,
      scored AS (
        SELECT cand.id_a, cand.id_b,
          CAST(ea.label AS BIGINT) AS lab_a,
          CAST(eb.label AS BIGINT) AS lab_b,
          ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
        FROM cand
        JOIN vectors a ON a.vec_id = cand.id_a
        JOIN vectors b ON b.vec_id = cand.id_b
        JOIN embeddings ea ON ea.vec_id = cand.id_a
        JOIN embeddings eb ON eb.vec_id = cand.id_b
        WHERE ea.label <> eb.label),
      sym AS (
        SELECT id_a AS anchor, id_b AS neg, lab_a, lab_b AS lab_n, cos
        FROM scored
        UNION ALL
        SELECT id_b AS anchor, id_a AS neg, lab_b AS lab_a,
          lab_a AS lab_n, cos
        FROM scored),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY anchor
          ORDER BY cos DESC, neg) AS rank
        FROM sym)
      SELECT anchor, rank, neg, lab_a, lab_n, cos
      FROM ranked WHERE rank <= 3 ORDER BY anchor, rank"""))

  val all: Seq[QueryDef] =
    Seq(qCosinePairs, qAnnTopK, qAnnLsh, qEmbedPairsLsh, qAnnIvf,
      qEmbedCentroids, qEmbedPq, qAnnAdc, qEmbedRp, qEmbedQuantize,
      qSemanticDedup, qAnnRecall, qMatryoshka, qIvfRecall, qIvfSweep,
      qSemanticOutlier, qAnnIvfPq, qEmbedWhiten, qAnnFiltered,
      qContrastivePairs, qAnnMmr, qKcenter, qAnnMrr, qLabelPurity,
      qConfusion, qHybrid, qIvfIncremental, qEmbedCohortDrift, qEmbedOod,
      qHardNeg)
}
