package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Parity._

/** Data-quality operators (Deequ-style table QA): column profiling and
  * declarative constraint validation — the checks an ingest pipeline
  * runs before promoting a batch at 100 TB. Every aggregate is
  * scan-proportional with map-side partial aggregation and a
  * handful of result rows; nothing is ever collected per-row.
  *
  * Reference behavior: lynx has no QA surface; this is a north-star
  * extension (the reference user's "is this batch sane" question,
  * answered inside the engine).
  */
object DataQuality {

  private def T(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** Column profile of lineitem in long form: one row per profiled
    * column with row/null/distinct counts plus typed min/max (numeric
    * as double, strings lexicographic — kept in separate columns so no
    * cross-engine double→string formatting is ever compared). One scan
    * computes every non-distinct aggregate; distinct counts run as
    * separate single-distinct two-phase aggregates over one-column
    * pruned scans (see the Expand note below), and the long form comes
    * from one explode — driver-free end to end.
    */
  val qProfile = QueryDef(
    "q_dq_profile",
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val nums = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val strs = Seq("l_returnflag", "l_linestatus")
      // ONE scan for every non-distinct aggregate; the distinct counts
      // would all land in one aggregate too, but >1 count(DISTINCT) in
      // a single agg plans as an Expand that multiplies every row by
      // (distinct-aggs + 1) — so each runs as its own single-distinct
      // two-phase aggregate over a one-column pruned scan, and the
      // 1-row results broadcast-crossJoin back onto the wide row
      val aggs = Seq(count(lit(1)).as("n")) ++
        (nums ++ strs).flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max")))
      val wide = (nums ++ strs).foldLeft(li.agg(aggs.head, aggs.tail: _*)) {
        (acc, c) => acc.crossJoin(broadcast(
          li.agg(countDistinct(col(c)).as(s"${c}_dist"))))
      }
      def profRow(c: String, numeric: Boolean) = struct(
        lit(c).as("col_name"), col("n").as("n"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_dist").as("n_distinct"),
        (if (numeric) col(s"${c}_min").cast("double")
         else lit(null).cast("double")).as("min_num"),
        (if (numeric) col(s"${c}_max").cast("double")
         else lit(null).cast("double")).as("max_num"),
        (if (numeric) lit(null).cast("string")
         else col(s"${c}_min")).as("min_str"),
        (if (numeric) lit(null).cast("string")
         else col(s"${c}_max")).as("max_str"))
      val rows = nums.map(profRow(_, numeric = true)) ++
        strs.map(profRow(_, numeric = false))
      wide.select(explode(array(rows: _*)).as("r"))
        .select("r.*")
        .orderBy("col_name")
    },
    Some {
      val nums = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val strs = Seq("l_returnflag", "l_linestatus")
      val sel = nums.map(c => s"""
        SELECT '$c' AS col_name, count(*) AS n,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          count(DISTINCT $c) AS n_distinct,
          CAST(min($c) AS DOUBLE) AS min_num,
          CAST(max($c) AS DOUBLE) AS max_num,
          CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM lineitem""") ++ strs.map(c => s"""
        SELECT '$c' AS col_name, count(*) AS n,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          count(DISTINCT $c) AS n_distinct,
          CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
          min($c) AS min_str, max($c) AS max_str
        FROM lineitem""")
      sel.mkString("", " UNION ALL ", " ORDER BY col_name")
    })

  /** Declarative constraint suite over the star schema: referential
    * integrity (anti-join orphan counts), key uniqueness, and domain
    * rules, each one row of (check, n_violations, n_checked, ok).
    * Violation counts come from semi/anti joins and predicate sums —
    * every check is a scan-proportional aggregate, and the dim side of
    * each FK check is the broadcastable side.
    */
  val qChecks = QueryDef(
    "q_dq_checks",
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val ord = T(s, dir, "orders")
      val cust = T(s, dir, "customer")
      // every check is (1-row violation count) × (1-row checked count),
      // assembled lazily — nothing executes at construction, and each
      // crossJoin broadcasts a single row
      def check(name: String, viol: DataFrame, checked: DataFrame)
          : DataFrame =
        viol.agg(count(lit(1)).as("n_violations"))
          .crossJoin(broadcast(checked.agg(count(lit(1)).as("n_checked"))))
          .select(lit(name).as("check_name"), col("n_violations"),
            col("n_checked"), (col("n_violations") === 0L).as("ok"))
      val dup = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_violations"))
        .crossJoin(broadcast(li.agg(count(lit(1)).as("n_checked"))))
        .select(lit("unique_lineitem_key").as("check_name"),
          col("n_violations"), col("n_checked"),
          (col("n_violations") === 0L).as("ok"))
      check("fk_lineitem_orders",
        li.select("l_orderkey").join(ord.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti"), li)
        .union(check("fk_orders_customer",
          ord.select("o_custkey").join(cust.select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti"), ord))
        .union(dup)
        .union(check("domain_quantity_positive",
          li.filter(col("l_quantity") <= 0.0 || col("l_quantity").isNull),
          li))
        .union(check("domain_discount_unit_interval",
          li.filter(col("l_discount") < 0.0 || col("l_discount") > 1.0),
          li))
        .union(check("order_before_ship",
          li.select("l_orderkey", "l_shipdate")
            .join(ord.select("o_orderkey", "o_orderdate"),
              col("l_orderkey") === col("o_orderkey"))
            .filter(col("l_shipdate") < col("o_orderdate")), li))
        .orderBy("check_name")
    },
    Some("""
      WITH t(check_name, n_violations, n_checked) AS (
        SELECT 'fk_lineitem_orders',
          (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)),
          (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'fk_orders_customer',
          (SELECT count(*) FROM orders WHERE o_custkey NOT IN
            (SELECT c_custkey FROM customer)),
          (SELECT count(*) FROM orders)
        UNION ALL
        SELECT 'unique_lineitem_key',
          (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM (
            SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)),
          (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'domain_quantity_positive',
          (SELECT count(*) FROM lineitem
           WHERE l_quantity <= 0.0 OR l_quantity IS NULL),
          (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'domain_discount_unit_interval',
          (SELECT count(*) FROM lineitem
           WHERE l_discount < 0.0 OR l_discount > 1.0),
          (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'order_before_ship',
          (SELECT count(*) FROM lineitem JOIN orders
            ON l_orderkey = o_orderkey
           WHERE l_shipdate < o_orderdate),
          (SELECT count(*) FROM lineitem))
      SELECT check_name, n_violations, n_checked,
        n_violations = 0 AS ok
      FROM t ORDER BY check_name"""))

  /** Robust per-source outlier detection via median absolute
    * deviation: for each source, the median document length, the MAD
    * (median of |len − median|), and how many docs fall outside
    * median ± 3·MAD — the dispersion gate that, unlike mean/stddev
    * z-scores (q_ts_anomaly's tool), a few megabyte-long junk docs
    * cannot drag open, so it's the right "did this source's length
    * distribution shift" alarm for a crawl snapshot.
    *
    * Determinism: interpolated medians of int64 lengths are exact
    * dyadic halves (a+b)/2 with every sum below 2^53, so both engines
    * produce bit-identical doubles — no transcendental ever enters.
    *
    * Scale shape: two two-phase aggregations over a 2-column scan,
    * stitched by broadcast joins on the ~handful of sources; per-doc
    * deviations never shuffle.
    */
  val qMad = QueryDef(
    "q_dq_mad",
    (s, dir) => {
      val docs = T(s, dir, "documents").select(col("source"),
        col("n_chars").cast("double").as("len"))
      val med = docs.groupBy(col("source"))
        .agg(expr("percentile(len, 0.5)").as("med_chars"))
      val dev = docs.join(broadcast(med), "source")
        .withColumn("dev", abs(col("len") - col("med_chars")))
      val mad = dev.groupBy(col("source"))
        .agg(expr("percentile(dev, 0.5)").as("mad_chars"))
      dev.join(broadcast(mad), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("med_chars")).as("med_chars"),
          min(col("mad_chars")).as("mad_chars"),
          sum(when(col("dev") > col("mad_chars") * 3.0, 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("source")
    },
    Some("""
      WITH docs AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS len FROM documents),
      med AS (
        SELECT source, quantile_cont(len, 0.5) AS med_chars
        FROM docs GROUP BY source),
      dev AS (
        SELECT d.source, abs(d.len - m.med_chars) AS dev, m.med_chars
        FROM docs d JOIN med m USING (source)),
      mad AS (
        SELECT source, quantile_cont(dev, 0.5) AS mad_chars
        FROM dev GROUP BY source)
      SELECT dev.source, CAST(count(*) AS BIGINT) AS n_docs,
        min(dev.med_chars) AS med_chars,
        min(m.mad_chars) AS mad_chars,
        CAST(sum(CASE WHEN dev.dev > m.mad_chars * 3.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev JOIN mad m USING (source)
      GROUP BY dev.source ORDER BY dev.source"""))

  /** Winsorization (robust clipping): per-source p05/p95 fences on
    * document length, values outside clamped to the fence — the
    * outlier treatment that keeps a batch's summary statistics from
    * being dragged by a handful of pathological rows before the batch
    * is promoted (the alarm-only counterpart is q_dq_mad). Scale
    * shape: one per-source percentile aggregation (tiny result,
    * broadcast back) + a narrow clamp scan; the clipped mean goes
    * through the exact decimal accumulator. Both engines interpolate
    * percentiles of integers identically (the q_percentile-proven
    * kernel), so the fences are bit-equal.
    */
  val qWinsorize = QueryDef(
    "q_dq_winsorize",
    (s, dir) => {
      val docs = Tables.t(s, dir, "documents")
      val fences = docs.groupBy("source").agg(
        expr("percentile(n_chars, 0.05)").as("lo"),
        expr("percentile(n_chars, 0.95)").as("hi"))
      docs.join(broadcast(fences), "source")
        .select(col("source"), col("n_chars"),
          least(greatest(col("n_chars").cast("double"), col("lo")),
            col("hi")).as("w"),
          col("lo"), col("hi"))
        .groupBy("source")
        .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
          sum(when(col("n_chars").cast("double") < col("lo"), 1L)
            .otherwise(0L)).as("n_clip_low"),
          sum(when(col("n_chars").cast("double") > col("hi"), 1L)
            .otherwise(0L)).as("n_clip_high"),
          davg(col("w")).as("mean_winsorized"),
          davg(col("n_chars").cast("double")).as("mean_raw"))
        .orderBy("source")
    },
    Some(s"""
      WITH fences AS (
        SELECT source,
          quantile_cont(n_chars, 0.05) AS lo,
          quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY source),
      cl AS (
        SELECT d.source, d.n_chars,
          least(greatest(CAST(d.n_chars AS DOUBLE), f.lo), f.hi) AS w,
          f.lo, f.hi
        FROM documents d JOIN fences f USING (source))
      SELECT source, first(lo) AS lo, first(hi) AS hi,
        CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) < lo THEN 1 ELSE 0
          END) AS BIGINT) AS n_clip_low,
        CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) > hi THEN 1 ELSE 0
          END) AS BIGINT) AS n_clip_high,
        ${davgSql("w")} AS mean_winsorized,
        ${davgSql("CAST(n_chars AS DOUBLE)")} AS mean_raw
      FROM cl GROUP BY source ORDER BY source"""))

  /** Benford first-digit conformance on l_extendedprice: observed
    * first-significant-digit shares vs the exact Benford expectation,
    * with the per-digit chi-square contribution. The expected shares
    * log10(1 + 1/d) are nine compile-time double literals repeated
    * verbatim in the oracle, so no runtime ln()/log10() (not
    * bit-identical across engines) ever executes. The first digit is
    * taken from the decimal rendering rather than floor(x/10^floor(
    * log10 x)) for the same reason; both engines print the integer
    * part of a double exactly. One scan-proportional aggregation on a
    * 9-value key — map-side combine leaves 9 rows per partition.
    */
  val qBenford = QueryDef(
    "q_dq_benford",
    (s, dir) => {
      // log10(1 + 1/d), d = 1..9 — precomputed, shared with the oracle
      val exp = Seq(
        0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
        0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
        0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
      val expected = exp.zipWithIndex.foldLeft(lit(0.0)) {
        case (acc, (p, i)) =>
          when(col("digit") === (i + 1).toString, lit(p)).otherwise(acc)
      }
      T(s, dir, "lineitem")
        .select(regexp_extract(col("l_extendedprice").cast("string"),
          "[1-9]", 0).as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(
          T(s, dir, "lineitem").agg(count(lit(1)).as("total"))))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("total")).as("share"),
          expected.as("expected"))
        .withColumn("chi2_term",
          (col("share") - col("expected")) *
            (col("share") - col("expected")) / col("expected"))
        .orderBy("digit")
    },
    Some("""
      WITH d AS (
        SELECT regexp_extract(CAST(l_extendedprice AS VARCHAR),
                 '[1-9]') AS digit
        FROM lineitem),
      counts AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      total AS (SELECT count(*) AS total FROM lineitem),
      scored AS (
        SELECT digit, n, CAST(n AS DOUBLE) / total AS share,
          CAST(CASE digit
            WHEN '1' THEN 0.3010299956639812
            WHEN '2' THEN 0.17609125905568124
            WHEN '3' THEN 0.12493873660829992
            WHEN '4' THEN 0.09691001300805642
            WHEN '5' THEN 0.07918124604762482
            WHEN '6' THEN 0.06694678963061322
            WHEN '7' THEN 0.05799194697768673
            WHEN '8' THEN 0.05115252244738129
            WHEN '9' THEN 0.04575749056067514
            ELSE 0.0 END AS DOUBLE) AS expected
        FROM counts CROSS JOIN total)
      SELECT digit, n, share, expected,
        (share - expected) * (share - expected) / expected AS chi2_term
      FROM scored ORDER BY digit"""))

  /** Two-sample Kolmogorov–Smirnov drift test between the English and
    * German documents' length distributions. Scale-right shape: first
    * collapse to the DISTINCT-value histogram with per-group counts
    * (one combining shuffle, bounded by the value domain), then run
    * the cumulative window over that tiny histogram. The statistic is
    * kept in exact integers — d_num = max|cum1·m − cum2·n| — with ONE
    * final division to d = d_num/(n·m), so no float accumulates across
    * either engine's sum order.
    */
  val qKs = QueryDef(
    "q_dq_ks",
    (s, dir) => {
      val hist = T(s, dir, "documents")
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("n_chars").as("v"))
        .agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c1"),
          sum(when(col("lang") === "de", 1L).otherwise(0L)).as("c2"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum1", sum("c1").over(w))
        .withColumn("cum2", sum("c2").over(w))
      val tot = hist.agg(sum("c1").as("n"), sum("c2").as("m"))
      val stat = cum.crossJoin(broadcast(tot))
        .selectExpr("abs(cum1 * m - cum2 * n) AS dd")
        .agg(max("dd").as("d_num"))
      tot.crossJoin(broadcast(stat))
        .selectExpr("n", "m", "d_num",
          "CAST(d_num AS DOUBLE) / CAST(n * m AS DOUBLE) AS d")
    },
    Some("""
      WITH hist AS (
        SELECT n_chars AS v,
          CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS c1,
          CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT)
            AS c2
        FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
      cum AS (
        SELECT v,
          CAST(sum(c1) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum1,
          CAST(sum(c2) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum2
        FROM hist),
      tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n,
                     CAST(sum(c2) AS BIGINT) AS m FROM hist),
      stat AS (
        SELECT CAST(max(abs(cum1 * m - cum2 * n)) AS BIGINT) AS d_num
        FROM cum CROSS JOIN tot)
      SELECT n, m, d_num,
        CAST(d_num AS DOUBLE) / CAST(n * m AS DOUBLE) AS d
      FROM tot CROSS JOIN stat"""))

  /** Chi-square independence audit of the (lang × source) contingency
    * table — is language mix homogeneous across sources? Observed
    * counts and marginals are exact integers; expected = row·col/total
    * and the chi-square term are the only doubles, computed with one
    * fixed expression shape per cell so both engines run the identical
    * IEEE sequence. Three small aggregations, marginals broadcast.
    */
  val qChisq = QueryDef(
    "q_dq_chisq",
    (s, dir) => {
      val d = T(s, dir, "documents")
      val obs = d.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val rowT = d.groupBy("lang").agg(count(lit(1)).as("row_tot"))
      val colT = d.groupBy("source").agg(count(lit(1)).as("col_tot"))
      val tot = d.agg(count(lit(1)).as("total"))
      obs.join(broadcast(rowT), "lang")
        .join(broadcast(colT), "source")
        .crossJoin(broadcast(tot))
        .selectExpr("lang", "source", "n",
          "CAST(row_tot * col_tot AS DOUBLE) / CAST(total AS DOUBLE)" +
            " AS expected")
        .selectExpr("lang", "source", "n", "expected",
          "(CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE)" +
            " - expected) / expected AS chi2_term")
        .orderBy("lang", "source")
    },
    Some("""
      WITH obs AS (
        SELECT lang, source, count(*) AS n
        FROM documents GROUP BY 1, 2),
      rt AS (SELECT lang, count(*) AS row_tot FROM documents GROUP BY 1),
      ct AS (SELECT source, count(*) AS col_tot
             FROM documents GROUP BY 1),
      tot AS (SELECT count(*) AS total FROM documents),
      e AS (
        SELECT lang, source, n,
          CAST(row_tot * col_tot AS DOUBLE) / CAST(total AS DOUBLE)
            AS expected
        FROM obs JOIN rt USING (lang) JOIN ct USING (source)
        CROSS JOIN tot)
      SELECT lang, source, n, expected,
        (CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
          / expected AS chi2_term
      FROM e ORDER BY lang, source"""))

  /** k-anonymity audit over quasi-identifiers — the privacy gate a
    * training-data release runs next to PII redaction: every
    * (nation, market-segment, account-balance-band) equivalence
    * class with fewer than k=5 members makes its customers
    * re-identifiable by those attributes alone. Reports, per
    * quasi-identifier class: its size, whether it violates k, and
    * the corpus-level cost of enforcement — rows needing suppression
    * and the violating-class count — as one corpus '__classes__' row
    * plus a per-nation breakdown of the violations. The balance band
    * is floor(acctbal/1000): the IEEE division and floor are
    * bit-identical in both engines (a bare double->BIGINT cast would
    * NOT be — Spark truncates where DuckDB rounds).
    * Scale shape: one hash aggregation on the quasi-identifier key
    * plus the grouping-sets rollup — exactly a groupBy at any SF.
    */
  val qKanon = QueryDef(
    "q_dq_kanon",
    (s, dir) => {
      val K = 5
      val cls = Tables.t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).as("bal_band"))
      cls.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("class_size"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
          col("class_size"),
          (col("class_size") < K).as("violates_k"))
        .groupBy(lit("__classes__").as("section"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("violates_k"), 1L).otherwise(0L))
            .as("n_violating"),
          sum(when(col("violates_k"), col("class_size"))
            .otherwise(0L)).as("rows_to_suppress"),
          min(col("class_size")).as("min_class"),
          max(col("class_size")).as("max_class"))
        .unionAll(
          cls.groupBy("c_nationkey", "c_mktsegment", "bal_band")
            .agg(count(lit(1)).as("class_size"))
            .filter(col("class_size") < K)
            .groupBy(col("c_nationkey").cast("string").as("section"))
            .agg(count(lit(1)).as("n_classes"),
              sum(lit(1L)).as("n_violating"),
              sum(col("class_size")).as("rows_to_suppress"),
              min(col("class_size")).as("min_class"),
              max(col("class_size")).as("max_class")))
        .orderBy("section")
    },
    Some("""
      WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
        FROM customer),
      sizes AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
          count(*) AS class_size
        FROM cls GROUP BY 1, 2, 3)
      SELECT '__classes__' AS section,
        count(*) AS n_classes,
        CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating,
        CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
          AS BIGINT) AS rows_to_suppress,
        min(class_size) AS min_class, max(class_size) AS max_class
      FROM sizes
      UNION ALL
      SELECT CAST(c_nationkey AS VARCHAR) AS section,
        count(*) AS n_classes,
        CAST(count(*) AS BIGINT) AS n_violating,
        CAST(sum(class_size) AS BIGINT) AS rows_to_suppress,
        min(class_size) AS min_class, max(class_size) AS max_class
      FROM sizes WHERE class_size < 5
      GROUP BY c_nationkey
      ORDER BY section"""))

  /** Join-key SKEW diagnostic — the measurement that decides between
    * a plain shuffle join, AQE skew splitting, and an explicit salt
    * (ops/Skew.scala): for each candidate join/grouping key, the
    * distinct-key count, the hottest key's row count and share, and
    * the Simpson concentration Σcᵢ(cᵢ−1)/(N(N−1)) — the probability
    * two random rows collide on the key, an exact-rational
    * alternative to entropy (no log() to drift cross-engine). The
    * hottest key's share IS the lower bound on straggler-task skew
    * in a shuffle on that key. Scale shape: one count-per-key
    * aggregation per audited key (map-side combined), then a
    * constant-size rollup; the hottest key resolves as a struct-max,
    * never a sort.
    */
  val qSkewKeys = QueryDef(
    "q_dq_skew",
    (s, dir) => {
      def audit(table: String, key: String): DataFrame =
        T(s, dir, table)
          .groupBy(col(key).cast("string").as("k"))
          .agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"),
            sum(col("c")).as("n_rows"),
            max(struct(col("c"), col("k"))).as("top"),
            sum(col("c") * (col("c") - 1)).as("coll"))
          .select(lit(s"$table.$key").as("audited_key"),
            col("n_rows"), col("n_keys"),
            col("top.k").as("top_key"), col("top.c").as("top_count"),
            (col("top.c").cast("double") / col("n_rows"))
              .as("top_share"),
            (col("coll").cast("double") /
              (col("n_rows") * (col("n_rows") - 1)))
              .as("simpson"))
      audit("lineitem", "l_suppkey")
        .unionAll(audit("lineitem", "l_partkey"))
        .unionAll(audit("orders", "o_custkey"))
        .unionAll(audit("events", "user_id"))
        .unionAll(audit("events", "event_type"))
        .orderBy("audited_key")
    },
    Some {
      def auditSql(table: String, key: String): String = s"""
        SELECT '$table.$key' AS audited_key,
          CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
          max(struct_pack(c := c, k := k)).k AS top_key,
          max(struct_pack(c := c, k := k)).c AS top_count,
          CAST(max(struct_pack(c := c, k := k)).c AS DOUBLE)
            / CAST(sum(c) AS BIGINT) AS top_share,
          CAST(sum(c * (c - 1)) AS DOUBLE)
            / (CAST(sum(c) AS BIGINT) * (CAST(sum(c) AS BIGINT) - 1))
            AS simpson
        FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS c
              FROM $table GROUP BY 1)"""
      Seq(("lineitem", "l_suppkey"), ("lineitem", "l_partkey"),
        ("orders", "o_custkey"), ("events", "user_id"),
        ("events", "event_type"))
        .map((auditSql _).tupled)
        .mkString("", " UNION ALL ", " ORDER BY audited_key")
    })

  /** A/B experiment readout: users hash-split into two arms (md5
    * parity — the same deterministic assignment q_split_train uses,
    * so allocation is reproducible across engines, re-scrapes and
    * cluster sizes), purchase values compared arm-to-arm with the
    * Welch t statistic. Means/variances come from exact DECIMAL sums
    * (the Parity discipline); the t arithmetic is then the identical
    * IEEE sequence in both engines — sqrt is correctly rounded by
    * spec, unlike exp/pow, which is why the readout stops at the
    * statistic instead of a p-value (the caller compares t to the
    * critical value, the standard large-n practice anyway). Scale
    * shape: one narrow map + a 2-key aggregation — the readout costs
    * one scan no matter how many units the experiment has.
    */
  val qAbLift = QueryDef(
    "q_dq_ab_lift",
    (s, dir) => {
      val ev = T(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(
          when(substring(md5(col("user_id").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
            .otherwise("B").as("arm"),
          col("value"))
      val st = ev.groupBy("arm")
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("s"),
          dsum(col("value") * col("value")).as("ss"))
        .select(col("arm"), col("n"),
          (col("s") / col("n")).as("mean"),
          ((col("ss") - col("s") * col("s") / col("n"))
            / (col("n") - 1)).as("variance"))
      val a = st.filter(col("arm") === "A")
        .select(col("n").as("n_a"), col("mean").as("mean_a"),
          col("variance").as("var_a"))
      val b = st.filter(col("arm") === "B")
        .select(col("n").as("n_b"), col("mean").as("mean_b"),
          col("variance").as("var_b"))
      a.crossJoin(broadcast(b))
        .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
          (col("mean_b") - col("mean_a")).as("lift"),
          ((col("mean_b") - col("mean_a")) /
            sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
            .as("t_welch"))
    },
    Some(s"""
      WITH ev AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
            IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B'
          END AS arm, value
        FROM events WHERE event_type = 'purchase'),
      st AS (
        SELECT arm, count(*) AS n,
          ${dsumSql("value")} AS s,
          ${dsumSql("value * value")} AS ss
        FROM ev GROUP BY arm),
      m AS (
        SELECT arm, n, s / n AS mean,
          (ss - s * s / n) / (n - 1) AS variance
        FROM st)
      SELECT a.n AS n_a, b.n AS n_b, a.mean AS mean_a, b.mean AS mean_b,
        b.mean - a.mean AS lift,
        (b.mean - a.mean) /
          sqrt(a.variance / a.n + b.variance / b.n) AS t_welch
      FROM m a CROSS JOIN m b
      WHERE a.arm = 'A' AND b.arm = 'B'"""))

  /** Embedding-table health check — the QA gate before an ANN index
    * build (a handful of zero/degenerate vectors silently poison
    * IVF training and cosine math): per norm bin (unit-width floor
    * bins of the L2 norm), vector counts; plus the degenerate
    * counts every index build should refuse on — wrong dimension,
    * null elements, zero norm. The norm comes from the fused
    * graft_dot kernel (codegen, same bits as the similarity
    * operators will see — auditing with a different formula would
    * miss exactly the discrepancies that matter). One narrow map +
    * a tiny bin aggregation; the '__degenerate__' rollup rides the
    * same scan via a union of two aggregates over one cached pass.
    */
  val qEmbedQa = QueryDef(
    "q_dq_embeddings",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val e = T(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"),
          sqrt(graft.functions.GraftFunctions
            .dotp(col("embedding"), col("embedding"))).as("nrm"))
      val bins = e.filter(col("nrm").isNotNull && col("nrm") > 0.0 &&
          col("dim") === 64)
        .groupBy(floor(col("nrm")).as("bin"))
        .agg(count(lit(1)).as("n"))
        .select(concat(lit("norm_bin_"), col("bin").cast("string"))
          .as("check"), col("n"))
      val degen = e.agg(
        sum(when(col("dim") =!= 64, 1L).otherwise(0L)).as("wrong_dim"),
        sum(when(col("nrm").isNull, 1L).otherwise(0L)).as("null_elems"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("zero_norm"))
        .select(explode(array(
          struct(lit("z_wrong_dim").as("check"),
            col("wrong_dim").as("n")),
          struct(lit("z_null_elements").as("check"),
            col("null_elems").as("n")),
          struct(lit("z_zero_norm").as("check"),
            col("zero_norm").as("n")))).as("r"))
        .select(col("r.check"), col("r.n"))
      bins.unionAll(degen).orderBy("check")
    },
    Some("""
      WITH e AS (
        SELECT vec_id, len(embedding) AS dim,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
            (a, v) -> a + v)) AS nrm
        FROM embeddings),
      bins AS (
        SELECT 'norm_bin_' || CAST(CAST(floor(nrm) AS BIGINT) AS VARCHAR)
            AS "check",
          count(*) AS n
        FROM e WHERE nrm IS NOT NULL AND nrm > 0.0 AND dim = 64
        GROUP BY 1),
      degen AS (
        SELECT 'z_wrong_dim' AS "check",
          CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM e
        UNION ALL
        SELECT 'z_null_elements',
          CAST(sum(CASE WHEN nrm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM e
        UNION ALL
        SELECT 'z_zero_norm',
          CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM e)
      SELECT "check", n FROM bins
      UNION ALL SELECT "check", n FROM degen
      ORDER BY "check""""))

  /** Quantile estimation from a bottom-k-by-hash sample (k=64 per
    * group): the third mergeable sketch family next to the
    * cardinality pair (KMV/HLL) — the k rows with the smallest
    * md5(row-key) are a uniform sample whose union/merge is again
    * "keep the k smallest", so a 1000-executor profile pass ships 64
    * (hash, value) pairs per (group, partition) and the sample is
    * IDENTICAL no matter how the data is partitioned (the property
    * reservoir sampling lacks). Order statistics pass values through
    * untouched — no float summation, so the quantiles are
    * bit-identical cross-engine by construction.
    *
    * Ranks use the discrete ceil formula (p·n + 99) div 100 — pure
    * integer, no float ceil. Spark plans the rh ≤ 64 filter as a
    * WindowGroupLimit: each input partition is pre-pruned to its
    * local bottom-64 BEFORE the exchange, so the shuffle carries
    * ≤ 64·partitions rows per group, not the corpus (asserted in
    * PlanSpec). The ranking window after it runs over ≤ 64 rows per
    * group — this operator never globally sorts the fact table.
    *
    * The exact-rank error readout that shipped inside this operator
    * pre-r9 (two full-corpus per-group rank windows — the 5.3× wall
    * at the 10× smoke, and a cost no 100 TB run would pay) now lives
    * in the spec harness (SketchSpec), which computes the exact
    * quantiles at fixture scale and bounds the sample's relative
    * error — the q_ann_recall pattern: truth harness in the spec,
    * production shape in the operator.
    */
  val qQuantileSample = QueryDef(
    "q_dq_quantile_sample",
    (s, dir) => {
      // spread: the per-row md5 sampling hash and the partial
      // window-group-limit pass would otherwise run serially in the
      // one-task fixture scan (guide §2.5; no cache below the
      // exchange, and both window orders are total, so results are
      // partitioning-independent)
      // gated on footer-measured scan parallelism — see q1_agg
      val base = Tables.spreadIfNarrow(s, dir, "lineitem")(
        T(s, dir, "lineitem")
          .select("l_returnflag", "l_extendedprice", "l_orderkey",
            "l_linenumber"))
        .select(col("l_returnflag").as("g"),
          col("l_extendedprice").as("v"),
          col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
          conv(substring(md5(concat(col("l_orderkey").cast("string"),
            lit(":"), col("l_linenumber").cast("string"))), 1, 15),
            16, 10).cast("long").as("h"))
      val wv = Window.partitionBy("g").orderBy(col("v"), col("k1"),
        col("k2"))
      val wg = Window.partitionBy("g")
      // discrete ceil rank, pure integer: (p·n + 99) div 100
      def pick(p: Int, rn: String, n: String): Column =
        col(rn) === expr(s"($p * $n + 99) div 100")
      val wh = Window.partitionBy("g").orderBy(col("h"), col("k1"),
        col("k2"))
      base
        .withColumn("rh", row_number().over(wh))
        .filter(col("rh") <= 64)
        .withColumn("rs", row_number().over(wv).cast("long"))
        .withColumn("k_used", count(lit(1)).over(wg))
        .groupBy("g")
        .agg(max(col("k_used")).as("k_used"),
          max(when(pick(50, "rs", "k_used"), col("v")))
            .as("p50_sample"),
          max(when(pick(90, "rs", "k_used"), col("v")))
            .as("p90_sample"),
          max(when(pick(99, "rs", "k_used"), col("v")))
            .as("p99_sample"))
        .orderBy("g")
    },
    Some("""
      WITH base AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
          l_orderkey AS k1, l_linenumber AS k2,
          CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
            CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) AS h
        FROM lineitem),
      bottomk AS (
        SELECT g, v, k1, k2 FROM (
          SELECT g, v, k1, k2, row_number() OVER (PARTITION BY g
            ORDER BY h, k1, k2) AS rh FROM base)
        WHERE rh <= 64),
      sranked AS (
        SELECT g, v,
          row_number() OVER (PARTITION BY g ORDER BY v, k1, k2) AS rs,
          count(*) OVER (PARTITION BY g) AS k_used
        FROM bottomk)
      SELECT g, max(k_used) AS k_used,
        max(CASE WHEN rs = (50 * k_used + 99) // 100 THEN v END)
          AS p50_sample,
        max(CASE WHEN rs = (90 * k_used + 99) // 100 THEN v END)
          AS p90_sample,
        max(CASE WHEN rs = (99 * k_used + 99) // 100 THEN v END)
          AS p99_sample
      FROM sranked GROUP BY g
      ORDER BY g"""))

  /** Embedding cohort-drift monitor: split the vector table into two
    * deterministic cohorts (vec_id parity — the stand-in for "last
    * scrape vs this scrape") and compare their mean vectors: cosine
    * between centroids, the largest per-dimension mean gap, and how
    * many dimensions drifted past 0.05 — the check a pipeline runs
    * before mixing a re-scraped embedding batch into an existing ANN
    * index (a drifted encoder silently invalidates every stored
    * centroid/PQ codebook). Centroid sums are the same exact
    * 2^20-quantized integers as q_embed_centroids, folded in fixed
    * dimension order, so both engines emit identical doubles.
    *
    * Scale shape: one hash aggregation per (cohort, dim) — 128 cells
    * total regardless of corpus size — then a 1×1 crossJoin of two
    * 64-long arrays. Cost ≈ one narrow pass over the embedding
    * column.
    */
  val qEmbedDrift = QueryDef(
    "q_dq_embed_drift",
    (s, dir) => {
      val sums = Similarity.quantizedSums(
        Tables.t(s, dir, "embeddings"), col("vec_id") % 2)
      val a = sums.filter(col("k") === 0)
        .select(col("sarr").as("sa"), col("n").as("na"))
      val b = sums.filter(col("k") === 1)
        .select(col("sarr").as("sb"), col("n").as("nb"))
      val dot = expr(
        """aggregate(zip_with(sa, sb,
             (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
      def norm(c: String) = expr(
        s"""sqrt(aggregate(transform($c,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            CAST(0 AS DOUBLE), (acc, v) -> acc + v))""")
      val gaps = expr(
        """transform(zip_with(sa, sb,
             (x, y) -> abs(CAST(x AS DOUBLE) / CAST(na AS DOUBLE)
                         - CAST(y AS DOUBLE) / CAST(nb AS DOUBLE))),
           g -> g / 1048576.0)""")
      a.crossJoin(b)
        .select(col("na"), col("nb"),
          (dot / (norm("sa") * norm("sb"))).as("centroid_cos"),
          array_max(gaps).as("max_dim_gap"),
          size(filter(gaps, g => g > 0.05)).cast("long")
            .as("n_dims_drifted"))
    },
    Some("""
      WITH dims AS (
        SELECT vec_id % 2 AS cohort,
          unnest(generate_series(1, 64)) AS dim, embedding
        FROM embeddings),
      persum AS (
        SELECT cohort, dim,
          sum(CAST(round(CAST(embedding[CAST(dim AS INT)] AS DOUBLE)
            * 1048576.0) AS BIGINT)) AS sd,
          count(*) AS n
        FROM dims GROUP BY cohort, dim),
      sums AS (
        SELECT cohort, list(sd ORDER BY dim) AS sarr, max(n) AS n
        FROM persum GROUP BY cohort),
      ab AS (
        SELECT a.sarr AS sa, a.n AS na, b.sarr AS sb, b.n AS nb
        FROM sums a, sums b WHERE a.cohort = 0 AND b.cohort = 1),
      gaps AS (
        SELECT *,
          [abs(CAST(sa[i] AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(sb[i] AS DOUBLE) / CAST(nb AS DOUBLE)) / 1048576.0
           for i in generate_series(1, 64)] AS g
        FROM ab)
      SELECT na, nb,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          [CAST(sa[i] AS DOUBLE) * CAST(sb[i] AS DOUBLE)
           for i in generate_series(1, 64)]), (acc, v) -> acc + v)
        / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [CAST(sa[i] AS DOUBLE) * CAST(sa[i] AS DOUBLE)
             for i in generate_series(1, 64)]), (acc, v) -> acc + v))
           * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              [CAST(sb[i] AS DOUBLE) * CAST(sb[i] AS DOUBLE)
               for i in generate_series(1, 64)]), (acc, v) -> acc + v)))
          AS centroid_cos,
        list_max(g) AS max_dim_gap,
        CAST(len(list_filter(g, x -> x > 0.05)) AS BIGINT)
          AS n_dims_drifted
      FROM gaps"""))

  /** Cohort profile DRIFT: q_dq_profile compares a table to its
    * contract; this compares the table to ITSELF across two
    * deterministic cohorts (orderkey parity — the stand-in for "last
    * scrape vs this scrape") and flags per-column movement — the
    * check a pipeline runs before appending a new batch to a curated
    * table (a silently shifted value range or collapsed cardinality
    * means the upstream extractor changed, not the data). Every
    * statistic is exact (counts, null counts, exact distinct counts,
    * min/max) and every flag is integer arithmetic:
    * `range_drift` = either extreme moved; `card_drift` = distinct
    * count changed by more than 20% (|da−db|·5 > max(da,db)).
    *
    * Scale shape: ONE grouped scan for all non-distinct stats (the
    * cohort key just doubles the aggregate rows), one single-distinct
    * two-phase aggregate per column (the q_dq_profile Expand-dodge),
    * then a 4-row self-join — per-column work, constant output.
    */
  val qProfileDrift = QueryDef(
    "q_dq_profile_drift",
    (s, dir) => {
      val nums = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val li = T(s, dir, "lineitem")
        .withColumn("cohort", (col("l_orderkey") % 2).cast("long"))
      val aggs = Seq(count(lit(1)).as("n")) ++ nums.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max")))
      val wide = nums.foldLeft(
          li.groupBy("cohort").agg(aggs.head, aggs.tail: _*)) {
        (acc, c) => acc.join(
          li.groupBy("cohort")
            .agg(countDistinct(col(c)).as(s"${c}_dist")), "cohort")
      }
      val long = wide.select(col("cohort"), explode(array(nums.map(c =>
          struct(lit(c).as("col_name"), col("n").as("n"),
            col(s"${c}_nulls").as("n_nulls"),
            col(s"${c}_dist").as("n_distinct"),
            col(s"${c}_min").as("min_v"),
            col(s"${c}_max").as("max_v"))): _*)).as("p"))
        .select(col("cohort"), col("p.*"))
      val a = long.filter(col("cohort") === 0).drop("cohort")
      val b = long.filter(col("cohort") === 1).drop("cohort")
        .toDF("col_name", "n_b", "nulls_b", "dist_b", "min_b", "max_b")
      a.toDF("col_name", "n_a", "nulls_a", "dist_a", "min_a", "max_a")
        .join(b, "col_name")
        .withColumn("range_drift",
          col("min_a") =!= col("min_b") || col("max_a") =!= col("max_b"))
        .withColumn("card_drift",
          abs(col("dist_a") - col("dist_b")) * 5 >
            greatest(col("dist_a"), col("dist_b")))
        .orderBy("col_name")
    },
    Some("""
      WITH li AS (
        SELECT *, CAST(l_orderkey % 2 AS BIGINT) AS cohort
        FROM lineitem),
      stats AS (
        SELECT cohort, c AS col_name, count(*) AS n,
          CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          count(DISTINCT v) AS n_distinct,
          CAST(min(v) AS DOUBLE) AS min_v,
          CAST(max(v) AS DOUBLE) AS max_v
        FROM (
          SELECT cohort, 'l_quantity' AS c, l_quantity AS v FROM li
          UNION ALL
          SELECT cohort, 'l_extendedprice', l_extendedprice FROM li
          UNION ALL
          SELECT cohort, 'l_discount', l_discount FROM li
          UNION ALL
          SELECT cohort, 'l_tax', l_tax FROM li)
        GROUP BY cohort, c)
      SELECT a.col_name, a.n AS n_a, a.n_nulls AS nulls_a,
        a.n_distinct AS dist_a, a.min_v AS min_a, a.max_v AS max_a,
        b.n AS n_b, b.n_nulls AS nulls_b, b.n_distinct AS dist_b,
        b.min_v AS min_b, b.max_v AS max_b,
        (a.min_v <> b.min_v OR a.max_v <> b.max_v) AS range_drift,
        abs(a.n_distinct - b.n_distinct) * 5 >
          greatest(a.n_distinct, b.n_distinct) AS card_drift
      FROM stats a JOIN stats b
        ON a.col_name = b.col_name AND a.cohort = 0 AND b.cohort = 1
      ORDER BY a.col_name"""))

  val all: Seq[QueryDef] =
    Seq(qProfile, qChecks, qMad, qWinsorize, qBenford, qKs, qChisq,
      qKanon, qSkewKeys, qAbLift, qEmbedQa, qQuantileSample,
      qEmbedDrift, qProfileDrift)
}
