package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Parity._

/** Time-series operators over the `events` stream table — as-of join
  * and gap-fill/downsample, the two ops a time-series engine adds on
  * top of plain SQL (the reference exposes neither — DataFusion 50 has
  * no ASOF JOIN, SURVEY.md §2B joins row — so these are extensions).
  *
  * Spark has no native as-of join either; the implementation uses the
  * union + ordered-window + `last(ignoreNulls)` pattern: one shuffle
  * on the series key, linear scan per partition — the idiomatic
  * at-scale formulation (no range explosion, no per-row probe).
  */
object TimeSeries {

  /** As-of join: each 'purchase' event matched to the user's most
    * recent prior-or-equal 'view' event (classic attribution). The
    * DuckDB oracle uses its native ASOF JOIN; rows tie-break views
    * before purchases at equal timestamps to match `<=` semantics
    * ((user_id, ts) is unique in the fixture, so this is latent).
    */
  val qAsofJoin = QueryDef(
    "q_ts_asof_join",
    (s, dir) => {
      val e = Tables.t(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
      // views sort before purchases at equal ts → view with ts == purchase
      // ts is eligible, matching the oracle's `v.ts <= p.ts`
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"),
          when(col("event_type") === "view", 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_view",
          last(when(col("event_type") === "view",
            struct(col("ts").as("vts"), col("event_id").as("vid"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"),
          col("last_view.vid").as("view_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("last_view.vts")))
            .as("lag_us"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id, v.event_id AS view_event_id,
        CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND v.ts <= p.ts
      ORDER BY p.event_id"""))

  /** Gap-fill + downsample: per-user daily click totals over a dense
    * calendar grid (users × sequence of days), missing days
    * forward-filled with `last(ignoreNulls)`. Grid generation is a
    * broadcastable dimension; the fill is one window pass per user.
    */
  val qGapFill = QueryDef(
    "q_ts_gapfill",
    (s, dir) => {
      val clicks = Tables.t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 5)
      val daily = clicks
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(dsum(col("value")).as("day_value"),
          count(lit(1)).as("n_events"))
      val days = s.range(1).select(explode(sequence(
        lit("2024-01-01").cast("timestamp"),
        lit("2024-01-30").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("day"))
      val users = clicks.select("user_id").distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(days))
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("day_value"),
          last(col("day_value"), ignoreNulls = true).over(w)
            .as("filled_value"))
        .orderBy("user_id", "day")
    },
    Some(s"""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          ${dsumSql("value")} AS day_value, count(*) AS n_events
        FROM events WHERE event_type = 'click' AND user_id < 5
        GROUP BY 1, 2),
      users AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'click' AND user_id < 5),
      days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                 TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day)
      SELECT u.user_id, d.day,
        coalesce(daily.n_events, 0) AS n_events,
        daily.day_value,
        last_value(daily.day_value IGNORE NULLS) OVER (
          PARTITION BY u.user_id ORDER BY d.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS filled_value
      FROM users u CROSS JOIN days d
      LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = d.day
      ORDER BY u.user_id, d.day"""))

  /** Interval (range) join: clicks landing inside the 10-minute
    * window after each error event of the same user. Spark OSS has no
    * range-join optimization, so a naive non-equi join degenerates to
    * a per-key nested loop; the scale path used here buckets time by
    * the window width and equi-joins on (user, bucket) — each
    * interval covers at most 2 buckets, so the join explodes
    * intervals ×2, keeps the shuffle key-based, and applies the exact
    * range as a residual filter.
    */
  val qIntervalJoin = QueryDef(
    "q_ts_interval_join",
    (s, dir) => {
      val winUs = 600000000L // 10 minutes
      val ev = Tables.t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("us").as("err_us"))
        // an interval [t, t+win) covers bucket(t) and bucket(t)+1
        .withColumn("bucket", explode(array(
          expr(s"err_us DIV $winUs"), expr(s"err_us DIV $winUs + 1"))))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("us").as("click_us"))
        .withColumn("bucket", expr(s"click_us DIV $winUs"))
      errors.join(clicks, Seq("user_id", "bucket"))
        .filter(col("click_us") >= col("err_us") &&
          col("click_us") < col("err_us") + winUs)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("err_id")
    },
    Some("""
      SELECT e.event_id AS err_id, count(*) AS n_clicks
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = e.user_id
       AND epoch_us(c.ts) >= epoch_us(e.ts)
       AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
      GROUP BY 1 ORDER BY err_id"""))

  /** Session gap in microseconds: a quiet period longer than this
    * starts a new session.
    */
  private val SessionGapUs = 1800000000L // 30 minutes

  /** Batch sessionization: split each user's event stream at >30 min
    * gaps (lag + conditional flag + running sum — the standard
    * windowed formulation) and aggregate per session. One shuffle on
    * user_id, two window passes over each partition; session counts
    * and timestamps are integer arithmetic, so both engines agree
    * bit-for-bit.
    */
  val qSessionize = QueryDef(
    "q_ts_sessionize",
    (s, dir) => {
      val wo = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev = Tables.t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(wo) > SessionGapUs ||
            lag(col("us"), 1).over(wo).isNull, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_sess")).over(wo.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("start_us"), col("end_us"),
          (col("end_us") - col("start_us")).as("duration_us"),
          col("n_purchases"))
        .orderBy("user_id", "session_id")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        FROM events),
      flagged AS (
        SELECT *, CASE WHEN us - lag(us) OVER w > $SessionGapUs
                         OR lag(us) OVER w IS NULL
                       THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      sess AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        count(*) AS n_events,
        CAST(min(us) AS BIGINT) AS start_us,
        CAST(max(us) AS BIGINT) AS end_us,
        CAST(max(us) - min(us) AS BIGINT) AS duration_us,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_purchases
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** OHLC downsample: per (event_type, hour) candlestick — open =
    * value at the first event of the bucket, close at the last,
    * high/low the extremes. Open/close are the values of the
    * struct-MIN/MAX over (ts, event_id, value) — associative, so the
    * whole candlestick is ONE pure hash aggregation with map-side
    * partials (the row_number formulation this replaced sorted every
    * bucket partition first); ties are deterministic because
    * event_id is unique, and values pass through un-aggregated (no
    * float summation), so both engines emit identical doubles.
    */
  val qOhlc = QueryDef(
    "q_ts_ohlc",
    (s, dir) => {
      Tables.t(s, dir, "events")
        .select(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
        .groupBy(col("event_type"), col("bucket_us"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("us"), col("event_id"), col("value")))
            .as("pf"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("us"), col("event_id"), col("value")))
            .as("pl"))
        .select(col("event_type"), col("bucket_us"), col("n"),
          col("pf.value").as("open"), col("high"), col("low"),
          col("pl.value").as("close"))
        .orderBy("event_type", "bucket_us")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
          CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
          ts, event_id, value,
          row_number() OVER (PARTITION BY event_type,
            date_trunc('hour', ts) ORDER BY ts, event_id) AS ra,
          row_number() OVER (PARTITION BY event_type,
            date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC) AS rd
        FROM events)
      SELECT event_type, bucket_us, count(*) AS n,
        min(CASE WHEN ra = 1 THEN value END) AS open,
        max(value) AS high, min(value) AS low,
        min(CASE WHEN rd = 1 THEN value END) AS close
      FROM ev GROUP BY event_type, bucket_us
      ORDER BY event_type, bucket_us"""))

  /** M4 downsampling (Jugel et al., VLDB 2014): per (series, pixel
    * bucket) keep the first, last, min and max points WITH their
    * timestamps — the four rows that make a line rendering of the
    * bucket pixel-identical to the full-resolution plot, where a
    * plain avg/minmax rollup visibly distorts extrema. The
    * visualization-serving twin of [[qOhlc]] (OHLC keeps values
    * only; M4's contract is point pairs). 15-minute buckets.
    *
    * Determinism: min/max points tie-break to the EARLIEST
    * (ts, event_id) attaining the extreme — encoded directly in the
    * aggregation by taking min/max over STRUCTS whose lexicographic
    * order is exactly the wanted tie-break (for the max point the
    * timestamp enters negated so value-ties resolve to the earliest
    * occurrence). Values pass through unaggregated — no float
    * summation anywhere. Scale shape: ONE pure hash aggregation with
    * map-side partials — no window, no per-partition sort — because
    * each extreme point is an associative struct-min/-max; that also
    * makes the operator incrementally mergeable, which is what the
    * streaming twin relies on. Output is 4 points per pixel
    * regardless of input rows, the property that makes dashboard
    * serving over a 100 TB series store constant-cost (see the 10×
    * smoke: wall-flat with constant output rows).
    */
  val qM4 = QueryDef(
    "q_ts_m4",
    (s, dir) => {
      val BucketUs = 900000000L // 15 min
      val ev = Tables.t(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("value"))
        .withColumn("bucket_us",
          expr(s"us div $BucketUs") * BucketUs)
      ev.groupBy(col("event_type"), col("bucket_us"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("us"), col("event_id"), col("value"))).as("pf"),
          max(struct(col("us"), col("event_id"), col("value"))).as("pl"),
          min(struct(col("value"), col("us"), col("event_id"))).as("pn"),
          max(struct(col("value"), (-col("us")).as("nus"),
            (-col("event_id")).as("nid"))).as("px"))
        .select(col("event_type"), col("bucket_us"), col("n"),
          col("pf.us").as("t_first"), col("pf.value").as("v_first"),
          col("pn.us").as("t_min"), col("pn.value").as("v_min"),
          (-col("px.nus")).as("t_max"), col("px.value").as("v_max"),
          col("pl.us").as("t_last"), col("pl.value").as("v_last"))
        .orderBy("event_type", "bucket_us")
    },
    Some("""
      WITH ev AS (
        SELECT event_type, epoch_us(ts) AS us, event_id, value,
          (epoch_us(ts) // 900000000) * 900000000 AS bucket_us
        FROM events),
      rn AS (
        SELECT *,
          row_number() OVER (PARTITION BY event_type, bucket_us
            ORDER BY us, event_id) AS ra,
          row_number() OVER (PARTITION BY event_type, bucket_us
            ORDER BY us DESC, event_id DESC) AS rd,
          row_number() OVER (PARTITION BY event_type, bucket_us
            ORDER BY value, us, event_id) AS rv,
          row_number() OVER (PARTITION BY event_type, bucket_us
            ORDER BY value DESC, us, event_id) AS rx
        FROM ev)
      SELECT event_type, CAST(bucket_us AS BIGINT) AS bucket_us,
        count(*) AS n,
        CAST(min(CASE WHEN ra = 1 THEN us END) AS BIGINT) AS t_first,
        min(CASE WHEN ra = 1 THEN value END) AS v_first,
        CAST(min(CASE WHEN rv = 1 THEN us END) AS BIGINT) AS t_min,
        min(value) AS v_min,
        CAST(min(CASE WHEN rx = 1 THEN us END) AS BIGINT) AS t_max,
        max(value) AS v_max,
        CAST(min(CASE WHEN rd = 1 THEN us END) AS BIGINT) AS t_last,
        min(CASE WHEN rd = 1 THEN value END) AS v_last
      FROM rn GROUP BY event_type, bucket_us
      ORDER BY event_type, bucket_us"""))

  /** Ordered funnel: per user, the first 'view', the first 'click'
    * strictly after it, and the first 'purchase' strictly after that
    * — the classic conversion-funnel shape. Each stage is a
    * groupBy(user) min over a stage-filtered join with the previous
    * stage, so the plan is three user-keyed shuffles with partial
    * aggregation; timestamps are integer micros, so both engines
    * agree exactly.
    */
  val qFunnel = QueryDef(
    "q_ts_funnel",
    (s, dir) => {
      val ev = Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val v1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c2 = ev.filter(col("event_type") === "click")
        .join(v1, "user_id").filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min("us").as("t2"))
      val p3 = ev.filter(col("event_type") === "purchase")
        .join(c2, "user_id").filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min("us").as("t3"))
      ev.select("user_id").distinct()
        .join(v1, Seq("user_id"), "left")
        .join(c2, Seq("user_id"), "left")
        .join(p3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          when(col("t3").isNotNull, 3L)
            .when(col("t2").isNotNull, 2L)
            .when(col("t1").isNotNull, 1L)
            .otherwise(0L).as("reached_step"))
        .orderBy("user_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v1 AS (SELECT user_id, min(us) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
      c2 AS (SELECT e.user_id, min(e.us) AS t2
             FROM ev e JOIN v1 ON v1.user_id = e.user_id
             WHERE e.event_type = 'click' AND e.us > v1.t1
             GROUP BY e.user_id),
      p3 AS (SELECT e.user_id, min(e.us) AS t3
             FROM ev e JOIN c2 ON c2.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.us > c2.t2
             GROUP BY e.user_id)
      SELECT u.user_id,
        CAST(t1 AS BIGINT) AS t1, CAST(t2 AS BIGINT) AS t2,
        CAST(t3 AS BIGINT) AS t3,
        CAST(CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1
                  ELSE 0 END AS BIGINT) AS reached_step
      FROM (SELECT DISTINCT user_id FROM ev) u
      LEFT JOIN v1 ON v1.user_id = u.user_id
      LEFT JOIN c2 ON c2.user_id = u.user_id
      LEFT JOIN p3 ON p3.user_id = u.user_id
      ORDER BY u.user_id"""))

  /** Hourly per-series sums as the shared input of the rate / EWMA /
    * anomaly operators: one (event_type, hour) shuffle with partial
    * aggregation, exact decimal sums so both engines see identical
    * doubles downstream.
    */
  private def hourly(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"))
      .agg(dsum(col("value")).as("bucket_sum"), count(lit(1)).as("n"))

  private val hourlySql: String = s"""
    hourly AS (
      SELECT event_type,
        CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
        ${dsumSql("value")} AS bucket_sum, count(*) AS n
      FROM events GROUP BY 1, 2)"""

  /** Per-series rate of change (the monitoring `rate()`/`delta()`
    * primitive): hourly sums per event_type, delta vs the previous
    * bucket via lag, normalized by the ACTUAL elapsed time between the
    * two buckets (lag returns the previous *existing* bucket, so with
    * missing hours the gap is a multiple of 3600 s — dividing by a
    * constant hour would overstate the rate by that factor). One
    * bucket-key shuffle plus one series-key window pass; the delta
    * subtracts two identical doubles and the elapsed micros are exact
    * integers divided by 1e6, so both engines agree bit-for-bit.
    */
  val qRate = QueryDef(
    "q_ts_rate",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
      hourly(s, dir)
        .select(col("event_type"), col("bucket_us"), col("n"),
          col("bucket_sum"),
          (col("bucket_sum") - lag(col("bucket_sum"), 1).over(w))
            .as("delta"),
          ((col("bucket_sum") - lag(col("bucket_sum"), 1).over(w)) /
            ((col("bucket_us") - lag(col("bucket_us"), 1).over(w)) / 1e6))
            .as("rate_per_s"))
        .orderBy("event_type", "bucket_us")
    },
    Some(s"""
      WITH $hourlySql
      SELECT event_type, bucket_us, n, bucket_sum,
        bucket_sum - lag(bucket_sum) OVER w AS delta,
        (bucket_sum - lag(bucket_sum) OVER w) /
          ((bucket_us - lag(bucket_us) OVER w) / 1e6) AS rate_per_s
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us)
      ORDER BY event_type, bucket_us"""))

  /** EWMA smoothing (α = 0.5) over each series' hourly sums. The
    * recurrence y = αx + (1-α)y' is a sequential float fold, so the
    * cross-engine-deterministic formulation is an ordered fold (see
    * the memory note on segment-tree window sums: a plain windowed
    * aggregate would NOT match) — and it runs ONCE per series as a
    * typed `flatMapGroups` fold: one shuffle on the series key, one
    * in-memory sort, one left-to-right JVM fold emitting every prefix
    * — genuinely O(B) work per series of B buckets (a Catalyst
    * `aggregate` building the prefix array via concat would copy the
    * accumulator per element, O(B²) again). Same double arithmetic in
    * the same order as DuckDB's list_reduce mirror. At
    * unbounded-stream scale the recurrence moves to
    * [[graft.streaming.StreamingIngest.ewma]] — the same fold as a
    * stateful op with one double of state per series, spec-proven
    * bit-identical to this batch fold across micro-batch splits.
    */
  val qEwma = QueryDef(
    "q_ts_ewma",
    (s, dir) => {
      import s.implicits._
      hourly(s, dir)
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (series, it) =>
          val pts = it.toArray.sortBy(_._2)
          var acc = 0.0
          var first = true
          pts.iterator.map { case (_, us, x) =>
            acc = if (first) { first = false; x } else 0.5 * x + 0.5 * acc
            (series, us, x, acc)
          }
        }
        .toDF("event_type", "bucket_us", "bucket_sum", "ewma")
        .orderBy("event_type", "bucket_us")
    },
    Some(s"""
      WITH $hourlySql,
      g AS (
        SELECT event_type,
          list(bucket_us ORDER BY bucket_us) AS us,
          list(bucket_sum ORDER BY bucket_us) AS sums
        FROM hourly GROUP BY event_type),
      e AS (
        SELECT event_type, us, sums,
          list_reduce(list_transform(sums, x -> [x]),
            (acc, x) -> list_append(acc, 0.5 * x[1] + 0.5 * acc[len(acc)]))
            AS ews
        FROM g)
      SELECT event_type, unnest(us) AS bucket_us,
        unnest(sums) AS bucket_sum, unnest(ews) AS ewma
      FROM e
      ORDER BY event_type, bucket_us"""))

  /** The Holt fold as CTEs ending in `holt(event_type, bucket_us,
    * bucket_sum, level, trend, forecast)` — shared by q_ts_holt and
    * the backtest evaluation.
    */
  private lazy val holtCtesSql: String = s"""$hourlySql,
      g AS (
        SELECT event_type,
          list(bucket_us ORDER BY bucket_us) AS us,
          list(bucket_sum ORDER BY bucket_us) AS sums
        FROM hourly GROUP BY event_type),
      f AS (
        SELECT event_type, us, sums,
          list_reduce(list_transform(sums, x -> [x, CAST(0 AS DOUBLE)]),
            (acc, x) -> list_concat(acc, [
              0.5 * x[1] + 0.5 * (acc[len(acc) - 1] + acc[len(acc)]),
              0.25 * ((0.5 * x[1] + 0.5 * (acc[len(acc) - 1]
                       + acc[len(acc)])) - acc[len(acc) - 1])
                + 0.75 * acc[len(acc)]])) AS fold
        FROM g),
      z AS (
        SELECT event_type, us, sums,
          [fold[2 * i - 1] FOR i IN generate_series(1, len(sums))] AS lvls,
          [fold[2 * i] FOR i IN generate_series(1, len(sums))] AS trends
        FROM f),
      holt AS (
        SELECT event_type, unnest(us) AS bucket_us,
          unnest(sums) AS bucket_sum, unnest(lvls) AS level,
          unnest(trends) AS trend,
          unnest(list_transform(generate_series(1, len(sums)),
            i -> lvls[i] + trends[i])) AS forecast
        FROM z)"""

  /** Holt linear (double-exponential) smoothing, α=0.5 β=0.25: level
    * AND trend per hourly bucket, plus the one-step-ahead forecast
    * l+b — the trend-aware upgrade of q_ts_ewma for drifting series.
    * Initialization l₁=x₁, b₁=0. Same cross-engine strategy as the
    * EWMA: a sequential two-variable float fold, run ONCE per series
    * as a typed flatMapGroups (O(B) per series of B buckets), mirrored
    * in DuckDB by a list_reduce whose accumulator appends (level,
    * trend) pairs — coefficients 0.5/0.25/0.75 are exact binary
    * doubles and the fold order is identical, so every output bit
    * matches. The recurrence uses only IEEE · and +, never pow/exp.
    */
  val qHolt = QueryDef(
    "q_ts_holt",
    (s, dir) => {
      import s.implicits._
      hourly(s, dir)
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (series, it) =>
          val pts = it.toArray.sortBy(_._2)
          var l = 0.0; var b = 0.0; var first = true
          pts.iterator.map { case (_, us, x) =>
            if (first) { l = x; b = 0.0; first = false }
            else {
              val lp = l
              l = 0.5 * x + 0.5 * (lp + b)
              b = 0.25 * (l - lp) + 0.75 * b
            }
            (series, us, x, l, b, l + b)
          }
        }
        .toDF("event_type", "bucket_us", "bucket_sum", "level", "trend",
          "forecast")
        .orderBy("event_type", "bucket_us")
    },
    Some(s"""
      WITH $holtCtesSql
      SELECT event_type, bucket_us, bucket_sum, level, trend, forecast
      FROM holt
      ORDER BY event_type, bucket_us"""))

  /** Holt backtest: one-step-ahead forecast error per series, scored
    * against the naive last-value forecast — the skill evaluation
    * ("is the model beating persistence?") a monitoring pipeline runs
    * before trusting a forecaster. skill = 1 − MAE_holt/MAE_naive;
    * positive means Holt beats persistence on that series.
    *
    * Determinism: per-row errors come from the same fold both engines
    * already agree on (q_ts_holt), then every accumulator is ALL
    * INTEGER (the q_ts_acf discipline): errors are floor-scaled to
    * integer MICRO-units — floor(err·1e6) is exact IEEE multiply +
    * floor, bit-identical everywhere — and summed as BIGINTs. Neither
    * decimal casts nor round() survive here: both round a DOUBLE at a
    * decimal digit and the two engines disagree near .5 boundaries on
    * arbitrary fold-output mantissas (observed at digit 10 with the
    * decimal accumulator and again at digit 9 with round(x,9) across
    * the two fixture scales). The 1e6 scale (not 1e9) buys overflow
    * headroom: the BIGINT accumulator holds ~9.2e12 of summed
    * absolute error per series before wrapping — ten years of hourly
    * buckets would need ~1e8 mean error to get there, vs ~1e5 at the
    * finer scale. A constant series (sae_naive = 0) gets a NULL
    * skill on BOTH sides — an unguarded 0/0 is NULL in Spark but NaN
    * in DuckDB (the qAcf trap). The final ratios are single IEEE
    * divisions of exact integers.
    *
    * Scale shape: one lag window per series over hourly buckets (tiny
    * frames), then a per-series aggregation — same shape as the fold
    * itself, linear in bucket count.
    */
  val qHoltBacktest = QueryDef(
    "q_ts_holt_backtest",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
      qHolt.run(s, dir)
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"),
          lag(col("forecast"), 1).over(w).as("fprev"),
          lag(col("bucket_sum"), 1).over(w).as("xprev"))
        .filter(col("fprev").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(abs(col("bucket_sum") - col("fprev")) * 1e6)
            .cast("long")).as("sae_holt"),
          sum(floor(abs(col("bucket_sum") - col("xprev")) * 1e6)
            .cast("long")).as("sae_naive"))
        .select(col("event_type"), col("n"),
          (col("sae_holt").cast("double") / 1e6 / col("n"))
            .as("mae_holt"),
          (col("sae_naive").cast("double") / 1e6 / col("n"))
            .as("mae_naive"),
          when(col("sae_naive") > 0,
            lit(1.0) - col("sae_holt").cast("double") /
              col("sae_naive").cast("double")).as("skill"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH $holtCtesSql,
      lagd AS (
        SELECT event_type, bucket_sum,
          lag(forecast) OVER (PARTITION BY event_type
            ORDER BY bucket_us) AS fprev,
          lag(bucket_sum) OVER (PARTITION BY event_type
            ORDER BY bucket_us) AS xprev
        FROM holt),
      agg AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(floor(abs(bucket_sum - fprev) * 1e6) AS BIGINT))
            AS BIGINT) AS sae_holt,
          CAST(sum(CAST(floor(abs(bucket_sum - xprev) * 1e6) AS BIGINT))
            AS BIGINT) AS sae_naive
        FROM lagd WHERE fprev IS NOT NULL
        GROUP BY event_type)
      SELECT event_type, n,
        CAST(sae_holt AS DOUBLE) / 1e6 / n AS mae_holt,
        CAST(sae_naive AS DOUBLE) / 1e6 / n AS mae_naive,
        CASE WHEN sae_naive > 0
          THEN 1.0 - CAST(sae_holt AS DOUBLE) / CAST(sae_naive AS DOUBLE)
        END AS skill
      FROM agg ORDER BY event_type"""))

  /** Hour-of-day seasonal decomposition: each hourly bucket scored
    * against its series' hour-of-day profile (mean and sample stddev
    * of all same-hour buckets) — residual and seasonal z-score. The
    * "is 3am traffic normal FOR 3am" question q_ts_anomaly's trailing
    * window can't answer. Profile means/variances come from exact
    * decimal sums (order-independent) with one IEEE sqrt, so both
    * engines score identically.
    *
    * Scale shape: the profile is a 24×series-key aggregate broadcast
    * back onto the buckets — no window at all, two shuffles total
    * (profile agg + presentation sort), flat at any history length.
    */
  val qSeasonal = QueryDef(
    "q_ts_seasonal",
    (s, dir) => {
      val withHod = hourly(s, dir)
        .withColumn("hod", expr(s"(bucket_us div ${3600000000L}) % 24"))
      // moments as bucket_us-ordered folds, NOT decimal sums: the
      // squared term is a full-precision double whose DECIMAL(28,10)
      // cast rounds differently across engines at 1-ulp boundaries
      // (surfaced at sf0.1 — invisible at sf0.01); the profile group
      // is ≤ corpus-days rows, so the fold is cheap
      val vals = transform(col("pts"), x => x.getField("bucket_sum"))
      val s1 = aggregate(vals, lit(0.0), (a, v) => a + v)
      val s2 = aggregate(vals, lit(0.0), (a, v) => a + v * v)
      val prof = withHod.groupBy(col("event_type").as("p_type"),
          col("hod").as("p_hod"))
        .agg(count(lit(1)).as("n_hod"),
          sort_array(collect_list(
            struct(col("bucket_us"), col("bucket_sum")))).as("pts"))
        .select(col("p_type"), col("p_hod"), col("n_hod"),
          (s1 / col("n_hod")).as("hod_mean"),
          ((s2 - s1 * s1 / col("n_hod")) / (col("n_hod") - 1))
            .as("hod_var"))
      withHod
        .join(broadcast(prof),
          col("event_type") === col("p_type") && col("hod") === col("p_hod"))
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"),
          col("hod"), col("n_hod"), col("hod_mean"),
          (col("bucket_sum") - col("hod_mean")).as("residual"),
          // n_hod >= 2 FIRST: a single-bucket hour makes the sample
          // variance 0/0, and DuckDB >= 1.1 defaults to IEEE NaN for
          // double/0 while Spark yields NULL — the false conjunct
          // short-circuits the comparison identically in both engines
          when(col("n_hod") >= 2 && col("hod_var") > 0.0,
            (col("bucket_sum") - col("hod_mean")) / sqrt(col("hod_var")))
            .as("seasonal_z"))
        .orderBy("event_type", "bucket_us")
    },
    Some(s"""
      WITH $hourlySql,
      hod AS (
        SELECT event_type, bucket_us, bucket_sum,
          (bucket_us // 3600000000) % 24 AS hod
        FROM hourly),
      prof0 AS (
        SELECT event_type AS p_type, hod AS p_hod,
          count(*) AS n_hod,
          list(bucket_sum ORDER BY bucket_us) AS vals
        FROM hod GROUP BY 1, 2),
      prof AS (
        SELECT p_type, p_hod, n_hod,
          list_reduce(list_prepend(0.0, vals), (a, v) -> a + v)
            / n_hod AS hod_mean,
          (list_reduce(list_prepend(0.0, vals), (a, v) -> a + v * v)
            - list_reduce(list_prepend(0.0, vals), (a, v) -> a + v)
              * list_reduce(list_prepend(0.0, vals), (a, v) -> a + v)
              / n_hod) / (n_hod - 1) AS hod_var
        FROM prof0)
      SELECT event_type, bucket_us, bucket_sum, hod, n_hod, hod_mean,
        bucket_sum - hod_mean AS residual,
        CASE WHEN n_hod >= 2 AND hod_var > 0.0
             THEN (bucket_sum - hod_mean) / sqrt(hod_var) END
          AS seasonal_z
      FROM hod JOIN prof
        ON event_type = p_type AND hod = p_hod
      ORDER BY event_type, bucket_us"""))

  /** Trailing-window z-score anomaly detection: each hourly bucket
    * scored against the previous 24 buckets of its series (mean /
    * sample stddev), flagged at |z| > 2.5. Sums and sums-of-squares
    * are ordered list folds for the same cross-engine reason as the
    * EWMA; mean/var/z are then identical-double arithmetic. The frame
    * is a constant 24 elements per row, so the window pass is O(1)
    * memory per series regardless of corpus size.
    */
  val qAnomaly = QueryDef(
    "q_ts_anomaly",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_us"))
        .rowsBetween(-24, -1)
      hourly(s, dir)
        .withColumn("hist", collect_list(col("bucket_sum")).over(w))
        .filter(size(col("hist")) >= 12)
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"),
          size(col("hist")).cast("long").as("n_hist"),
          expr("aggregate(hist, CAST(0 AS DOUBLE), (a, x) -> a + x)")
            .as("s1"),
          expr("aggregate(hist, CAST(0 AS DOUBLE), (a, x) -> a + x * x)")
            .as("s2"))
        .withColumn("mean", col("s1") / col("n_hist"))
        .withColumn("variance",
          (col("s2") - col("s1") * col("s1") / col("n_hist")) /
            (col("n_hist") - 1))
        .filter(col("variance") > 0)
        .withColumn("z",
          (col("bucket_sum") - col("mean")) / sqrt(col("variance")))
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"),
          col("n_hist"), col("mean"), col("z"),
          (abs(col("z")) > 2.5).as("is_anomaly"))
        .orderBy("event_type", "bucket_us")
    },
    Some(s"""
      WITH $hourlySql,
      framed AS (
        SELECT event_type, bucket_us, bucket_sum,
          list(bucket_sum) OVER (PARTITION BY event_type ORDER BY bucket_us
            ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS hist
        FROM hourly),
      folded AS (
        SELECT event_type, bucket_us, bucket_sum,
          CAST(len(hist) AS BIGINT) AS n_hist,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), hist),
            (a, x) -> a + x) AS s1,
          list_reduce(list_prepend(CAST(0 AS DOUBLE), hist),
            (a, x) -> a + x * x) AS s2
        FROM framed WHERE len(hist) >= 12),
      scored AS (
        SELECT event_type, bucket_us, bucket_sum, n_hist,
          s1 / n_hist AS mean,
          (s2 - s1 * s1 / n_hist) / (n_hist - 1) AS variance
        FROM folded)
      SELECT event_type, bucket_us, bucket_sum, n_hist, mean,
        (bucket_sum - mean) / sqrt(variance) AS z,
        abs((bucket_sum - mean) / sqrt(variance)) > 2.5 AS is_anomaly
      FROM scored WHERE variance > 0
      ORDER BY event_type, bucket_us"""))

  /** Weekly-epoch microseconds — integer week index, no calendar/tz
    * dependence, identical arithmetic in both engines. */
  private val WeekUs = 7L * 86400L * 1000000L

  /** Cohort retention matrix: users grouped by their first-seen week,
    * then for each week offset k the share of the cohort active again
    * k weeks later — the product-analytics counterpart of q_ts_funnel.
    * Week indexes are integer `us / WeekUs` buckets (calendar-free, so
    * the cohort assignment is reproducible across engines and
    * timezones).
    *
    * Scale shape: events collapse to distinct (user, week) FIRST (one
    * shuffle on the user-uniform key), the per-user first week is a
    * min over that compact set, and the (cohort, offset) aggregate has
    * weeks² keys — tiny forever. The cohort-size join is a broadcast
    * of one row per cohort week. No events-sized window anywhere.
    */
  val qRetention = QueryDef(
    "q_ts_retention",
    (s, dir) => {
      // `div`, not `/`: Column `/` is double division, and Spark's
      // double→long cast truncates while DuckDB's rounds — integer
      // division on both engines sidesteps the rounding-mode mismatch
      val uw = Tables.t(s, dir, "events")
        .select(col("user_id"),
          expr(s"unix_micros(ts) div $WeekUs").as("wk"))
        .distinct()
      val firstWk = uw.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      val joined = uw.join(firstWk, "user_id")
      val cohortSize = firstWk.groupBy(col("cohort_wk"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      joined
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(cohortSize), "cohort_wk")
        .select(col("cohort_wk"), col("offset"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double") / col("cohort_size"))
            .as("retention"))
        .orderBy("cohort_wk", "offset")
    },
    Some(s"""
      WITH uw AS (
        SELECT DISTINCT user_id,
          CAST(epoch_us(ts) // $WeekUs AS BIGINT) AS wk
        FROM events),
      first AS (
        SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id),
      size AS (
        SELECT cohort_wk, count(DISTINCT user_id) AS cohort_size
        FROM first GROUP BY cohort_wk)
      SELECT cohort_wk, wk - cohort_wk AS "offset",
        count(DISTINCT uw.user_id) AS n_active, cohort_size,
        CAST(count(DISTINCT uw.user_id) AS DOUBLE) / cohort_size
          AS retention
      FROM uw
      JOIN first ON uw.user_id = first.user_id
      JOIN size USING (cohort_wk)
      GROUP BY cohort_wk, wk - cohort_wk, cohort_size
      ORDER BY cohort_wk, "offset""""))

  /** Two-sided CUSUM change-point detection (Page 1954), slack
    * k = 0.5σ and decision interval h = 4σ — the standard
    * mean-shift monitor for pipeline drift: c⁺ᵢ = max(0, c⁺ᵢ₋₁ +
    * (xᵢ − μ − k)), c⁻ᵢ = max(0, c⁻ᵢ₋₁ + (μ − k − xᵢ)), flag when
    * either exceeds h. μ and σ come from left-to-right folds over the
    * series' ordered buckets (reduceLeft ↔ DuckDB list_reduce — same
    * order, bit-identical doubles), and the recurrence is +, −, ·,
    * max, sqrt only — all IEEE-exact, the EWMA/Holt fold discipline.
    * A constant series has σ = 0 and never flags (strict >).
    *
    * Scale shape: one typed flatMapGroups fold per series, O(B) per
    * series of B buckets — same as q_ts_ewma; the DuckDB mirror
    * prepends a (0,0) sentinel pair so the fold's init and step
    * clamp identically.
    */
  val qCusum = QueryDef(
    "q_ts_cusum",
    (s, dir) => {
      import s.implicits._
      hourly(s, dir)
        .select(col("event_type"), col("bucket_us"), col("bucket_sum"))
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (series, it) =>
          val pts = it.toArray.sortBy(_._2)
          val xs = pts.map(_._3)
          val n = xs.length
          val mu = xs.reduceLeft(_ + _) / n
          val sigma = math.sqrt(
            xs.map(x => (x - mu) * (x - mu)).reduceLeft(_ + _) / n)
          var cp = 0.0
          var cn = 0.0
          pts.iterator.map { case (_, us, x) =>
            cp = math.max(0.0, cp + (x - mu - 0.5 * sigma))
            cn = math.max(0.0, cn + (mu - 0.5 * sigma - x))
            (series, us, x, cp, cn,
              cp > 4.0 * sigma || cn > 4.0 * sigma)
          }
        }
        .toDF("event_type", "bucket_us", "bucket_sum", "cusum_pos",
          "cusum_neg", "is_shift")
        .orderBy("event_type", "bucket_us")
    },
    Some(s"""
      WITH $hourlySql,
      g AS (
        SELECT event_type,
          list(bucket_us ORDER BY bucket_us) AS us,
          list(bucket_sum ORDER BY bucket_us) AS sums
        FROM hourly GROUP BY event_type),
      m AS (
        SELECT event_type, us, sums,
          list_reduce(sums, (a, x) -> a + x) / len(sums) AS mu
        FROM g),
      sd AS (
        SELECT event_type, us, sums, mu,
          sqrt(list_reduce(list_transform(sums,
            x -> (x - mu) * (x - mu)), (a, x) -> a + x) / len(sums))
            AS sigma
        FROM m),
      f AS (
        SELECT event_type, us, sums, mu, sigma,
          list_reduce(list_concat(
            [[CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]],
            list_transform(sums,
              x -> [x - mu - 0.5 * sigma, mu - 0.5 * sigma - x])),
            (acc, p) -> list_concat(acc, [
              greatest(CAST(0 AS DOUBLE), acc[len(acc) - 1] + p[1]),
              greatest(CAST(0 AS DOUBLE), acc[len(acc)] + p[2])]))
            AS fold
        FROM sd),
      z AS (
        SELECT event_type, us, sums, sigma,
          [fold[2 * i + 1] FOR i IN generate_series(1, len(sums))]
            AS cps,
          [fold[2 * i + 2] FOR i IN generate_series(1, len(sums))]
            AS cns
        FROM f)
      SELECT event_type, unnest(us) AS bucket_us,
        unnest(sums) AS bucket_sum,
        unnest(cps) AS cusum_pos, unnest(cns) AS cusum_neg,
        unnest(list_transform(generate_series(1, len(sums)),
          i -> cps[i] > 4.0 * sigma OR cns[i] > 4.0 * sigma))
          AS is_shift
      FROM z
      ORDER BY event_type, bucket_us"""))

  /** Lagged autocorrelation (ACF at lags 1–3 hours) of per-series
    * hourly EVENT COUNTS: Pearson correlation over the paired sample
    * {(cₜ, cₜ₋ₖ)} — the seasonality/persistence diagnostic that tells
    * you whether q_ts_cusum's shifts are drift or cycles. Counts
    * (not float sums) are correlated deliberately: every moment sum
    * is then an exact 64-bit integer — no decimal rounding anywhere —
    * and the closed form touches floats only in the final
    * double-cast ·, −, /, sqrt, identical on both engines. (A
    * float-valued ACF would need Σx·y of arbitrary double products,
    * whose DECIMAL(28,10) rounding is the one place Spark and DuckDB
    * casts can disagree by an ulp.)
    *
    * Exactness bound: with B buckets the largest moment is
    * B·Σc² ≤ B²·max(c)² — 64-bit-exact for hourly counts up to ~8·10⁵
    * at B = 3.4k; past that, pre-scale counts (e.g. to thousands)
    * before correlating.
    *
    * Pairs come from an equi-join of the hourly frame onto itself at
    * bucket_us − k·3600s (missing buckets drop the pair, the
    * standard gapped-series treatment), so the plan is a key-based
    * hash join, never a window over the corpus.
    */
  val qAcf = QueryDef(
    "q_ts_acf",
    (s, dir) => {
      val h = hourly(s, dir)
        .select(col("event_type"), col("bucket_us"),
          col("n").cast("long").as("c"))
      val lags = h.select(col("event_type"), col("bucket_us"), col("c"),
          explode(sequence(lit(1), lit(3))).as("lag"))
        .withColumn("join_us",
          col("bucket_us") - col("lag") * lit(3600000000L))
      val pairs = lags.join(
        h.select(col("event_type"),
          col("bucket_us").as("join_us"),
          col("c").as("y")),
        Seq("event_type", "join_us"))
      // all-integer moment sums: exact in any order, both engines
      val num = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double")
      val vx = (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      val vy = (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double")
      pairs.groupBy(col("event_type"), col("lag").cast("long").as("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("c")).as("sx"), sum(col("y")).as("sy"),
          sum(col("c") * col("y")).as("sxy"),
          sum(col("c") * col("c")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // drop zero-variance lags BEFORE dividing: 0/0 is NULL in
        // Spark but NaN in DuckDB (ieee_floating_point_ops) — the
        // documented division parity trap
        .filter(vx > 0 && vy > 0)
        .select(col("event_type"), col("lag"), col("n"),
          (num / sqrt(vx * vy)).as("acf"))
        .orderBy("event_type", "lag")
    },
    Some(s"""
      WITH $hourlySql,
      lags AS (
        SELECT event_type, bucket_us, n AS c,
          CAST(unnest(generate_series(1, 3)) AS BIGINT) AS lag
        FROM hourly),
      pairs AS (
        SELECT l.event_type, l.lag, l.c AS x, h.n AS y
        FROM lags l JOIN hourly h
          ON h.event_type = l.event_type
         AND h.bucket_us = l.bucket_us - l.lag * 3600000000),
      agg AS (
        SELECT event_type, lag, count(*) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x * y) AS BIGINT) AS sxy,
          CAST(sum(x * x) AS BIGINT) AS sxx,
          CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2)
      SELECT event_type, lag, n,
        CAST(n * sxy - sx * sy AS DOUBLE) /
          sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             * CAST(n * syy - sy * sy AS DOUBLE)) AS acf
      FROM agg
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      ORDER BY event_type, lag"""))

  /** LTTB target bucket count per series. */
  private val LttbNB = 50

  /** Largest-Triangle-Three-Buckets downsample (Steinarsson 2013),
    * parallel "bucket-average" variant: per event_type series, split
    * the time range into NB equal buckets, and from each bucket keep
    * the point forming the largest triangle against the NEIGHBOR
    * BUCKETS' average points (classic LTTB anchors on the previously
    * *selected* point, a sequential dependency; anchoring on the
    * prev-bucket average is the standard parallelization and what
    * plotting backends ship). First/last existing buckets pin the
    * series' first/last points, preserving the envelope.
    *
    * Determinism: bucket averages use the exact decimal-sum route
    * (Parity.davg); the triangle area is *,−,abs on doubles (IEEE
    * exact); ties break on (us, event_id). Spark picks argmax via
    * max_by over a lexicographic struct — a two-phase aggregate, no
    * per-bucket sort — while the oracle uses a row_number window;
    * same selection, different mechanics.
    *
    * Scale shape: one bucket-key aggregate, a window over the tiny
    * NB-row bucket frame, a broadcast join back, and a max_by
    * aggregate. The corpus never funnels into the 250 (type, b) keys
    * as a sorted window — partial aggregation absorbs it map-side.
    */
  val qLttb = QueryDef(
    "q_ts_lttb",
    (s, dir) => {
      val ev = Tables.t(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("value"))
      val rng = ev.groupBy("event_type")
        .agg(min("us").as("min_us"), max("us").as("max_us"))
      val pts = ev.join(broadcast(rng), "event_type")
        .withColumn("b",
          expr(s"((us - min_us) * $LttbNB) div (max_us - min_us + 1)"))
      val bk = pts.groupBy(col("event_type"), col("b"))
        .agg(davg(col("us").cast("double")).as("ax"),
          davg(col("value")).as("ay"))
      val wb = Window.partitionBy(col("event_type")).orderBy(col("b"))
      val nbr = bk
        .withColumn("prev_ax", lag(col("ax"), 1).over(wb))
        .withColumn("prev_ay", lag(col("ay"), 1).over(wb))
        .withColumn("next_ax", lead(col("ax"), 1).over(wb))
        .withColumn("next_ay", lead(col("ay"), 1).over(wb))
        .drop("ax", "ay")
      val x = col("us").cast("double")
      val scored = pts.join(broadcast(nbr), Seq("event_type", "b"))
        .withColumn("score",
          when(col("prev_ax").isNull, -x)
            .when(col("next_ax").isNull, x)
            .otherwise(abs(
              (col("prev_ax") - col("next_ax")) *
                (col("value") - col("prev_ay")) -
              (col("prev_ax") - x) *
                (col("next_ay") - col("prev_ay")))))
      scored.groupBy(col("event_type"), col("b"))
        .agg(max_by(struct(col("us"), col("value")),
          struct(col("score"), (-col("us")).as("nus"),
            (-col("event_id")).as("nid"))).as("p"))
        .select(col("event_type"), col("b"), col("p.us").as("us"),
          col("p.value").as("value"))
        .orderBy("event_type", "b")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
          event_id, value
        FROM events),
      rng AS (
        SELECT event_type, min(us) AS min_us, max(us) AS max_us
        FROM ev GROUP BY 1),
      pts AS (
        SELECT ev.*, ((us - min_us) * $LttbNB)
          // (max_us - min_us + 1) AS b
        FROM ev JOIN rng USING (event_type)),
      bk AS (
        SELECT event_type, b,
          ${davgSql("CAST(us AS DOUBLE)")} AS ax,
          ${davgSql("value")} AS ay
        FROM pts GROUP BY 1, 2),
      nbr AS (
        SELECT event_type, b,
          lag(ax) OVER w AS prev_ax, lag(ay) OVER w AS prev_ay,
          lead(ax) OVER w AS next_ax, lead(ay) OVER w AS next_ay
        FROM bk WINDOW w AS (PARTITION BY event_type ORDER BY b)),
      sc AS (
        SELECT p.event_type, p.b, p.us, p.event_id, p.value,
          CASE WHEN n.prev_ax IS NULL THEN -CAST(p.us AS DOUBLE)
               WHEN n.next_ax IS NULL THEN CAST(p.us AS DOUBLE)
               ELSE abs((n.prev_ax - n.next_ax)
                      * (p.value - n.prev_ay)
                    - (n.prev_ax - CAST(p.us AS DOUBLE))
                      * (n.next_ay - n.prev_ay)) END AS score
        FROM pts p JOIN nbr n USING (event_type, b)),
      pick AS (
        SELECT event_type, b, us, value,
          row_number() OVER (PARTITION BY event_type, b
            ORDER BY score DESC, us, event_id) AS rn
        FROM sc)
      SELECT event_type, CAST(b AS BIGINT) AS b, us, value
      FROM pick WHERE rn = 1
      ORDER BY event_type, b"""))

  /** Time-weighted average (the monitoring `avg_over_time` on an
    * irregular series): each sample's value holds until the user's
    * next sample (step interpolation), so it is weighted by that hold
    * duration in microseconds; the final sample has no successor and
    * carries zero weight. Arithmetic discipline: the per-segment
    * products value×Δt are IEEE doubles (bit-identical across
    * engines), and the per-user sum runs as a time-ordered sequential
    * fold (the qEwma/qSurprise idiom — a plain SUM would re-associate
    * differently per engine), while the weight total is an exact
    * BIGINT sum. One shuffle on user_id for the lead() window, then a
    * per-user aggregate — no joins.
    */
  val qTwa = QueryDef(
    "q_ts_twa",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .select(col("user_id"), col("us"), col("event_id"),
          (col("next_us") - col("us")).as("dt_us"),
          (col("value") * (col("next_us") - col("us")).cast("double"))
            .as("wv"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dt_us")).as("span_us"),
          sort_array(collect_list(
            struct(col("us"), col("event_id"), col("wv")))).as("segs"))
        .select(col("user_id"), col("n_segments"), col("span_us"),
          (aggregate(transform(col("segs"), x => x.getField("wv")),
            lit(0.0), (acc, v) => acc + v)
            / col("span_us").cast("double")).as("twa"))
        .orderBy("user_id")
    },
    Some("""
      WITH pts AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
      seg AS (
        SELECT user_id, us, event_id, value,
          lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            AS next_us
        FROM pts),
      s2 AS (
        SELECT user_id, us, event_id, next_us - us AS dt_us,
          value * CAST(next_us - us AS DOUBLE) AS wv
        FROM seg WHERE next_us IS NOT NULL),
      g AS (
        SELECT user_id, count(*) AS n_segments,
          sum(dt_us) AS span_us,
          list(wv ORDER BY us, event_id) AS wvs
        FROM s2 GROUP BY user_id)
      SELECT user_id, n_segments, CAST(span_us AS BIGINT) AS span_us,
        list_reduce(list_prepend(0.0, wvs), (acc, v) -> acc + v)
          / CAST(span_us AS DOUBLE) AS twa
      FROM g ORDER BY user_id"""))

  /** Linear-interpolation gap fill — the companion to q_ts_gapfill's
    * forward fill: missing days on the dense user×day grid are filled
    * by interpolating between the previous and next OBSERVED day
    * values, weighted by actual time distance (so a value adjacent to
    * a long hole slopes across it instead of stair-stepping).
    * Leading/trailing holes (no observation on one side) stay NULL —
    * interpolation never extrapolates. Two window passes per user
    * (one backward, one forward) on one user-key shuffle; the
    * interpolation formula prev + (next−prev)·(Δt/Δspan) evaluates
    * left-to-right in IEEE doubles on integer-exact microsecond
    * deltas, so both engines agree bit-for-bit.
    */
  val qInterp = QueryDef(
    "q_ts_interp",
    (s, dir) => {
      val clicks = Tables.t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 5)
      val daily = clicks
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(dsum(col("value")).as("day_value"))
      val days = s.range(1).select(explode(sequence(
        lit("2024-01-01").cast("timestamp"),
        lit("2024-01-30").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("day"))
      val users = clicks.select("user_id").distinct()
      val wb = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obs = struct(unix_micros(col("day")).as("ous"),
        col("day_value").as("ov"))
      users.crossJoin(broadcast(days))
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("prev",
          last(when(col("day_value").isNotNull, obs), ignoreNulls = true)
            .over(wb))
        .withColumn("next",
          first(when(col("day_value").isNotNull, obs), ignoreNulls = true)
            .over(wf))
        .select(col("user_id"), col("day"), col("day_value"),
          when(col("day_value").isNotNull, col("day_value"))
            .when(col("prev").isNull || col("next").isNull, lit(null))
            .otherwise(col("prev.ov") +
              (col("next.ov") - col("prev.ov")) *
                ((unix_micros(col("day")) - col("prev.ous")).cast("double")
                  / (col("next.ous") - col("prev.ous")).cast("double")))
            .as("interp_value"))
        .orderBy("user_id", "day")
    },
    Some(s"""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          ${dsumSql("value")} AS day_value
        FROM events WHERE event_type = 'click' AND user_id < 5
        GROUP BY 1, 2),
      users AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'click' AND user_id < 5),
      days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                 TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS day),
      grid AS (
        SELECT u.user_id, d.day, daily.day_value,
          last_value(CASE WHEN daily.day_value IS NOT NULL THEN
              {'ous': epoch_us(d.day), 'ov': daily.day_value} END
              IGNORE NULLS) OVER (
            PARTITION BY u.user_id ORDER BY d.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
          first_value(CASE WHEN daily.day_value IS NOT NULL THEN
              {'ous': epoch_us(d.day), 'ov': daily.day_value} END
              IGNORE NULLS) OVER (
            PARTITION BY u.user_id ORDER BY d.day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
        FROM users u CROSS JOIN days d
        LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = d.day)
      SELECT user_id, day, day_value,
        CASE WHEN day_value IS NOT NULL THEN day_value
             WHEN prev IS NULL OR next IS NULL THEN NULL
             ELSE prev.ov + (next.ov - prev.ov) *
               (CAST(epoch_us(day) - prev.ous AS DOUBLE)
                 / CAST(next.ous - prev.ous AS DOUBLE)) END
          AS interp_value
      FROM grid ORDER BY user_id, day"""))

  /** Nearest-in-time join (symmetric as-of): each purchase matched to
    * the user's closest click within ±10 minutes by |Δt| (earlier
    * right event_id breaks ties). The scale path is the same
    * bucketize-and-equi-join used by q_ts_interval_join: time is
    * bucketed by the tolerance, the click side is exploded to its
    * bucket ±1 (any point within tolerance of a purchase lies in the
    * purchase's bucket or a neighbor), the join is a plain (user,
    * bucket) hash equi-join — never a per-user nested loop — and the
    * exact |Δt| ≤ tol predicate plus an argmin row_number run as
    * residual filters. ×3 row explosion on the smaller side buys a
    * key-partitioned shuffle that survives any scale.
    */
  val qNearestJoin = QueryDef(
    "q_ts_nearest_join",
    (s, dir) => {
      val tol = 600000000L // 10 minutes in µs
      val ev = Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      // integer `div`, not floor(us / tol): the double quotient of a
      // ~2^51 µs timestamp can round up across an exact bucket
      // boundary, silently disagreeing with the oracle's exact `//`
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("b", expr(s"us div ${tol}L"))
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("b", explode(array(expr(s"us div ${tol}L - 1"),
          expr(s"us div ${tol}L"), expr(s"us div ${tol}L + 1"))))
      val joined = purchases.alias("p")
        .join(clicks.alias("c"), Seq("user_id", "b"))
        .filter(abs(col("c.us") - col("p.us")) <= tol)
        .select(col("user_id"), col("p.event_id").as("event_id"),
          col("c.event_id").as("nearest_event_id"),
          (col("c.us") - col("p.us")).as("dt_us"))
      // nearest = struct-min over (|dt|, nearest_id) — one hash
      // aggregation instead of sorting each probe's candidate set
      joined.groupBy("user_id", "event_id")
        .agg(min(struct(abs(col("dt_us")).as("adt"),
          col("nearest_event_id"), col("dt_us"))).as("p"))
        .select(col("user_id"), col("event_id"),
          col("p.nearest_event_id").as("nearest_event_id"),
          col("p.dt_us").as("dt_us"))
        .orderBy("event_id")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events),
      p AS (SELECT user_id, event_id, us, us // ${600000000L} AS b
            FROM ev WHERE event_type = 'purchase'),
      c AS (SELECT user_id, event_id, us,
              unnest([us // ${600000000L} - 1, us // ${600000000L},
                      us // ${600000000L} + 1]) AS b
            FROM ev WHERE event_type = 'click'),
      j AS (
        SELECT p.user_id, p.event_id, c.event_id AS nearest_event_id,
          c.us - p.us AS dt_us
        FROM p JOIN c ON p.user_id = c.user_id AND p.b = c.b
        WHERE abs(c.us - p.us) <= ${600000000L}),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY event_id
            ORDER BY abs(dt_us), nearest_event_id) AS rn
        FROM j)
      SELECT user_id, event_id, nearest_event_id, dt_us
      FROM r WHERE rn = 1 ORDER BY event_id"""))

  /** The same purchase←view attribution through the CUSTOM as-of join
    * operator ([[graft.plans.AsofJoinExec]]: LogicalPlan + Strategy +
    * streaming-merge SparkPlan, the brief's option (c)), checked
    * against DuckDB's native ASOF LEFT JOIN. The right side dedups to
    * one row per (user, ts) first so `<=`-tie behavior is identical by
    * construction on both engines. One exchange per side (hash on
    * user), one sort per side, one O(1)-state merge pass — no window
    * materialization at all.
    */
  val qAsofNative = QueryDef(
    "q_ts_asof_native",
    (s, dir) => {
      val ev = Tables.t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"),
          unix_micros(col("ts")).as("v_us"))
        .agg(max("event_id").as("view_event_id"))
      graft.plans.GraftAsof
        .asofJoin(purchases, views, "user_id", "v_user", "p_us", "v_us")
        .select(col("event_id"), col("user_id"), col("view_event_id"),
          (col("p_us") - col("v_us")).as("lag_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS p_us
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT user_id AS v_user, CAST(epoch_us(ts) AS BIGINT) AS v_us,
          max(event_id) AS view_event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, v.view_event_id,
        p.p_us - v.v_us AS lag_us
      FROM p ASOF LEFT JOIN v
        ON p.user_id = v.v_user AND v.v_us <= p.p_us
      ORDER BY p.event_id"""))

  /** The custom operator's bounded-lookback path: views older than 1
    * hour don't attribute. The operator checks tolerance against the
    * LATEST eligible row only (an older row is farther away, so it
    * can never be in tolerance when the latest is not), which is
    * exactly a post-filtered ASOF — the DuckDB oracle states it that
    * way.
    */
  val qAsofTolerance = QueryDef(
    "q_ts_asof_tolerance",
    (s, dir) => {
      val ev = Tables.t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"),
          unix_micros(col("ts")).as("v_us"))
        .agg(max("event_id").as("view_event_id"))
      graft.plans.GraftAsof
        .asofJoin(purchases, views, "user_id", "v_user", "p_us", "v_us",
          toleranceUs = 3600L * 1000000L)
        .select(col("event_id"), col("user_id"), col("view_event_id"),
          (col("p_us") - col("v_us")).as("lag_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS p_us
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT user_id AS v_user, CAST(epoch_us(ts) AS BIGINT) AS v_us,
          max(event_id) AS view_event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      j AS (
        SELECT p.event_id, p.user_id, v.view_event_id,
          p.p_us - v.v_us AS lag_us
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.v_user AND v.v_us <= p.p_us)
      SELECT event_id, user_id,
        CASE WHEN lag_us <= 3600000000 THEN view_event_id END
          AS view_event_id,
        CASE WHEN lag_us <= 3600000000 THEN lag_us END AS lag_us
      FROM j ORDER BY event_id"""))

  /** Linear multi-touch attribution: every view in the hour before a
    * purchase shares the credit equally (1/n per touch). Candidate
    * pairs come from the same 2-bucket time-bucket equi-join as
    * q_ts_interval_join — never a per-user cross join — and the
    * fractional credits sum through the exact-decimal path (each 1/n
    * is computed by the identical IEEE division on both engines, then
    * summed order-independently).
    */
  val qAttrLinear = QueryDef(
    "q_attr_linear",
    (s, dir) => {
      val winUs = 3600000000L // 1 hour lookback
      val ev = Tables.t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("us").as("p_us"))
        .withColumn("bucket", explode(array(
          expr(s"p_us DIV $winUs"), expr(s"p_us DIV $winUs - 1"))))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_event_id"), col("user_id"),
          col("us").as("v_us"))
        .withColumn("bucket", expr(s"v_us DIV $winUs"))
      val pairs = p.join(v, Seq("user_id", "bucket"))
        .filter(col("v_us") >= col("p_us") - winUs &&
          col("v_us") <= col("p_us"))
        .select("p_id", "view_event_id")
      val n = pairs.groupBy("p_id").agg(count(lit(1)).as("n_touch"))
      pairs.join(n, "p_id")
        .withColumn("credit",
          lit(1.0).cast("double") / col("n_touch").cast("double"))
        .groupBy("view_event_id")
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("credit")).as("credit"))
        .orderBy(col("credit").desc, col("view_event_id"))
        .limit(20)
    },
    Some(s"""
      WITH p AS (
        SELECT event_id AS p_id, user_id,
          CAST(epoch_us(ts) AS BIGINT) AS p_us
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_event_id, user_id,
          CAST(epoch_us(ts) AS BIGINT) AS v_us
        FROM events WHERE event_type = 'view'),
      pairs AS (
        SELECT p_id, view_event_id
        FROM p JOIN v ON p.user_id = v.user_id
         AND v.v_us >= p.p_us - 3600000000
         AND v.v_us <= p.p_us),
      n AS (SELECT p_id, count(*) AS n_touch FROM pairs GROUP BY 1),
      c AS (
        SELECT view_event_id,
          CAST(1 AS DOUBLE) / CAST(n_touch AS DOUBLE) AS credit
        FROM pairs JOIN n USING (p_id))
      SELECT view_event_id, count(*) AS n_purchases,
        ${dsumSql("credit")} AS credit
      FROM c GROUP BY 1
      ORDER BY credit DESC, view_event_id LIMIT 20"""))

  /** Time-decay attribution: a view's credit halves every 30 minutes
    * of lag (1/2^k with k = lag div halflife, k capped at 30). Every
    * weight is an exact power of two — computed by integer shift, not
    * pow(), so there is no cross-engine libm drift ANYWHERE in the
    * query — and the weighted sums go through the exact-decimal path.
    * Same 2-bucket interval equi-join as q_attr_linear, 4 h window.
    */
  val qAttrDecay = QueryDef(
    "q_attr_decay",
    (s, dir) => {
      val winUs = 14400000000L // 4 hour lookback
      val halfUs = 1800000000L // 30 min half-life
      val ev = Tables.t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("us").as("p_us"))
        .withColumn("bucket", explode(array(
          expr(s"p_us DIV $winUs"), expr(s"p_us DIV $winUs - 1"))))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_event_id"), col("user_id"),
          col("us").as("v_us"))
        .withColumn("bucket", expr(s"v_us DIV $winUs"))
      p.join(v, Seq("user_id", "bucket"))
        .filter(col("v_us") >= col("p_us") - winUs &&
          col("v_us") <= col("p_us"))
        .withColumn("k",
          least(expr(s"(p_us - v_us) DIV $halfUs"), lit(30L)))
        .withColumn("wgt",
          lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), " +
            "CAST(k AS INT))").cast("double"))
        .groupBy("view_event_id")
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("wgt")).as("credit"))
        .orderBy(col("credit").desc, col("view_event_id"))
        .limit(20)
    },
    Some(s"""
      WITH p AS (
        SELECT event_id AS p_id, user_id,
          CAST(epoch_us(ts) AS BIGINT) AS p_us
        FROM events WHERE event_type = 'purchase'),
      v AS (
        SELECT event_id AS view_event_id, user_id,
          CAST(epoch_us(ts) AS BIGINT) AS v_us
        FROM events WHERE event_type = 'view'),
      pairs AS (
        SELECT view_event_id,
          least((p_us - v_us) // 1800000000, 30) AS k
        FROM p JOIN v ON p.user_id = v.user_id
         AND v.v_us >= p.p_us - 14400000000
         AND v.v_us <= p.p_us),
      c AS (
        SELECT view_event_id,
          CAST(1 AS DOUBLE) /
            CAST(CAST(1 AS BIGINT) << CAST(k AS INTEGER) AS DOUBLE)
            AS wgt
        FROM pairs)
      SELECT view_event_id, count(*) AS n_purchases,
        ${dsumSql("wgt")} AS credit
      FROM c GROUP BY 1
      ORDER BY credit DESC, view_event_id LIMIT 20"""))

  /** Rolling 7-day distinct active users per window-end day — the
    * standard WAU metric, in its at-scale formulation: collapse to
    * distinct (user, day) FIRST (one combining shuffle; the explode
    * then works on user-days, not raw events), fan each user-day out
    * to the ≤7 windows it supports, and count distinct users per
    * window end. Only full windows report (ends ≥ min_day + 6). All
    * integer day arithmetic — no date-function drift.
    */
  val qRollingDau = QueryDef(
    "q_ts_rolling_dau",
    (s, dir) => {
      val dayUs = 86400000000L
      val ud = Tables.t(s, dir, "events")
        .select(col("user_id"),
          expr(s"unix_micros(ts) DIV $dayUs").as("day"))
        .distinct()
      val bounds = ud.agg(min("day").as("min_day"), max("day").as("max_day"))
      ud.withColumn("i", explode(sequence(lit(0L), lit(6L))))
        .withColumn("d", col("day") + col("i"))
        .crossJoin(broadcast(bounds))
        .filter(col("d") >= col("min_day") + 6 &&
          col("d") <= col("max_day"))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy("d")
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id,
          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events),
      bounds AS (
        SELECT min(day) AS min_day, max(day) AS max_day FROM ud),
      fan AS (
        SELECT user_id, day + i AS d
        FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS i))
      SELECT d, count(DISTINCT user_id) AS wau
      FROM fan CROSS JOIN bounds
      WHERE d >= min_day + 6 AND d <= max_day
      GROUP BY d ORDER BY d"""))

  /** Rolling 7-day distinct users via MERGED DAILY HLL SKETCHES,
    * evaluated against the exact fan-out ([[qRollingDau]]) — the
    * query that shows WHY a 100 TB pipeline keeps per-day sketch
    * registers instead of user-day rows: the trailing-window merge
    * is an elementwise register max over 7×64 tiny rows per report
    * day, while the exact path ships every user-day 7×. Same
    * bit-deterministic HLL construction as q_vocab_hll (md5-derived
    * 6-bit bucket + 54-bit leading-zero rank, register sum scaled to
    * an exact BIGINT, one final double division); the merge itself
    * is the 7-day fan-out of each daily register followed by max —
    * associativity of register max IS the mergeability property
    * under test, and rel_err against the exact count is emitted per
    * day. Scale shape: one (user, day) distinct — which the exact
    * count needs anyway — then everything downstream is
    * days×64-sized, independent of corpus size.
    */
  val qRollingHll = QueryDef(
    "q_ts_rolling_hll",
    (s, dir) => {
      val dayUs = 86400000000L
      val two54 = 18014398509481984L
      val two55 = 36028797018963968L
      val ud = Tables.t(s, dir, "events")
        .select(col("user_id"),
          expr(s"unix_micros(ts) DIV $dayUs").as("day"))
        .distinct()
      val bounds = ud.agg(min("day").as("min_day"), max("day").as("max_day"))
      val regs = ud
        .select(col("day"),
          conv(substring(md5(col("user_id").cast("string")), 1, 15),
            16, 10).cast("long").as("h"))
        .select(col("day"), expr(s"h div $two54").as("bucket"),
          (col("h") % two54).as("rem"))
        .select(col("day"), col("bucket"),
          when(col("rem") === 0, lit(55L))
            .otherwise(lit(55L) - length(bin(col("rem"))).cast("long"))
            .as("rank"))
        .groupBy("day", "bucket").agg(max(col("rank")).as("m"))
      val merged = regs
        .withColumn("i", explode(sequence(lit(0L), lit(6L))))
        .withColumn("d", col("day") + col("i"))
        .crossJoin(broadcast(bounds))
        .filter(col("d") >= col("min_day") + 6 &&
          col("d") <= col("max_day"))
        .groupBy(col("d"), col("bucket")).agg(max(col("m")).as("mm"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(expr("CAST(1 AS BIGINT) << (55 - mm)")).as("s_present"))
        .select(col("d"),
          (col("s_present") +
            (lit(64L) - col("n_buckets")) * two55).as("s_total"))
      val exact = ud.withColumn("i", explode(sequence(lit(0L), lit(6L))))
        .withColumn("d", col("day") + col("i"))
        .crossJoin(broadcast(bounds))
        .filter(col("d") >= col("min_day") + 6 &&
          col("d") <= col("max_day"))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("wau"))
      exact.join(merged, "d")
        .select(col("d"), col("wau"),
          (lit(0.709).cast("double") * lit(4096.0) *
            lit(36028797018963968.0) / col("s_total").cast("double"))
            .as("hll_est"))
        .withColumn("rel_err",
          abs(col("hll_est") - col("wau").cast("double"))
            / col("wau").cast("double"))
        .orderBy("d")
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id,
          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events),
      bounds AS (
        SELECT min(day) AS min_day, max(day) AS max_day FROM ud),
      regs AS (
        SELECT day, h // 18014398509481984 AS bucket,
          max(CASE WHEN h % 18014398509481984 = 0 THEN 55
              ELSE 55 - length(bin(h % 18014398509481984)) END) AS m
        FROM (
          SELECT day,
            CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
          FROM ud)
        GROUP BY day, bucket),
      merged AS (
        SELECT d, bucket, max(m) AS mm FROM (
          SELECT day + i AS d, bucket, m
          FROM regs CROSS JOIN (SELECT unnest(range(0, 7)) AS i))
        CROSS JOIN bounds
        WHERE d >= min_day + 6 AND d <= max_day
        GROUP BY d, bucket),
      sums AS (
        SELECT d,
          sum(1::BIGINT << (55 - mm)) +
            (64 - count(*)) * 36028797018963968 AS s_total
        FROM merged GROUP BY d),
      exact AS (
        SELECT d, count(DISTINCT user_id) AS wau FROM (
          SELECT user_id, day + i AS d
          FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS i))
        CROSS JOIN bounds
        WHERE d >= min_day + 6 AND d <= max_day
        GROUP BY d)
      SELECT exact.d, wau,
        CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
          / CAST(s_total AS DOUBLE) AS hll_est,
        abs(CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
          / CAST(s_total AS DOUBLE) - CAST(wau AS DOUBLE))
          / CAST(wau AS DOUBLE) AS rel_err
      FROM exact JOIN sums ON exact.d = sums.d
      ORDER BY exact.d"""))

  /** SCD2 reconstruction: collapse each user's event stream into
    * state VALIDITY INTERVALS — consecutive same-type events merge
    * into one run, each run becomes a row with [valid_from, valid_to)
    * micros where valid_to is the next run's start (NULL on the
    * still-open last run) — the changelog→dimension-table transform
    * every lakehouse ingest of CDC data performs (Kimball type-2
    * history from an event log). Gaps-and-islands with integer
    * arithmetic only: one lag() to mark run starts, one prefix sum to
    * number runs, one lead() to close intervals — three passes over
    * the SAME user-keyed partitioning, a single shuffle.
    */
  val qScd2 = QueryDef(
    "q_ts_scd2",
    (s, dir) => {
      val ev = Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("state"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val runs = ev
        .withColumn("new_run",
          when(lag(col("state"), 1).over(w).isNull ||
            lag(col("state"), 1).over(w) =!= col("state"), 1)
            .otherwise(0))
        .withColumn("run_id",
          sum(col("new_run")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("run_id"))
        .agg(min(col("state")).as("state"),
          min(col("us")).as("valid_from"),
          count(lit(1)).as("n_events"))
      val wu = Window.partitionBy("user_id").orderBy("valid_from")
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wu))
        .select(col("user_id"), col("run_id"), col("state"),
          col("valid_from"), col("valid_to"), col("n_events"))
        .orderBy("user_id", "run_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type AS state,
          CAST(epoch_us(ts) AS BIGINT) AS us, event_id
        FROM events),
      marked AS (
        SELECT *, CASE WHEN lag(state) OVER w IS NULL
                        OR lag(state) OVER w <> state
                  THEN 1 ELSE 0 END AS new_run
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      runs AS (
        SELECT user_id,
          CAST(sum(new_run) OVER (PARTITION BY user_id
            ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS run_id,
          state, us
        FROM marked),
      grouped AS (
        SELECT user_id, run_id, min(state) AS state,
          min(us) AS valid_from, count(*) AS n_events
        FROM runs GROUP BY user_id, run_id)
      SELECT user_id, run_id, state, valid_from,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
          AS valid_to,
        n_events
      FROM grouped ORDER BY user_id, run_id"""))

  /** Per-series least-squares TREND: slope (value units per day) and
    * r² of value-vs-time — the regression complement to the
    * smoothing family (EWMA/Holt react to level; the fitted slope is
    * the drift monitor a metrics pipeline alarms on). All five
    * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT
    * BIGINT sums — x is the day index (≤ ~2·10⁴), y is the value in
    * floor-cents (an explicit floor: a bare double→BIGINT cast
    * truncates in Spark but rounds in DuckDB) — so every sum is
    * ≤ ~10¹⁵ ≪ 2⁵³ and converts to double EXACTLY; the closed-form
    * slope/r² arithmetic is then the identical IEEE sequence in both
    * engines. Headroom note: BIGINT sums hold to ~10⁹ rows/series at
    * cent precision; past that the same statistics go through
    * DECIMAL(38) unchanged. Scale shape: ONE hash aggregation with
    * map-side partials — sufficient statistics are the textbook
    * mergeable form (this is also what makes the op
    * streaming-expressible).
    */
  val qTrend = QueryDef(
    "q_ts_trend",
    (s, dir) => {
      val dayUs = 86400000000L
      val st = Tables.t(s, dir, "events")
        .select(col("event_type"),
          expr(s"unix_micros(ts) DIV $dayUs").as("x"),
          floor(col("value") * 100.0).as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sy = col("sy").cast("double")
      val sxy = col("sxy").cast("double")
      val sxx = col("sxx").cast("double")
      val syy = col("syy").cast("double")
      val cov = n * sxy - sx * sy
      val varx = n * sxx - sx * sx
      val vary = n * syy - sy * sy
      st.select(col("event_type"), col("n"),
          when(varx === 0.0, lit(null).cast("double"))
            .otherwise(cov / varx / lit(100.0)).as("slope_per_day"),
          when(varx * vary === 0.0, lit(null).cast("double"))
            .otherwise(cov * cov / (varx * vary)).as("r2"))
        .orderBy("event_type")
    },
    Some("""
      WITH st AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x * y) AS BIGINT) AS sxy,
          CAST(sum(x * x) AS BIGINT) AS sxx,
          CAST(sum(y * y) AS BIGINT) AS syy
        FROM (
          SELECT event_type,
            CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS x,
            CAST(floor(value * 100.0) AS BIGINT) AS y
          FROM events)
        GROUP BY event_type)
      SELECT event_type, n,
        CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
          THEN NULL ELSE
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0
          END AS slope_per_day,
        CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0
          THEN NULL ELSE
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          END AS r2
      FROM st ORDER BY event_type"""))

  /** The native whole-operator twin of q_ts_interval_join
    * (plans/IntervalJoin.scala): clicks are the probe points, errors
    * carry [err_us, err_us + 10 min) intervals, and the custom
    * IntervalJoinExec sweeps each user's sorted streams with an
    * active-interval buffer — per-key state is the concurrent-overlap
    * degree, and there's no bucket-granularity knob and no ×2
    * interval explosion. Identical oracle as the composed query, so
    * the two formulations are proven to agree bit-for-bit.
    */
  val qIntervalNative = QueryDef(
    "q_ts_interval_native",
    (s, dir) => {
      val winUs = 600000000L // 10 minutes
      val ev = Tables.t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("click_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"),
          col("user_id").as("e_user"), col("us").as("err_us"),
          (col("us") + winUs).as("err_end"))
      graft.plans.GraftInterval
        .intervalJoin(clicks, errors,
          "c_user", "e_user", "click_us", "err_us", "err_end")
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("err_id")
    },
    Some("""
      SELECT e.event_id AS err_id, count(*) AS n_clicks
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = e.user_id
       AND epoch_us(c.ts) >= epoch_us(e.ts)
       AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
      GROUP BY 1 ORDER BY err_id"""))

  /** Offline changepoint detection: the EXACT single best mean-shift
    * split per event_type series (binary-segmentation's first step /
    * CUSUM's offline dual) — "when did this metric's level change?"
    * for drift triage over ingest telemetry. For each candidate split
    * k the two-segment gain over the no-split model is
    * Sl²/nl + Sr²/nr − S²/n (the variance-reduction identity; the
    * Σx² term cancels), maximized exactly from ONE pass of prefix
    * sums.
    *
    * Parity discipline: the series is first aggregated to exact
    * integer day-cents (the heavy scan contracts to ≤ |days| rows per
    * type), prefix sums stay BIGINT (DuckDB's window sum widens to
    * HUGEINT — cast back), and the gain is ONE fixed double
    * expression over identical integer inputs, so both engines run
    * the same IEEE ops in the same order. Argmax tie-breaks on
    * earliest day via row_number (gain DESC, day ASC).
    *
    * Scale shape: one hash aggregation (events → type×day), one
    * window over ≤ days rows per type, one row per type out. The
    * window partitions are calendar-bounded, never corpus-bounded.
    */
  val qChangepoint = QueryDef(
    "q_ts_changepoint",
    (s, dir) => {
      val daily = Tables.t(s, dir, "events")
        .selectExpr("event_type", "CAST(ts AS DATE) AS day",
          "CAST(round(value * 100) AS BIGINT) AS cents")
        .groupBy("event_type", "day")
        .agg(sum("cents").as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val wAll = Window.partitionBy("event_type")
      val pre = daily
        .withColumn("sl", sum("x").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nl", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("st", sum("x").over(wAll))
        .withColumn("nt", count(lit(1)).over(wAll))
        .filter(col("nl") < col("nt"))
        .selectExpr("event_type", "day", "sl", "nl",
          "st - sl AS sr", "nt - nl AS nr", "st", "nt")
        .selectExpr("event_type", "day", "sl", "nl", "sr", "nr",
          """(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / CAST(nl AS DOUBLE)
             + (CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / CAST(nr AS DOUBLE)
             - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) / CAST(nt AS DOUBLE)
             AS gain""")
      pre.withColumn("rn", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("gain").desc, col("day"))))
        .filter(col("rn") === 1)
        .selectExpr("event_type", "day AS split_day",
          "nl AS n_left", "nr AS n_right",
          "CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_left_cents",
          "CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mean_right_cents",
          "gain")
        .orderBy("event_type")
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      pre AS (
        SELECT event_type, day,
          CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
          CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
          CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS st,
          CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nt
        FROM daily),
      gains AS (
        SELECT event_type, day, sl, nl, st - sl AS sr, nt - nl AS nr,
          (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / CAST(nl AS DOUBLE)
          + (CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE))
            / CAST(nt - nl AS DOUBLE)
          - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) / CAST(nt AS DOUBLE)
            AS gain
        FROM pre WHERE nl < nt),
      best AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY gain DESC, day) AS rn
        FROM gains)
      SELECT event_type, day AS split_day, nl AS n_left, nr AS n_right,
        CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_left_cents,
        CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mean_right_cents,
        gain
      FROM best WHERE rn = 1 ORDER BY event_type"""))

  val all: Seq[QueryDef] =
    Seq(qAsofJoin, qGapFill, qIntervalJoin, qSessionize, qOhlc, qM4,
      qFunnel,
      qRate, qEwma, qHolt, qAnomaly, qRetention, qSeasonal, qLttb,
      qCusum, qAcf, qHoltBacktest, qTwa, qInterp, qNearestJoin,
      qAsofNative, qAsofTolerance, qAttrLinear, qAttrDecay, qRollingDau,
      qIntervalNative, qRollingHll, qScd2, qTrend, qChangepoint)
}
