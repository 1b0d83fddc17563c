package graft.ops

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

  val all: Seq[QueryDef] = Seq(qAsofJoin, qGapFill, qIntervalJoin)
}
