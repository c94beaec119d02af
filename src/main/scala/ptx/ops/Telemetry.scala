package ptx.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import ptx.{QFn, Tables}

/** G9 — powertrain/telemetry analytics over `events` (SURVEY.md §2 G9).
  * Batch twins of the streaming pipelines in ptx.stream: tumbling/hopping
  * windows, gap sessionization, trip rollups, threshold alerts.
  *
  * Scale notes (100 TB): sessionization is one shuffle on user_id then two
  * window passes — the scalable form of per-key gap detection (no
  * self-join). Hopping windows expand each event into len/slide rows before
  * the aggregate; partial aggregation absorbs the 4× blowup map-side.
  * Threshold lookup is a broadcast join against a tiny static dimension.
  */
object Telemetry {

  /** Static per-type alert thresholds — the [PK]-flavored rule table. */
  val thresholds: Seq[(String, Double)] = Seq(
    "click" -> 300.0, "view" -> 310.0, "purchase" -> 290.0,
    "signup" -> 280.0, "error" -> 250.0)

  def queries: Map[String, QFn] = Map(
    "pt_threshold_alerts" -> ((s, d) => {
      val thr = s.createDataFrame(thresholds).toDF("event_type", "thr")
      Tables.events(s, d)
        .join(broadcast(thr), Seq("event_type"))
        .filter(col("value") > col("thr"))
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
        .orderBy(col("event_id"))
    }),
    "pt_tumbling_1h" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_val"))
        .orderBy(col("hour"), col("event_type"))
    }),
    "pt_sliding_1h_15m" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("w.start").as("hop_start"), col("event_type"), col("n"), col("sum_val"))
        .orderBy(col("hop_start"), col("event_type"))
    }),
    "pt_sessionize" -> ((s, d) => {
      sessions(s, d)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),
    "pt_trip_stats" -> ((s, d) => {
      sessions(s, d)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_val"),
          round(avg(col("value")), 6).as("avg_val"),
          round(max(col("sec")) - min(col("sec")), 6).as("duration_s"))
        .orderBy(col("user_id"), col("session_id"))
    }),
    // per-type z-score anomaly detection: per-type stats are rounded to 6dp
    // BEFORE the z computation so both engines derive z from identical
    // stats (raw avg/stddev differ in the last ulp across engines)
    "pt_anomaly_zscore" -> ((s, d) => {
      val e = Tables.events(s, d)
      val stats = e.groupBy(col("event_type"))
        .agg(round(avg(col("value")), 6).as("mu"),
          round(stddev_samp(col("value")), 6).as("sigma"))
      e.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 6))
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"),
          col("z"), (abs(col("z")) > 3.0).as("is_anomaly"))
        .orderBy(col("event_id"))
    }),
    // native session_window in the BATCH surface (its streaming twin is
    // ptx.stream.Pipelines.sessions); end = last event + gap by definition
    "pt_session_native" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_val"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_val"))
        .orderBy(col("user_id"), col("session_start"))
    }),
    "pt_daily_pivot" -> ((s, d) => {
      // conditional-agg pivot: deterministic column set, zero-filled
      val e = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      e.groupBy(col("day"))
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("click"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("error"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchase"),
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("signup"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("view"))
        .orderBy(col("day"))
    }),
    // per-user signal derivative: Δvalue/Δt (per second) between consecutive
    // events — the classic telemetry rate-of-change signal. NULL for a
    // user's first event and for zero Δt (duplicate-timestamp guard: double
    // ÷0 gives ±Inf in Spark but NULL in DuckDB — the CASE keeps both
    // engines identical). One shuffle on user_id, one lag pass.
    "pt_rate_of_change" -> ((s, d) => {
      val e = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.select(col("event_id"), col("user_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("pv"),
          lag(col("ts"), 1).over(w).as("pt"))
        .withColumn("dt_us", unix_micros(col("ts")) - unix_micros(col("pt")))
        .withColumn("dv_dt",
          when(col("pt").isNull || col("dt_us") === 0, lit(null))
            .otherwise((col("value") - col("pv")) * lit(1e6) / col("dt_us")))
        .select(col("event_id"), col("user_id"), col("ts"), col("dv_dt"))
        .orderBy(col("event_id"))
    }),
    // ✓ deterministic decimation (r4): keep every 10th event per user in
    // event-time order — the standard telemetry downsampling step before
    // long-horizon retention (100 TB/day in, 10 TB/day kept, exactly
    // reproducible unlike RNG sampling). One shuffle on user_id; the
    // count-based rule keeps per-user rates uniform regardless of each
    // user's event frequency.
    "pt_downsample" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter((col("rn") - 1) % 10 === 0)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("rn"))
        .orderBy(col("event_id"))
    })
  )

  /** Gap-based 30-min sessions: lag + cumulative-sum of gap>1800s flags.
    * Boundary semantics — verified empirically against `session_window`
    * (StreamingSpec "session boundary" test): Spark MERGES an event whose
    * gap is exactly the session timeout (per-event windows [ts, ts+gap)
    * are unioned when adjacent-or-overlapping, so an event landing exactly
    * on the previous window's end extends the session). Hence the split
    * predicate is strictly `gap > 1800`, matching both `session_window`
    * and the DuckDB oracle twin below. `sec` is the µs-exact epoch-seconds
    * double (cast of the µs-truncated ts), so both engines compute gaps
    * over identical values.
    */
  def sessionize(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("sec", col("ts").cast("double"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(wOrd))
      .withColumn("session_id",
        sum(when(col("gap").isNull || col("gap") > 1800.0, 1).otherwise(0)).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def sessions(s: org.apache.spark.sql.SparkSession, d: String) =
    sessionize(Tables.events(s, d))

  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** DuckDB twin of `sessions`. */
  private val SESS =
    s"""(SELECT user_id, ts, event_id, value,
       |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800.0 THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
       |  sec
       | FROM (SELECT *, epoch(ts) AS sec,
       |         epoch(ts) - lag(epoch(ts), 1)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       |       FROM $EV) g)""".stripMargin

  def oracle: Map[String, String] = Map(
    "pt_threshold_alerts" ->
      s"""SELECT event_id, event_type, round(value, 2) AS value
        |FROM $EV e JOIN (VALUES ('click', 300.0), ('view', 310.0), ('purchase', 290.0),
        |                        ('signup', 280.0), ('error', 250.0)) t(event_type, thr)
        |USING (event_type)
        |WHERE value > thr ORDER BY event_id""".stripMargin,
    "pt_tumbling_1h" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |       count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM $EV GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,
    "pt_sliding_1h_15m" ->
      s"""SELECT make_timestamp(((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900) * 1000000) AS hop_start,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM $EV e CROSS JOIN (VALUES (0), (1), (2), (3)) hops(k)
        |GROUP BY hop_start, event_type ORDER BY hop_start, event_type""".stripMargin,
    "pt_sessionize" ->
      s"""SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM $SESS GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "pt_trip_stats" ->
      s"""SELECT user_id, session_id, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_val, round(avg(value), 6) AS avg_val,
        |       round(max(sec) - min(sec), 6) AS duration_s
        |FROM $SESS GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "pt_anomaly_zscore" ->
      s"""SELECT event_id, e.event_type, round(value, 2) AS value,
        |       round((value - mu) / sigma, 6) AS z,
        |       abs(round((value - mu) / sigma, 6)) > 3.0 AS is_anomaly
        |FROM $EV e JOIN (
        |  SELECT event_type, round(avg(value), 6) AS mu,
        |         round(stddev_samp(value), 6) AS sigma
        |  FROM events GROUP BY event_type) st
        |ON e.event_type = st.event_type
        |ORDER BY event_id""".stripMargin,
    "pt_session_native" ->
      s"""SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_val
        |FROM $SESS GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "pt_daily_pivot" ->
      s"""SELECT CAST(ts AS DATE) AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM $EV GROUP BY day ORDER BY day""".stripMargin,
    "pt_rate_of_change" ->
      s"""WITH w AS (
        |  SELECT event_id, user_id, ts, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
        |  FROM $EV)
        |SELECT event_id, user_id, ts,
        |  CASE WHEN pt IS NULL OR epoch_us(ts) - epoch_us(pt) = 0 THEN NULL
        |       ELSE (value - pv) * 1e6 / (epoch_us(ts) - epoch_us(pt)) END AS dv_dt
        |FROM w ORDER BY event_id""".stripMargin,
    "pt_downsample" ->
      s"""SELECT event_id, user_id, ts, value, rn FROM (
        |  SELECT event_id, user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM $EV) t
        |WHERE (rn - 1) % 10 = 0 ORDER BY event_id""".stripMargin
  )
}
