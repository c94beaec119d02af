package ptx.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import ptx.{QFn, Tables}

/** G5 — window-function surface (SURVEY.md §2 G5).
  *
  * Scale notes (100 TB): every window here partitions by a high-cardinality
  * key (user_id, o_custkey, o_orderstatus) → one shuffle, then per-partition
  * sort. Global ranking (`win_rank_ties`, `win_ntile_cume`) deliberately
  * avoids `Window.orderBy` without partitioning — Spark executes that on a
  * SINGLE partition — and instead uses the distinct-value-distribution
  * pattern: aggregate to the order-key domain, window over that small set,
  * broadcast-join positions back. Only the (bounded) distinct domain ever
  * sits in one partition.
  */
object Windows {

  private def evw = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  def queries: Map[String, QFn] = Map(
    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_custkey"), col("rn"))
    }),
    "win_rank_ties" -> ((s, d) => {
      // Scalable global rank: a bare Window.orderBy would move ALL rows to
      // one partition. Instead aggregate to the distinct p_size domain
      // (≤50 values at any scale), rank that tiny set, broadcast-join back.
      // rank = 1 + #rows below; dense_rank = #distinct values ≤; identical
      // results to the window formulation (the DuckDB oracle).
      val p = Tables.part(s, d)
      val w = Window.orderBy(col("p_size"))
      val sizes = p.groupBy(col("p_size")).agg(count(lit(1)).as("cnt"))
        .withColumn("below", coalesce(
          sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("drnk", row_number().over(w))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_total"))))
        .select(col("p_size"),
          (col("below") + 1).as("rnk"), col("drnk"),
          round(col("below").cast("double") / (col("n_total") - 1), 6).as("prnk"))
      p.join(broadcast(sizes), Seq("p_size"))
        .select(col("p_partkey"), col("p_size"), col("rnk"), col("drnk"), col("prnk"))
        .orderBy(col("p_partkey"))
    }),
    "win_lag_lead" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"),
          round(col("value") - lag(col("value"), 1).over(evw), 6).as("delta"),
          lead(col("event_type"), 1).over(evw).as("next_type"))
        .orderBy(col("event_id"))
    }),
    "win_running_sum" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(
            evw.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running"))
        .orderBy(col("event_id"))
    }),
    "win_moving_avg" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(avg(col("value")).over(evw.rowsBetween(-6, 0)), 6).as("mavg"))
        .orderBy(col("event_id"))
    }),
    "win_range_frame" -> ((s, d) => {
      // DataFrame rangeBetween only takes Long offsets; the double-typed
      // RANGE frame over o_totalprice needs the SQL window form.
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(expr(
            """sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
              |RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING)""".stripMargin), 2)
            .as("near_sum"))
        .orderBy(col("o_orderkey"))
    }),
    // ✓ banded RANGE-frame sum (r12): the SAME ±width frame semantics as
    // win_range_frame, computed by ops.SegmentedScan.rangeFrameSum — the
    // value-banded decomposition that removes the window form's
    // key-cardinality bound (o_orderstatus has 3 values at ANY corpus
    // size, so the window caps at 3-way parallelism forever; the banded
    // form's straggler is one width-band of one key). Declared so the
    // scale-safe formulation is ORACLE-verified end-to-end, not just
    // unit-tested: unlike the quadratic anchors' ◌ twins, this twin is
    // EXACT, so it carries its own DuckDB oracle. Runs on integer cents
    // (round-then-cast — identical in both engines; a bare double→bigint
    // cast truncates in Spark but rounds in DuckDB) so the banded sums
    // are associative and bit-identical to the window's.
    "win_range_banded" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      ptx.ops.SegmentedScan.rangeFrameSum(
          o, key = Seq("o_orderstatus"), value = "cents",
          width = 10000.0, out = "near_sum")
        .orderBy(col("o_orderkey"))
    }),
    "win_ntile_cume" -> ((s, d) => {
      // Scalable ntile/cume_dist (same pattern as win_rank_ties): cumulative
      // counts over the distinct-acctbal distribution give each row's global
      // position = (#rows below) + (row_number among equal acctbals by
      // custkey, a per-value partitioned window). ntile(4) is then pure
      // arithmetic on the position, matching Spark/DuckDB tile semantics
      // (first n%4 tiles get one extra row).
      val c = Tables.customer(s, d)
      val wv = Window.orderBy(col("c_acctbal"))
      val dist = c.groupBy(col("c_acctbal")).agg(count(lit(1)).as("cnt"))
        .withColumn("below", coalesce(
          sum(col("cnt")).over(wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("cum", col("below") + col("cnt"))
      val withinW = Window.partitionBy(col("c_acctbal")).orderBy(col("c_custkey"))
      c.join(broadcast(dist), Seq("c_acctbal"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n"))))
        .withColumn("pos", col("below") + row_number().over(withinW))
        .withColumn("q", expr("n div 4")).withColumn("r", col("n") % 4)
        .select(col("c_custkey"),
          when(col("pos") <= col("r") * (col("q") + 1),
            expr("(pos - 1) div (q + 1)") + 1)
            .otherwise(col("r") + expr("(pos - r * (q + 1) - 1) div q") + 1)
            .as("quartile"),
          round(col("cum").cast("double") / col("n"), 6).as("cd"))
        .orderBy(col("c_custkey"))
    }),
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .select(col("event_id"), col("user_id"), col("day"),
          round(first(col("value")).over(w), 2).as("day_first"),
          round(last(col("value")).over(w), 2).as("day_last"))
        .orderBy(col("event_id"))
    }),
    // ✓ gaps-and-islands (r5): each user's error streaks via the
    // two-row_number difference — rn over all events minus rn over error
    // events is constant within a consecutive-error island — then one
    // aggregation per island and a per-user max. All three windows + both
    // aggregations partition by user_id: ONE shuffle, then a tiny
    // per-user frame. Reported: longest streak + number of streaks ≥ 2.
    "win_error_streaks" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byUserErr = Window.partitionBy(col("user_id"), col("is_err"))
        .orderBy(col("ts"), col("event_id"))
      val islands = Tables.events(s, d)
        .withColumn("is_err", (col("event_type") === "error").cast("int"))
        .withColumn("grp",
          row_number().over(byUser) - row_number().over(byUserErr))
        .filter(col("is_err") === 1)
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("streak"))
      islands.groupBy(col("user_id"))
        .agg(max(col("streak")).as("longest_streak"),
          sum(when(col("streak") >= 2, 1L).otherwise(0L)).as("n_multi_streaks"))
        .orderBy(col("user_id"))
    })
  )

  /** events with ns→µs-truncated ts, as DuckDB sees it after CAST. */
  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  def oracle: Map[String, String] = Map(
    "win_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_ties" ->
      """SELECT p_partkey, p_size,
        |  rank() OVER (ORDER BY p_size) AS rnk,
        |  dense_rank() OVER (ORDER BY p_size) AS drnk,
        |  round(percent_rank() OVER (ORDER BY p_size), 6) AS prnk
        |FROM part ORDER BY p_partkey""".stripMargin,
    "win_lag_lead" ->
      s"""SELECT event_id, user_id, round(value, 2) AS value,
        |  round(value - lag(value, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta,
        |  lead(event_type, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM $EV ORDER BY event_id""".stripMargin,
    "win_running_sum" ->
      s"""SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM $EV ORDER BY event_id""".stripMargin,
    "win_moving_avg" ->
      s"""SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mavg
        |FROM $EV ORDER BY event_id""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice
        |        RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING), 2) AS near_sum
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the banded twin's oracle IS the window form — on integer cents the
    // decomposition is bit-exact, so both engines' windows pin it.
    // DuckDB's sum(BIGINT) returns HUGEINT (int128): CAST back to BIGINT so
    // the typed hash matches Spark's int64 (values are identical either way).
    "win_range_banded" ->
      """WITH c AS (SELECT o_orderkey, o_orderstatus,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders)
        |SELECT o_orderkey, o_orderstatus, cents,
        |  CAST(sum(cents) OVER (PARTITION BY o_orderstatus ORDER BY cents
        |        RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
        |       AS BIGINT) AS near_sum
        |FROM c ORDER BY o_orderkey""".stripMargin,
    "win_ntile_cume" ->
      """SELECT c_custkey,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
        |  round(cume_dist() OVER (ORDER BY c_acctbal), 6) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_first_last" ->
      s"""SELECT event_id, user_id, day,
        |  round(first_value(value) OVER w, 2) AS day_first,
        |  round(last_value(value) OVER w, 2) AS day_last
        |FROM (SELECT *, CAST(ts AS DATE) AS day FROM $EV) e
        |WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "win_error_streaks" ->
      s"""WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |  FROM $EV),
        |grouped AS (
        |  SELECT user_id, is_err,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |       - row_number() OVER (PARTITION BY user_id, is_err
        |                            ORDER BY ts, event_id) AS grp
        |  FROM marked),
        |islands AS (
        |  SELECT user_id, grp, count(*) AS streak
        |  FROM grouped WHERE is_err = 1 GROUP BY user_id, grp)
        |SELECT user_id, max(streak) AS longest_streak,
        |       CAST(sum(CASE WHEN streak >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_multi_streaks
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
