package ptx.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact interpolated per-group percentiles via ONE partition-sorted window
  * pass — the r18 optimization form of `expr("percentile(v, p)")`.
  *
  * Why (guide §2.1/§2.3): Spark's exact `percentile()` aggregate buffers
  * every (value → count) pair of a group into an OpenHashMap on the MAP
  * side, serializes the whole map through the exchange, re-merges it on the
  * reduce side and only then sorts — for a low-cardinality group key
  * (o_orderstatus: 3 values) that is one task hashing/serializing the whole
  * column per side, measured 1.9 s at sf0.1 for `agg_percentile` with ~1.2 s
  * of single-task time. The window form exchanges the bare (key, value)
  * rows once, sorts them inside the key partition (parallel across keys,
  * spillable, whole-stage-codegen'd), and reduces to one row per group with
  * an ordinary conditional hash-aggregation — no per-row state beyond the
  * sort. Same shuffled bytes, no giant hash maps, and the groupBy that
  * follows reuses the window's partitioning (zero extra exchanges).
  *
  * BIT-IDENTITY with the built-in (pinned by OperatorSpec): Spark's
  * `Percentile.getPercentile` computes `pos = p * (n - 1)`,
  * `lower = floor(pos)`, `higher = ceil(pos)` and returns `v[lower]` when
  * they coincide, else `(higher - pos) * v[lower] + (pos - lower) *
  * v[higher]` — reproduced below with the same double operations in the
  * same order. Ties in `v` are irrelevant (equal values, either picked);
  * NULL values are excluded exactly like the built-in. The one divergence:
  * a group whose values are ALL NULL yields no output row here (the
  * built-in yields a NULL percentile) — callers' value columns are
  * mandatory fixture columns, so the case cannot arise in the registry.
  *
  * Scale note (100 TB): identical posture to the built-in — exact
  * percentile work is proportional to group size either way (there: one
  * task's hash map per group; here: one sorted partition per group, which
  * SPILLS instead of OOMing). The declared bounded-memory path remains the
  * mergeable sketch (`agg_approx_percentile`).
  */
object ExactPercentiles {

  /** `df.groupBy(keys).agg(percentile(value, p) for p in ps)` with the
    * window formulation above. Output columns: `keys ++ outs` where
    * `outs(i)` is percentile `ps(i)` UNROUNDED (callers apply their own
    * rounding discipline). Extra per-group aggregates (e.g. `count`) can
    * be appended via `extraAggs` (evaluated on the ranked frame). */
  def groupPercentiles(df: DataFrame, keys: Seq[String], value: String,
                       ps: Seq[(Double, String)],
                       extraAggs: Seq[(Column, String)] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(value))
    // n over the same (partition, order) spec with an unbounded frame —
    // shares the single WindowExec (one exchange, one sort, one pass)
    val nw = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = df
      .filter(col(value).isNotNull) // percentile() ignores NULLs
      .select(keyCols :+ col(value): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(nw))
    // per requested p: the two candidate elements v[floor(pos)] /
    // v[ceil(pos)] selected by rank inside an ordinary hash agg
    def pos(p: Double): Column = lit(p) * (col("__n") - 1).cast("double")
    val sels = ps.zipWithIndex.flatMap { case ((p, _), i) =>
      Seq(
        min(when(col("__rn") === floor(pos(p)) + 1, col(value))).as(s"__lo$i"),
        min(when(col("__rn") === ceil(pos(p)) + 1, col(value))).as(s"__hi$i"))
    }
    val aggCols = (max(col("__n")).as("__n") +: sels) ++
      extraAggs.map { case (c, n) => c.as(n) }
    val agged = ranked.groupBy(keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    // final interpolation — Percentile.getPercentile's exact double ops
    val outs = ps.zipWithIndex.map { case ((p, name), i) =>
      val posc = pos(p)
      val lower = floor(posc)
      val higher = ceil(posc)
      when(higher === lower, col(s"__lo$i"))
        .otherwise((higher.cast("double") - posc) * col(s"__lo$i") +
          (posc - lower.cast("double")) * col(s"__hi$i"))
        .as(name)
    }
    val extraNames = extraAggs.map { case (_, n) => col(n) }
    agged.select(keyCols ++ outs ++ extraNames: _*)
  }

  /** `df.groupBy(keys).agg(percentile_disc(p) WITHIN GROUP (ORDER BY value))`
    * with the same one-window-pass formulation as [[groupPercentiles]] —
    * r18, for the same reason (the built-in buffers every value of a group
    * into one task's OpenHashMap on both exchange sides).
    *
    * SEMANTICS pinned to the SQL-standard definition — the smallest actual
    * value whose cumulative distribution ≥ p — expressed EXACTLY as the
    * repo's oracle encodes it (cume_dist() + conditional min, see the
    * agg_percentile_disc oracle SQL): both engines compute cume_dist as the
    * same IEEE double quotient, so the boundary behaviour matches the
    * oracle BY CONSTRUCTION rather than by reproducing the built-in's
    * internal `count ≥ p·n` arithmetic. OperatorSpec pins equality with the
    * built-in on the binding fixtures.
    *
    * CONTRACT (r19, ADVICE r18): NULL values are excluded like the
    * built-in, but a group whose values are ALL NULL yields NO OUTPUT ROW
    * here, whereas the built-in `percentile_disc` returns the group with a
    * NULL percentile. Safe for the current callers (mandatory, non-null
    * fixture columns); a future caller with a nullable value column that
    * needs the built-in's row-per-group behaviour must left-join this
    * result back to `df.select(keys).distinct()` — do NOT use this helper
    * as-is there, the missing rows are silent. */
  def groupPercentilesDisc(df: DataFrame, keys: Seq[String], value: String,
                           ps: Seq[(Double, String)]): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(value))
    val ranked = df
      .filter(col(value).isNotNull)
      .select(keyCols :+ col(value): _*)
      .withColumn("__cd", cume_dist().over(w))
    val sels = ps.map { case (p, name) =>
      min(when(col("__cd") >= p, col(value))).as(name)
    }
    ranked.groupBy(keyCols: _*).agg(sels.head, sels.tail: _*)
  }
}
