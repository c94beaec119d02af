package ptx.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Total-order presentation sort for DOMAIN-BOUNDED report frames — the r18
  * optimization replacement for a final `.orderBy(keys)` on outputs whose
  * row count is bounded by a key DOMAIN (l_returnflag, o_orderstatus,
  * event_type, source, hour-of-day, a fixed bucket grid …), not by the
  * corpus.
  *
  * Why (guide §2.4 "remove shuffles outright", §1.1 first-principles):
  * `orderBy` plans a range exchange, and Spark's RangePartitioner SAMPLES
  * the exchange's child to pick bounds — re-executing the entire child
  * subtree (the aggregation, its windows, everything above the last
  * materialized shuffle) once for the sample pass and again for the real
  * pass. For a report of a handful of rows that doubles the query's
  * dominant stage to decide bounds for ≤ a few hundred rows. A
  * single-partition exchange + in-partition sort produces the SAME rows in
  * the SAME total order (the sort keys are total on these frames — the
  * repo's hash-stability discipline already requires that) with no
  * sampling pass and one fewer scheduler round-trip.
  *
  * Scale posture: the collapsed exchange carries only the REPORT — rows
  * bounded by the key domain at ANY corpus size. The parallel work (scan,
  * partial/final aggregation) happens below the exchange, exactly as
  * before; only the already-tiny result funnels through one partition, the
  * same funnel `Verify`'s `coalesce(1)` dump or any driver `collect()` of
  * a report implies anyway. NEVER use this on corpus-proportional outputs
  * (row-level projections, per-entity frames) — those keep `orderBy`.
  */
object BoundedSort {
  /** `df.orderBy(keys)` for domain-bounded `df`, without the range
    * exchange's sampling re-execution: one-partition exchange, then an
    * in-partition total sort by `keys`. */
  def reportSort(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(keys: _*)

  /** `.reportSort(keys)` syntax so a call site is a one-token swap for the
    * `.orderBy(keys)` it replaces. */
  implicit class ReportSortOps(private val df: DataFrame) extends AnyVal {
    def reportSort(keys: Column*): DataFrame = BoundedSort.reportSort(df, keys: _*)
  }
}
