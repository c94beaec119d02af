package ptx.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hot-key-safe running aggregates: the two-phase segmented form of a
  * per-key running sum/count/min/max (r11, VERDICT r10 #3).
  *
  * The window form — `sum(x).over(Window.partitionBy(key).orderBy(ord))` —
  * hash-exchanges on the key and then ONE task sorts and scans each key's
  * entire history. No salt can split it: the scan is order-dependent, so a
  * hot key (the r10 probe measured 25.8× max/avg partition skew with 80%
  * of events on one user, docs/SCALE.md) becomes a straggler that caps the
  * whole stage at one core's throughput, at any cluster size.
  *
  * For RE-ASSOCIABLE running aggregates (sum, count, min, max — anything
  * with an associative merge) the scan decomposes like llm_pack_sequences' block
  * scan, generalized to a per-key grain:
  *   1. segment each row by a monotone function of its order key (e.g. the
  *      hour bucket of the timestamp) — so a (key, segment) slice is a
  *      CONTIGUOUS run of the key's order;
  *   2. per-(key, segment) totals — an ordinary hash aggregation,
  *      map-side-combined, never order-dependent;
  *   3. per-key prefix over the segment totals — a window over the
  *      (key, segment) frame, which holds ONE ROW per segment a key
  *      touches, not one per event: the hot key contributes #segments
  *      rows, bounded by the time span, not the volume;
  *   4. intra-segment running sum partitioned by (key, segment) + the
  *      segment prefix — the per-task work is now ONE SEGMENT of the hot
  *      key, so the straggler is capped at (hot-key rows / #segments).
  *
  * The join back on (key, segment) spreads the hot key across segments the
  * same way, so no single exchange bucket carries the whole key either.
  *
  * Exactness: for integer/decimal values the segmented result is
  * bit-identical to the window form (addition is associative). For float
  * doubles re-association perturbs ulps — cast to decimal first when exact
  * parity matters (OperatorSpec's parity test does).
  *
  * This is a library primitive, not a registry query: the declared
  * `win_running_sum` contract pins the window formulation (its oracle is
  * the SQL window), and this is the drop-in the same pipeline reaches for
  * when a key goes hot at 100 TB.
  *
  * Preconditions: `segment` must be monotone non-decreasing in the order
  * key within every key (a function of the leading order column qualifies),
  * rows with equal order keys must share a segment, and for a
  * DETERMINISTIC result the order keys must be unique within a key: the
  * equivalence below is against the ROWS-framed window
  * (`rowsBetween(unboundedPreceding, currentRow)` — the win_running_sum
  * formulation), and like that window, tied order keys make the per-row
  * prefix depend on the tie-internal order. (The default no-frame window
  * is RANGE-framed — all peers of a tied key included — which is a
  * DIFFERENT result under ties; this operator does not implement it.)
  */
object SegmentedScan {

  /** Running sum of `value` per `key` in `order`, computed segment-wise.
    * Output: the input columns plus `out` — identical rows to
    * `sum(value).over(Window.partitionBy(key*).orderBy(order*)
    * .rowsBetween(Window.unboundedPreceding, Window.currentRow))` (for
    * associative value types; see the ulp and unique-order-key notes
    * above). */
  def runningSum(df: DataFrame, key: Seq[String], order: Seq[String],
                 segment: Column, value: Column, out: String): DataFrame =
    runningAgg(df, key, order, segment, value, out, sum,
      // SQL sum semantics: NULL only while the whole prefix is NULL,
      // NULLs otherwise ignored
      (p, i) => when(p.isNull && i.isNull, lit(null))
        .otherwise(coalesce(p, lit(0)) + coalesce(i, lit(0))))

  /** Running min — associative and idempotent, so the same two-phase
    * decomposition applies verbatim; `least` already carries SQL
    * min-over-window NULL semantics (skip NULLs, NULL iff all are). */
  def runningMin(df: DataFrame, key: Seq[String], order: Seq[String],
                 segment: Column, value: Column, out: String): DataFrame =
    runningAgg(df, key, order, segment, value, out, min, least(_, _))

  /** Running max — see [[runningMin]]. */
  def runningMax(df: DataFrame, key: Seq[String], order: Seq[String],
                 segment: Column, value: Column, out: String): DataFrame =
    runningAgg(df, key, order, segment, value, out, max, greatest(_, _))

  /** Shared two-phase body: `aggFn` is the self-decomposable aggregate
    * (applied per segment AND to the prefix of segment partials — sum of
    * sums, min of mins, max of maxes), `combine` merges the prior-segment
    * prefix with the intra-segment running value under the aggregate's
    * own NULL semantics. */
  private def runningAgg(df: DataFrame, key: Seq[String], order: Seq[String],
                         segment: Column, value: Column, out: String,
                         aggFn: Column => Column,
                         combine: (Column, Column) => Column): DataFrame = {
    val segCol = "__ptx_seg"
    val preCol = "__ptx_seg_before"
    val keyCols = key.map(col)
    val base = df.withColumn(segCol, segment.cast("long"))
    // phase 1+2: per-(key, segment) partials — one row per touched segment
    val segTot = base.groupBy(keyCols :+ col(segCol): _*)
      .agg(aggFn(value).as("__ptx_seg_total"))
    // phase 3: per-key prefix over segment totals. The frame is
    // segment-count-sized; the hot key's partition here holds its
    // #segments rows, not its events. NO coalesce on the prefix: the
    // window form yields NULL when a row's whole prefix holds only NULL
    // values, and sum-over-segment-totals composes that exactly (a
    // segment total is NULL iff all its values are; the prefix of totals
    // is NULL iff no prior segment has a non-NULL value).
    val wSeg = Window.partitionBy(keyCols: _*).orderBy(col(segCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val segPre = segTot
      .withColumn(preCol, aggFn(col("__ptx_seg_total")).over(wSeg))
    // phase 4: intra-segment scan + prefix, joined back NULL-SAFELY: the
    // window form keeps rows with NULL keys/segment (they form their own
    // partition), so the join must too — a plain equi-join would silently
    // drop them. Renamed right-side keys avoid self-lineage ambiguity.
    val segPreR = segPre.select(
      key.zipWithIndex.map { case (k, i) => col(k).as(s"__ptx_k$i") } ++
        Seq(col(segCol).as("__ptx_segr"), col(preCol)): _*)
    val joinCond = (key.zipWithIndex.map { case (k, i) =>
      col(k) <=> col(s"__ptx_k$i") } :+ (col(segCol) <=> col("__ptx_segr")))
      .reduce(_ && _)
    val wIntra = Window.partitionBy(keyCols :+ col(segCol): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = aggFn(value).over(wIntra)
    base.join(segPreR, joinCond)
      // the combine carries the window form's NULL semantics: NULL iff
      // the row's ENTIRE prefix (prior segments + own segment up to
      // here) holds no non-NULL value
      .withColumn(out, combine(col(preCol), intra))
      // reselect to the input's column order (+ out): the join hoists its
      // keys to the front, and a drop-in must not reshape the frame
      .select(df.columns.map(col) :+ col(out): _*)
  }

  /** Running count per `key` in `order` — the other associative member the
    * r10 skew probe called out; same mechanics with a unit value. */
  def runningCount(df: DataFrame, key: Seq[String], order: Seq[String],
                   segment: Column, out: String): DataFrame =
    runningSum(df, key, order, segment, lit(1L), out)
}
