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

  /** Value-banded RANGE-frame sum (r12): the SegmentedScan idea at the
    * VALUE grain. Output: the input columns plus `out` — identical rows
    * to
    * `sum(value).over(Window.partitionBy(key*).orderBy(value)
    * .rangeBetween(-width, width))`
    * (the `win_range_frame` shape), WITHOUT the window form's
    * key-cardinality bound: that window serializes each key's entire
    * history into one task — `win_range_frame`'s o_orderstatus key has 3
    * values at ANY corpus size, so at 100 TB three tasks do all the work.
    *
    * Decomposition: band each row by `floor(value / width)`. Any two
    * values in the same band differ by < width, so the row's OWN band is
    * entirely in frame — one per-(key, band) total, no per-row work. The
    * frame can otherwise reach only the two ADJACENT bands (values from
    * band±2 differ by > width), and each neighbor's contribution is a
    * one-sided value-prefix query answered by an as-of lookup into that
    * band's per-distinct-value prefix sums:
    *   frame(v) = total(band)
    *            + Σ{v' ∈ band-1, v' ≥ v-width}   (= total - prefix<(v-width))
    *            + Σ{v' ∈ band+1, v' ≤ v+width}   (= prefix≤(v+width)).
    * Every exchange keys on (key, band) or the distinct (key, value)
    * grain — the straggler is one width-band of one key, not the key's
    * whole history. The trade (measured, MicroBench/SCALE.md): ~2.5×
    * constant-factor overhead vs the window while a key's history fits
    * one task; at scale the window's per-task bound is the key's WHOLE
    * history (does not complete for a 3-value key at 100 TB) while this
    * form's is one value band.
    *
    * Exactness: identical arithmetic to the window form for integral and
    * decimal values; double values re-associate (same ulp caveat as
    * [[runningSum]] — cast to decimal first when exact parity matters,
    * SkewSpec's parity tests do). The inclusive ±width bounds are
    * compared on the same `value - width` / `value + width` expressions
    * the window form evaluates, so boundary ties agree bit-for-bit; for
    * a WHOLE-number width over an integral or decimal value column the
    * bound literal is cast into the column's own type (r13, ADVICE r12),
    * so the as-of ordering runs in exact integer/decimal arithmetic for
    * the full value domain — no double widening through the refs∪probes
    * union. Remaining caveat: the BAND id is assigned by
    * `floor(value / width)` in double, so for |value| > 2^53 (or a
    * fractional width) two values within ±width could land in
    * non-adjacent bands through double rounding and miss each other's
    * frames — pre-scale such columns (e.g. cents → whole units) or widen
    * the band width so width ≫ the value's double ulp.
    * Rows with NULL `value` form their own band and match the window
    * form's NULL-partition behavior (their frame holds only NULL peers →
    * `out` is NULL; they never enter a non-NULL row's frame). NULL keys
    * are their own partition, like the window form (null-safe joins
    * throughout).
    */
  def rangeFrameSum(df: DataFrame, key: Seq[String], value: String,
                    width: Double, out: String): DataFrame =
    rangeFrameSumImpl(df, key, value, value, width, out)

  /** [[rangeFrameSum]] with the documented continuous-value hot-band
    * remedy applied IN the operator (r14; closes the SCALE.md residual):
    * the frame is evaluated on `value` snapped to an exact `grid`
    * (half-up: `floor(v/grid + 0.5)·grid`), while the SUMMAND stays the
    * original column. Output: `out` = Σ value over rows whose QUANTIZED
    * values differ by ≤ width — i.e. the window form run on the
    * quantized column, summing raw values.
    *
    * Why it exists: the banded decomposition's straggler bound is
    * |distinct values in a band|. For integral/decimal columns that is
    * ≤ width by construction; a CONTINUOUS column (distinct ≈ rows)
    * re-concentrates a hot band. Snapping to a grid restores the bound:
    * ≤ width/grid + 1 distinct values per band, rows-independent, at a
    * frame-boundary displacement of at most grid/2 per row.
    *
    * Exactness contract (SkewSpec): for data already ON a grid whose
    * points are exactly representable in double — an INTEGER grid
    * (1, 100, 400…) or a power-of-two fraction — the snap is the
    * identity and the result equals [[rangeFrameSum]] and the window
    * form bit-for-bit; off-grid data trades boundary membership within
    * grid/2 for the restored straggler bound. A FRACTIONAL decimal grid
    * (0.01 "cents") is NOT exactly representable (floor(v/grid+0.5)·grid
    * perturbs by an ulp even for on-grid v), so the identity does not
    * hold there: pre-scale such columns to integer units first (cents
    * as integers, ms as longs — what every declared query already does)
    * and pass an integer grid. Callers pick `grid` as the coarsest
    * resolution the analysis tolerates. */
  def rangeFrameSumQuantized(df: DataFrame, key: Seq[String], value: String,
                             width: Double, out: String,
                             grid: Double): DataFrame = {
    require(grid > 0 && grid <= width,
      s"grid must be in (0, width], got grid=$grid width=$width")
    val vq = "__ptx_vq"
    val snapped = df.withColumn(vq,
      floor(col(value) / lit(grid) + lit(0.5)) * lit(grid))
    rangeFrameSumImpl(snapped, key, vq, value, width, out).drop(vq)
  }

  /** Core of [[rangeFrameSum]]/[[rangeFrameSumQuantized]]: frames are
    * keyed on `frameValue`; sums aggregate `sumValue`. The two coincide
    * for the plain operator. */
  private def rangeFrameSumImpl(df: DataFrame, key: Seq[String],
                                frameValue: String, sumValue: String,
                                width: Double, out: String): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val value = frameValue
    val v = col(value)
    val band = floor(v / lit(width)).cast("long")
    val base = df.withColumn("__ptx_band", band)
    val keyCols = key.map(col)
    // per-(key, band, DISTINCT value): value-sums with an inclusive
    // value-prefix — one row per distinct value, so the as-of frame is
    // value-domain-sized, not row-sized. The frame sum is a pure
    // function of (key, value), so ALL per-row work below runs on this
    // distinct frame and joins back at the end (no row ids — duplicates
    // of a (key, value) pair share one computed frame).
    val g = base.groupBy(keyCols ++ Seq(col("__ptx_band"), v): _*)
      .agg(sum(col(sumValue)).as("__ptx_s"))
    val sType = g.schema("__ptx_s").dataType
    val wCum = Window.partitionBy(keyCols :+ col("__ptx_band"): _*)
      .orderBy(v).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCols :+ col("__ptx_band"): _*)
    // r19 note: pinning this distinct-value-grain apex (4 consumers) was
    // tried and MEASURED WORSE on win_range_banded (10 → 13 jobs, 28 →
    // 306 tasks, task time 4.9 → 42.8 s): the cache build + four
    // InMemory scans cost more than the re-aggregations ReuseExchange
    // already amortizes. Kept the recompute form.
    val gp = g
      .withColumn("__ptx_cum", sum(col("__ptx_s")).over(wCum))
      .withColumn("__ptx_tot", sum(col("__ptx_s")).over(wTot))
    val cumType = gp.schema("__ptx_cum").dataType
    val refs = gp.select(keyCols ++ Seq(col("__ptx_band").as("__ptx_qb"),
      v.as("__ptx_x"), lit(0).as("__ptx_tag"), col("__ptx_s"),
      col("__ptx_cum"), col("__ptx_tot"),
      lit(null).cast("long").as("__ptx_ob"),
      lit(null).cast(df.schema(value).dataType).as("__ptx_ov"),
      lit(null).cast("string").as("__ptx_side")): _*)
    // two probes per DISTINCT (key, value): x = v−width into band−1 and
    // x = v+width into band+1 — the SAME bound expressions the window
    // form evaluates, so boundary ties agree bit-for-bit. For a whole
    // width over an integral/decimal value the bound literal stays in
    // the column's own type (r13): the probe x then unions with the ref
    // x without widening to double, keeping the as-of ordering exact
    // over the full 64-bit/decimal domain.
    val wLit = {
      import org.apache.spark.sql.types._
      val whole = width == math.rint(width) && width.abs < 9.2e18
      df.schema(value).dataType match {
        // Guard the typed literal on representability: a whole width with
        // more integral digits than the column's (precision − scale) would
        // cast to NULL (non-ANSI overflow), nulling every probe bound and
        // silently zeroing the cross-band contribution. Fall back to the
        // double literal there — such a width exceeds the column's own
        // value domain anyway, so the exact-arithmetic motivation is moot.
        case dt: DecimalType
            if whole && width < math.pow(10, dt.precision - dt.scale) =>
          lit(width.toLong).cast(dt)
        case ByteType | ShortType | IntegerType | LongType if whole =>
          lit(width.toLong)
        case _ => lit(width)
      }
    }
    def probe(side: String, qb: Column, x: Column) = g.select(
      keyCols ++ Seq(qb.as("__ptx_qb"), x.as("__ptx_x"),
        lit(1).as("__ptx_tag"), lit(null).cast(sType).as("__ptx_s"),
        lit(null).cast(cumType).as("__ptx_cum"),
        lit(null).cast(cumType).as("__ptx_tot"),
        col("__ptx_band").as("__ptx_ob"), v.as("__ptx_ov"),
        lit(side).as("__ptx_side")): _*)
    val probes = probe("L", col("__ptx_band") - 1, v - wLit)
      .unionByName(probe("R", col("__ptx_band") + 1, v + wLit))
    // as-of: last reference row (tag 0 sorts before an equal-valued
    // probe, so an exact boundary tie matches inclusively) with
    // ref.value ≤ probe.x, per (key, target band)
    val wAsof = Window.partitionBy(keyCols :+ col("__ptx_qb"): _*)
      .orderBy(col("__ptx_x"), col("__ptx_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBand = Window.partitionBy(keyCols :+ col("__ptx_qb"): _*)
    val matched = refs.unionByName(probes)
      .withColumn("__ptx_mcum", last(col("__ptx_cum"), ignoreNulls = true).over(wAsof))
      .withColumn("__ptx_mval",
        last(when(col("__ptx_tag") === 0, col("__ptx_x")), ignoreNulls = true).over(wAsof))
      .withColumn("__ptx_ms", last(col("__ptx_s"), ignoreNulls = true).over(wAsof))
      .withColumn("__ptx_btot", max(col("__ptx_tot")).over(wBand))
      .filter(col("__ptx_tag") === 1)
    val zero = lit(0).cast(cumType)
    val contrib = when(col("__ptx_side") === "L",
      // Σ{v' ≥ x} = band total − prefix≤(match) + (match's own sum back
      // if it sits exactly on the bound, which is inclusive)
      coalesce(col("__ptx_btot"), zero) - coalesce(col("__ptx_mcum"), zero) +
        coalesce(when(col("__ptx_mval") === col("__ptx_x"), col("__ptx_ms")), zero))
      .otherwise(coalesce(col("__ptx_mcum"), zero)) // R: Σ{v' ≤ x}
    val neighbor = matched
      .groupBy(keyCols ++ Seq(col("__ptx_ob"), col("__ptx_ov")): _*)
      .agg(sum(contrib).as("__ptx_nb"))
      .select(key.zipWithIndex.map { case (k, i) => col(k).as(s"__ptx_k$i") } ++
        Seq(col("__ptx_ob"), col("__ptx_ov"), col("__ptx_nb")): _*)
    // own-band totals (the whole band is in frame) on the same
    // distinct-value grain
    val ownR = gp.select(
      key.zipWithIndex.map { case (k, i) => col(k).as(s"__ptx_j$i") } ++
        Seq(col("__ptx_band").as("__ptx_bandr"), v.as("__ptx_vr"),
          col("__ptx_tot").as("__ptx_own")): _*)
    // null-safe joins back to the input rows: NULL keys and the NULL-value
    // band are their own window partitions and must survive, like
    // runningAgg
    val ownCond = (key.zipWithIndex.map { case (k, i) =>
      col(k) <=> col(s"__ptx_j$i") } ++
      Seq(col("__ptx_band") <=> col("__ptx_bandr"), v <=> col("__ptx_vr")))
      .reduce(_ && _)
    val nbCond = (key.zipWithIndex.map { case (k, i) =>
      col(k) <=> col(s"__ptx_k$i") } ++
      Seq(col("__ptx_band") <=> col("__ptx_ob"), v <=> col("__ptx_ov")))
      .reduce(_ && _)
    base.join(ownR, ownCond)
      .join(neighbor, nbCond, "left_outer")
      // own band is NULL only for the NULL-value band (frame of NULL
      // peers) — adding the neighbor term must not resurrect it
      .withColumn(out, col("__ptx_own") + coalesce(col("__ptx_nb"), zero))
      .select(df.columns.map(col) :+ col(out): _*)
  }
}
