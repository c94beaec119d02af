package ptx

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import ptx.functions.Skew

/** Salting utilities: results must equal the unsalted formulations. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedAgg equals plain groupBy aggregation") {
    val e = Tables.events(spark, TestSpark.SF)
    val plain = e.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(e, col("user_id"), buckets = 8)(
        partial = g => g.agg(count(lit(1)).as("n"), sum("value").as("s")),
        merge = g => g.agg(sum("n").as("n"), round(sum("s"), 2).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedAgg never leaks __salt/__key internals into the output schema (r6)") {
    val e = Tables.events(spark, TestSpark.SF)
    val out = Skew.saltedAgg(e, col("user_id"), buckets = 8)(
      partial = g => g.agg(count(lit(1)).as("n")),
      merge = g => g.agg(sum("n").as("n")))
    // SURVEY §2.1(7): the salt derives from monotonically_increasing_id —
    // partition-layout-dependent, so it must be aggregated away, never
    // projected. The schema is the contract.
    assert(out.columns.toSeq == Seq("key", "n"))
    assert(!out.columns.exists(c => c.startsWith("__")))
    // and a merge phase that tries to project the salt is rejected loudly
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedAgg(e, col("user_id"), buckets = 8)(
        partial = g => g.agg(count(lit(1)).as("n")),
        merge = g => g.agg(sum("n").as("n"), max("__salt").as("__salt")))
    }
    assert(ex.getMessage.contains("salt"))
    // ...including under an innocent-looking ALIAS (the name check alone
    // would miss this; the plan-reference check catches it)
    val ex2 = intercept[IllegalArgumentException] {
      Skew.saltedAgg(e, col("user_id"), buckets = 8)(
        partial = g => g.agg(count(lit(1)).as("n")),
        merge = g => g.agg(sum("n").as("n"), max("__salt").as("salt_out")))
    }
    assert(ex2.getMessage.contains("salt"))
  }

  test("saltedJoin equals plain join (row multiplicity preserved)") {
    val e = Tables.events(spark, TestSpark.SF).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, TestSpark.SF)
      .select(col("user_id")).distinct()
      .withColumn("u_bucket", col("user_id") % 3)
      .withColumnRenamed("user_id", "u_id")
    val plain = e.join(dim, e("user_id") === dim("u_id"))
      .select("event_id", "u_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = Skew.saltedJoin(e, dim, "user_id", "u_id", buckets = 8)
      .select("event_id", "u_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("segmented running sum/count/min/max equals the window form exactly (r11)") {
    import org.apache.spark.sql.expressions.Window
    // decimal value → addition is associative → bit-exact parity between
    // the segment-wise decomposition and the single ordered scan
    val e = Tables.events(spark, TestSpark.SF)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
    // segment = hour bucket of ts: monotone in the leading order key
    val seg = expr("unix_micros(ts) div 3600000000")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = e
      .withColumn("run", sum(col("v")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("mn", min(col("v")).over(w))
      .withColumn("mx", max(col("v")).over(w))
      .select("event_id", "run", "cnt", "mn", "mx").collect()
      .map(r => r.getLong(0) ->
        (r.getDecimal(1), r.getLong(2), r.getDecimal(3), r.getDecimal(4))).toMap
    val segSum = ops.SegmentedScan.runningSum(e,
        key = Seq("user_id"), order = Seq("ts", "event_id"),
        segment = seg, value = col("v"), out = "run")
    val segCnt = ops.SegmentedScan.runningCount(segSum,
        key = Seq("user_id"), order = Seq("ts", "event_id"),
        segment = seg, out = "cnt")
    val segMin = ops.SegmentedScan.runningMin(segCnt,
        key = Seq("user_id"), order = Seq("ts", "event_id"),
        segment = seg, value = col("v"), out = "mn")
    val segmented = ops.SegmentedScan.runningMax(segMin,
        key = Seq("user_id"), order = Seq("ts", "event_id"),
        segment = seg, value = col("v"), out = "mx")
      .select("event_id", "run", "cnt", "mn", "mx").collect()
      .map(r => r.getLong(0) ->
        (r.getDecimal(1), r.getLong(2), r.getDecimal(3), r.getDecimal(4))).toMap
    assert(segmented.size == windowed.size && windowed.nonEmpty)
    assert(segmented == windowed)
    // output schema: input columns + the out column, no __ptx internals
    assert(segSum.columns.toSeq == e.columns.toSeq :+ "run")
  }

  test("segmented running sum parity under a synthetic hot key spanning many segments (r11)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 80% of rows on ONE key across 16 segments — the shape the window
    // form serializes into a single task and the segmented form splits
    val rows = (0 until 4000).map { i =>
      val key = if (i % 5 == 0) (i % 7).toLong + 1 else 0L // key 0 is hot
      (i.toLong, key, (i / 250).toLong, ((i * 37) % 100).toLong)
    }
    val df = rows.toDF("row_id", "k", "segment_src", "x")
    val w = Window.partitionBy(col("k")).orderBy(col("row_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("run", sum(col("x")).over(w))
      .select("row_id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = ops.SegmentedScan.runningSum(df,
        key = Seq("k"), order = Seq("row_id"),
        segment = col("segment_src"), value = col("x"), out = "run")
      .select("row_id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected && expected.size == 4000)
  }

  test("segmented running sum parity under NULL keys, NULL values, and a NULL segment (r11)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the window form KEEPS null-key rows (they form their own partition),
    // returns NULL while a row's whole prefix holds only NULL values, and
    // orders a NULL segment first — the segmented form must match on all
    // three (the first cut dropped null keys through its equi-join and
    // coalesced the all-NULL prefix to 0)
    val rows: Seq[(Long, Option[Long], Option[Long], Option[Long])] = Seq(
      (0L, Some(1L), Some(0L), None),     // null value heads the prefix
      (1L, Some(1L), Some(0L), Some(5L)),
      (2L, Some(1L), Some(1L), None),     // null value mid-stream: run stays 5
      (3L, Some(1L), Some(2L), Some(7L)),
      (4L, None, Some(0L), Some(3L)),     // NULL key partition
      (5L, None, Some(1L), None),
      (6L, None, Some(1L), Some(4L)),
      (7L, Some(2L), None, Some(9L)),     // NULL segment: first in order
      (8L, Some(2L), Some(0L), Some(1L)),
      (9L, Some(3L), Some(0L), None),     // all-NULL key: run is NULL…
      (10L, Some(3L), Some(1L), None))    // …all the way down
    val df = rows.toDF("row_id", "k", "segment_src", "x")
    val w = Window.partitionBy(col("k")).orderBy(col("row_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def runOf(r: org.apache.spark.sql.Row): (Long, Option[Long]) =
      r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])
    val expected = df.withColumn("run", sum(col("x")).over(w))
      .select("row_id", "run").collect().map(runOf).toMap
    val got = ops.SegmentedScan.runningSum(df,
        key = Seq("k"), order = Seq("row_id"),
        segment = col("segment_src"), value = col("x"), out = "run")
      .select("row_id", "run").collect().map(runOf).toMap
    assert(got == expected && expected.size == rows.size)
    // min/max share the body; their NULL semantics ride least/greatest
    val expMin = df.withColumn("run", min(col("x")).over(w))
      .select("row_id", "run").collect().map(runOf).toMap
    val gotMin = ops.SegmentedScan.runningMin(df,
        key = Seq("k"), order = Seq("row_id"),
        segment = col("segment_src"), value = col("x"), out = "run")
      .select("row_id", "run").collect().map(runOf).toMap
    assert(gotMin == expMin, "runningMin NULL parity diverged")
    val expMax = df.withColumn("run", max(col("x")).over(w))
      .select("row_id", "run").collect().map(runOf).toMap
    val gotMax = ops.SegmentedScan.runningMax(df,
        key = Seq("k"), order = Seq("row_id"),
        segment = col("segment_src"), value = col("x"), out = "run")
      .select("row_id", "run").collect().map(runOf).toMap
    assert(gotMax == expMax, "runningMax NULL parity diverged")
    assert(expected(9L).isEmpty && expected(10L).isEmpty,
      "fixture must exercise the all-NULL-prefix row")
    assert(got.contains(4L) && got(4L).contains(3L),
      "fixture must exercise the NULL-key partition")
  }

  test("segmented running agg parity sweep: 500 seeded random rows, random NULLs, all three members (r11)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // seeded generator (no scalacheck offline — house pattern): random
    // keys incl. NULL, random segment drawn monotone in row_id, ~20%
    // NULL values; the window form is the executable spec
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, Option[Long], Long, Option[Long])] =
      (0 until 500).map { i =>
        val key = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(7).toLong)
        // monotone in row_id (precondition); irregular widths via sqrt
        val seg = math.sqrt(i * 8).toLong / 4
        val v = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toLong - 500)
        (i.toLong, key, seg, v)
      }
    val df = rows.toDF("row_id", "k", "seg", "x")
    val w = Window.partitionBy(col("k")).orderBy(col("row_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def runOf(r: org.apache.spark.sql.Row): (Long, Option[Long]) =
      r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])
    for ((name, winAgg, segFn) <- Seq[(String,
        org.apache.spark.sql.Column,
        (org.apache.spark.sql.DataFrame, Seq[String], Seq[String],
         org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         String) => org.apache.spark.sql.DataFrame)](
        ("sum", sum(col("x")).over(w), ops.SegmentedScan.runningSum),
        ("min", min(col("x")).over(w), ops.SegmentedScan.runningMin),
        ("max", max(col("x")).over(w), ops.SegmentedScan.runningMax))) {
      val expected = df.withColumn("run", winAgg)
        .select("row_id", "run").collect().map(runOf).toMap
      val got = segFn(df, Seq("k"), Seq("row_id"), col("seg"), col("x"), "run")
        .select("row_id", "run").collect().map(runOf).toMap
      assert(got == expected, s"running $name diverged on the random sweep")
    }
  }

  test("value-banded range-frame sum equals the RANGE window form exactly (r12)") {
    import org.apache.spark.sql.expressions.Window
    // the win_range_frame shape on the real fixture, value lifted to
    // exact integer cents so parity is bit-exact (sum re-association)
    val o = Tables.orders(spark, TestSpark.SF)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("cents"))
      .rangeBetween(-10000L, 10000L)
    val expected = o.withColumn("near", sum(col("cents")).over(w))
      .select("o_orderkey", "near").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ops.SegmentedScan.rangeFrameSum(
      o, key = Seq("o_orderstatus"), value = "cents",
      width = 10000.0, out = "near")
    val gotMap = got.select("o_orderkey", "near").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap.size == expected.size && expected.nonEmpty)
    assert(gotMap == expected)
    // output schema: input columns + out, no __ptx internals
    assert(got.columns.toSeq == o.columns.toSeq :+ "near")
  }

  test("range-frame sum parity sweep: seeded random rows, NULL keys/values, boundary ties (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // seeded generator (house pattern): random keys incl NULL, ~20% NULL
    // values, values drawn from a SMALL grid (multiples of the width and
    // its halves) so exact ±width boundary ties and duplicate values are
    // guaranteed to occur — the edges the banding math must get right
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Option[Long], Option[Long])] =
      (0 until 600).map { i =>
        val key = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5).toLong)
        val v = if (rnd.nextInt(5) == 0) None
                else Some((rnd.nextInt(41) - 20) * 18L + (rnd.nextInt(3) - 1) * 36L)
        (i.toLong, key, v)
      }
    val df = rows.toDF("row_id", "k", "x")
    val w = Window.partitionBy(col("k")).orderBy(col("x"))
      .rangeBetween(-36L, 36L)
    def m(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("row_id"), col(c)).collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val expected = m(df.withColumn("near", sum(col("x")).over(w)), "near")
    val got = m(ops.SegmentedScan.rangeFrameSum(
      df, key = Seq("k"), value = "x", width = 36.0, out = "near"), "near")
    assert(got == expected, "range-frame sum diverged on the random sweep")
    // the fixture must actually exercise the edges: NULL-value rows
    // (NULL out), duplicate values, and at least one exact ±width tie
    val vals = rows.flatMap(_._3)
    assert(rows.exists(_._3.isEmpty))
    assert(vals.distinct.size < vals.size)
    assert(vals.combinations(2).exists(p => math.abs(p(0) - p(1)) == 36L))
    // MULTI-key partitioning: the same sweep keyed by (k, k2) — the
    // null-safe join conds must compose across key columns
    val df2 = rows.toDF("row_id", "k", "x")
      .withColumn("k2", col("row_id") % 2)
    val w2 = Window.partitionBy(col("k"), col("k2")).orderBy(col("x"))
      .rangeBetween(-36L, 36L)
    val expected2 = m(df2.withColumn("near", sum(col("x")).over(w2)), "near")
    val got2 = m(ops.SegmentedScan.rangeFrameSum(
      df2, key = Seq("k", "k2"), value = "x", width = 36.0, out = "near"), "near")
    assert(got2 == expected2, "two-key range-frame sum diverged")
  }

  test("range-frame sum: non-representable whole width on a narrow decimal column (ADVICE r13)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // DECIMAL(4,1): integral headroom is 3 digits, so a whole width of
    // 2000 cannot be cast into the column's type — the r13 typed literal
    // lit(width.toLong).cast(dt) silently became NULL there (non-ANSI
    // overflow), every probe bound went NULL, and for mixed-sign columns
    // (bands -1 and 0 both populated) the cross-band contribution
    // collapsed to 0. The width guard must fall back to the double
    // literal and keep parity with the window form.
    val df = Seq(
      (1L, "a", "-900.5"), (2L, "a", "-10.0"), (3L, "a", "0.5"),
      (4L, "a", "850.0"), (5L, "a", "999.9"), (6L, "b", "-999.9"),
      (7L, "b", "999.9"))
      .toDF("row_id", "k", "s")
      .select(col("row_id"), col("k"),
        col("s").cast("decimal(4,1)").as("x"))
    // the RANGE window form cannot even express this width (ANSI: the
    // frame bound literal overflows decimal(4,1) with an exception), so
    // the reference is the width's semantics spelled directly: 2000
    // exceeds the column's whole representable spread (±999.9), so every
    // same-key row is in frame — expected = the key's total sum
    def m(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("row_id"), col(c)).collect()
        .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val expected = m(df.join(
      df.groupBy("k").agg(sum(col("x")).as("near")), Seq("k")), "near")
    val got = m(ops.SegmentedScan.rangeFrameSum(
      df, key = Seq("k"), value = "x", width = 2000.0, out = "near"), "near")
    assert(got == expected,
      s"non-representable decimal width diverged: $got vs $expected")
    // control: a representable whole width on the same column still runs
    // the exact-decimal path and agrees
    val wSmall = Window.partitionBy(col("k")).orderBy(col("x"))
      .rangeBetween(-900L, 900L)
    val expS = m(df.withColumn("near", sum(col("x")).over(wSmall)), "near")
    val gotS = m(ops.SegmentedScan.rangeFrameSum(
      df, key = Seq("k"), value = "x", width = 900.0, out = "near"), "near")
    assert(gotS == expS, s"representable decimal width diverged: $gotS vs $expS")
  }

  test("quantized range-frame sum: grid identity + window-on-quantized semantics (r14)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def m(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("row_id"), col(c)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "continuous" long values (0.01-resolution cents-style domain) —
    // the residual's shape: distinct ≈ rows inside each width band
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      (i.toLong, if (i % 7 == 0) "b" else "a", rnd.nextInt(36000).toLong)
    }
    val df = rows.toDF("row_id", "k", "x")
    val width = 3600.0; val grid = 400.0
    // 1) identity: data already ON the grid → the snap is a no-op and
    // the quantized form equals both the plain form and the window form
    val dfGrid = df.withColumn("x", (col("x") / 400).cast("long") * 400)
    val wG = Window.partitionBy(col("k")).orderBy(col("x"))
      .rangeBetween(-3600L, 3600L)
    val expG = m(dfGrid.withColumn("near", sum(col("x")).over(wG)), "near")
    assert(m(ops.SegmentedScan.rangeFrameSumQuantized(
      dfGrid, Seq("k"), "x", width, "near", grid), "near") == expG)
    assert(m(ops.SegmentedScan.rangeFrameSum(
      dfGrid, Seq("k"), "x", width, "near"), "near") == expG)
    // 2) off-grid semantics: the quantized form IS the window form run
    // on the snapped column (half-up to the grid), summing RAW values
    val snapped = df.withColumn("xq",
      (floor(col("x") / grid + lit(0.5)) * grid).cast("long"))
    val wQ = Window.partitionBy(col("k")).orderBy(col("xq"))
      .rangeBetween(-3600L, 3600L)
    val expQ = m(snapped.withColumn("near", sum(col("x")).over(wQ)), "near")
    val got = ops.SegmentedScan.rangeFrameSumQuantized(
      df, Seq("k"), "x", width, "near", grid)
    assert(m(got, "near") == expQ,
      "quantized frame diverged from the window-on-snapped oracle")
    // no __ptx internals leak
    assert(got.columns.toSeq == df.columns.toSeq :+ "near")
    // and the restored straggler bound is real: a HOT band (every row of
    // one key inside ONE width band — the residual's exact shape) keeps
    // ~row-count distinct values raw but ≤ width/grid + 1 snapped
    val hot = (0 until 400).map(i => (i.toLong, "a", rnd.nextInt(3600).toLong))
      .toDF("row_id", "k", "x")
      .withColumn("xq", (floor(col("x") / grid + lit(0.5)) * grid).cast("long"))
    val rawDistinct = hot
      .select((col("x") / lit(width)).cast("long").as("b"), col("x"))
      .distinct().groupBy("b").count().agg(max("count")).head.getLong(0)
    val qDistinct = hot
      .select((col("xq") / lit(width)).cast("long").as("b"), col("xq"))
      .distinct().groupBy("b").count().agg(max("count")).head.getLong(0)
    assert(qDistinct <= (width / grid).toLong + 1)
    assert(rawDistinct > 10 * qDistinct,
      s"fixture not continuous enough to exercise the bound ($rawDistinct vs $qDistinct)")
  }

  test("loader schema assertion rejects unknown tables loudly") {
    val ex = intercept[IllegalArgumentException] {
      Tables.t(spark, TestSpark.SF, "nope")
    }
    assert(ex.getMessage.contains("unknown table"))
  }
}
