package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}
import ptx.ops.BoundedSort.ReportSortOps

/** G15 — subqueries, argmin/argmax aggregates, unpivot, sampling.
  *
  * The subquery pair deliberately goes through `spark.sql` so Catalyst's
  * scalar-subquery planning and correlated-subquery decorrelation
  * (RewriteCorrelatedScalarSubquery) are exercised — the DataFrame surface
  * elsewhere expresses these as joins.
  */
object Extras {

  /** Per-day event counts `(day, n_events)` — the volume grain shared by
    * the `dq_volume_anomaly` batch audit and the streaming volume gate
    * ([[ptx.stream.Pipelines.volumeGate]]). */
  def dailyCounts(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))

  /** 1-row exact moments `(nd, sx, sxx)` of a daily-count frame —
    * decimal(38,0) per-row cast BEFORE Σn² (the 100 TB overflow rule).
    * Broadcast back onto the grain it scores, or persist as the static
    * reference a streaming gate probes. */
  def volumeMoments(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    daily.agg(count(lit(1)).as("nd"),
      sum(col("n_events").cast("decimal(38,0)")).cast("decimal(38,0)").as("sx"),
      sum(col("n_events").cast("decimal(38,0)") * col("n_events"))
        .cast("decimal(38,0)").as("sxx"))

  /** z + anomaly columns over a `(day, n_events, nd, sx, sxx)` frame: ONE
    * pinned-parenthesization double expression over exact integers (both
    * engines and both deployment modes divide identical operands), the
    * flag on the ROUNDED z, the zero-variance guard in exact decimal.
    *
    * Bound (ADVICE r11): the guard's products `sxx * nd` and `sx * sx`
    * stay in decimal(38,0) — Spark caps the result precision at 38, so
    * once sx or sxx approaches ~1e19 the products overflow to NULL, the
    * CASE guard goes false, and every day scores z = NULL (an all-NULL
    * verdict frame, not a crash). sx is TOTAL corpus events and sxx ≈
    * nd·(events/day)², so the bound is ~3e9 events/day for ~1000 days —
    * beyond the 100 TB design point's event grain, but a deployment past
    * it must rescale the guard (divide the counts by nd in decimal before
    * squaring) rather than trust the silent NULLs; an all-NULL z column
    * on populated input is the overflow signature to check for. */
  def volumeVerdict(dailyWithMoments: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    dailyWithMoments
      .select(col("day"), col("n_events"),
        expr("""CASE WHEN nd >= 2 AND sxx * nd - sx * sx > 0
          |THEN round((n_events * 1e0 - (sx * 1e0) / nd) / sqrt(
          |  (sxx * 1e0) / nd - ((sx * 1e0) / nd) * ((sx * 1e0) / nd)), 6)
          |END""".stripMargin).as("z"))
      .withColumn("anomalous", when(col("z").isNotNull, abs(col("z")) > 2.0))

  /** Laplace-smoothed Population Stability Index of per-source bucket
    * distributions `c(source, b, n)` against a reference distribution
    * `g(b, gn)` — the shared core of `dq_drift_psi` (reference = the same
    * corpus's own global distribution) and the streaming drift gate
    * (reference = a static broadcast frame from a trusted snapshot).
    * Each bucket term is snapped to the e6 grid BEFORE the summation so
    * the signed, cancellation-prone PSI sum is an exact BIGINT reduction
    * (accumulation-order-free); sources missing a reference bucket get
    * the +1 smoothing cell instead of ln(0). Everything here runs on the
    * sources×buckets grid — corpus-size-independent — with the reference
    * and the per-source totals broadcast.
    */
  /** [[psiAgainst]] without the final source sort — the per-micro-batch
    * drift GATE reads the verdict as a set (collect → driver filter), and
    * the orderBy would cost a range exchange + sampling pass per batch
    * for nothing (r13). Declared queries keep the sorted wrapper. */
  def psiAgainstUnsorted(c: org.apache.spark.sql.DataFrame,
                         g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tot = g.agg(sum(col("gn")).as("gt"), count(lit(1)).as("nb"))
    val st = c.groupBy(col("source")).agg(sum(col("n")).as("sn_tot"))
    // r18 (guide §2.4): the per-source totals frame IS the dense grid's
    // left side — the separate distinct-sources aggregate and the sn_tot
    // join are gone (the dq_drift_report batch-3 shape; also trims the
    // streaming drift gate that shares this body)
    val grid = st.crossJoin(broadcast(g))
      .join(broadcast(c), Seq("source", "b"), "left_outer")
      .withColumn("sn", coalesce(col("n"), lit(0L)))
    val term = expr(
      "((sn + 1e0) / (sn_tot + nb) - (gn + 1e0) / (gt + nb)) * " +
        "ln(((sn + 1e0) / (sn_tot + nb)) / ((gn + 1e0) / (gt + nb)))")
    grid.crossJoin(broadcast(tot))
      .withColumn("term_e6", round(term * lit(1000000d)).cast("long"))
      .groupBy(col("source"), col("sn_tot"))
      .agg(sum(col("term_e6")).as("psi_e6"))
      .select(col("source"), col("sn_tot").as("n_docs"), col("psi_e6"),
        (col("psi_e6") > 250000L).as("drifted"))
  }

  def psiAgainst(c: org.apache.spark.sql.DataFrame,
                 g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    psiAgainstUnsorted(c, g).reportSort(col("source"))

  def queries: Map[String, QFn] = Map(
    "sub_scalar" -> ((s, d) => {
      // view name carries the data dir so interleaved construction against
      // two dirs cannot rebind a lazily-analyzed plan to the wrong data
      val v = s"orders_sub_${math.abs(d.hashCode)}"
      Tables.orders(s, d).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT o_orderkey, round(o_totalprice, 2) AS price
          |FROM $v
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM $v)
          |ORDER BY o_orderkey""".stripMargin)
    }),
    "sub_correlated" -> ((s, d) => {
      val v = s"customer_sub_${math.abs(d.hashCode)}"
      Tables.customer(s, d).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT c_custkey, round(c_acctbal, 2) AS bal
          |FROM $v c
          |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM $v c2
          |                   WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }),
    "agg_minmax_by" -> ((s, d) => {
      val sup = Tables.supplier(s, d); val n = Tables.nation(s, d)
      sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          max_by(col("s_name"), col("s_acctbal")).as("richest"),
          min_by(col("s_name"), col("s_acctbal")).as("poorest"),
          bool_or(col("s_acctbal") < 0).as("any_negative"),
          bool_and(col("s_acctbal") > -100000.0).as("all_bounded"))
        .reportSort(col("n_name"))
    }),
    "fn_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        // r19: spread the 3-way stack (and the range sampler's re-run of
        // it) off the single-task fixture scan — the fn_math note
        .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), expr(
          """stack(3, 'disc', l_discount, 'price', l_extendedprice, 'qty', l_quantity)
            | AS (metric, val)""".stripMargin))
        // (l_orderkey, l_linenumber) is not unique; val completes the order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("val"))
    }),
    // ✓ decimal end-to-end exemplar (r6, VERDICT r5 gap #4): the binding
    // data carries no DECIMAL columns, so this query pins the decimal
    // aggregation semantics a warehouse user hits first — cast-in,
    // sum/avg/min/max over DECIMAL(12,2), precision/scale growth
    // (sum → s+? precision, avg → scale 6) — against the oracle. Result
    // scales are pinned by explicit casts on BOTH sides because each
    // engine's internal result precision differs (Spark decimal(22,2)
    // vs DuckDB decimal(38,2) for the sum); the SEMANTIC (exact
    // fixed-point arithmetic, half-up at the result scale) is what must
    // agree. 2dp-clean fixture prices make the double→decimal cast exact.
    "agg_decimal_pricing" -> ((s, d) => {
      val p = col("l_extendedprice").cast("decimal(12,2)")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(p).cast("decimal(18,2)").as("sum_price"),
          avg(p).cast("decimal(18,6)").as("avg_price"),
          min(p).as("min_price"),
          max(p).as("max_price"),
          count(lit(1)).as("n"))
        .reportSort(col("l_returnflag"))
    }),
    // ✓ per-source exact-duplicate rate (r13): the DQ face of the dedup
    // family — a crawl source whose duplicate rate jumps is re-serving
    // cached pages (or the fetcher looped), and that shows up HERE
    // before it shows up as wasted training tokens. Exact content
    // identity via md5 (identical in both engines over identical
    // strings); the shuffle carries 16-byte fingerprints per (source,
    // fp), never text — the llm_fingerprint posture. e6 rate via
    // half-up integer division (the pt_burn_rate discipline).
    "dq_duplicate_rate" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct"))
        .select(col("source"), col("n_docs"), col("n_distinct"),
          (col("n_docs") - col("n_distinct")).as("n_dups"),
          expr("(2 * (n_docs - n_distinct) * 1000000 + n_docs)" +
            " div (2 * n_docs)").as("dup_rate_e6"))
        .reportSort(col("source"))
    }),
    // ◌ seeded Bernoulli sample: RNG is engine-specific, so no oracle;
    // self-parity (OpsSmokeSpec) asserts run-to-run determinism and the
    // fraction bound is unit-tested.
    "scan_sample" -> ((s, d) => {
      Tables.lineitem(s, d)
        .sample(withReplacement = false, fraction = 0.1, seed = 42)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .reportSort(col("l_returnflag"))
    }),
    // ✓ column profiler (r5, replanned r10): Deequ/pandas-profiling shape
    // — per numeric column: row count, nulls, exact distinct, min/max/
    // mean — the pre-ingest data-quality snapshot every pipeline runs
    // before trusting a new drop. The non-distinct metrics ride ONE wide
    // aggregate; the 4 exact distinct counts run as separate single-
    // column aggs crossJoined back (see the note below — the combined
    // form's Expand was the whole query cost), then a row-per-column
    // explode of the wide result. At 100 TB swap the exact distinct for
    // approx_count_distinct — one pass, no extra scans.
    "dq_profile" -> ((s, d) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = Seq(count(lit(1)).as("n")) ++ cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          round(min(col(c)), 6).as(s"${c}_min"),
          round(max(col(c)), 6).as(s"${c}_max"),
          // exact e2 sum + non-null count → e6 micro-mean via half-up
          // integer division (round(avg) flips on 2^a·5^b row counts);
          // summed as DECIMAL(38,0) so the ·10⁴ product below cannot
          // overflow-abort under ANSI at cluster row counts (q8 rule)
          sum(round(col(c) * 100).cast("decimal(38,0)")).as(s"${c}_sum_e2"),
          count(col(c)).as(s"${c}_nn"))
      }
      // the 4 EXACT distinct counts run as their own single-column aggs,
      // crossJoined back as 1-row frames (r10): multiple countDistinct
      // inside one wide agg compile to an Expand that multiplies every
      // row ×5 before the distinct shuffle (measured 3.6 s of the query's
      // 3.6 s); a lone countDistinct is a plain two-phase distinct agg
      // over a column-pruned scan. At 100 TB the split is equally honest:
      // each scan reads ONE column's pages, so total bytes ≈ the single
      // wide scan, minus the 5× expand. The declared sketch swap
      // (approx_count_distinct, one pass, no expand) remains the
      // cluster-scale default for this audit.
      val li = Tables.lineitem(s, d)
      // r19 note: spreading each distinct branch with an explicit hash
      // exchange was tried and MEASURED WORSE (1.03 → 1.36 s, 15 → 19
      // jobs): four more AQE exchange jobs cost more than the parallel
      // partial-distinct build saved. Kept the column-pruned 1-task scans.
      val wide = cols
        .map(c => li.agg(countDistinct(col(c)).as(s"${c}_distinct")))
        .foldLeft(li.agg(aggs.head, aggs.tail: _*))((a, b) => a.crossJoin(b))
      val rows = cols.map { c =>
        struct(lit(c).as("col_name"), col("n"),
          col(s"${c}_nulls").as("n_null"),
          col(s"${c}_distinct").as("n_distinct"),
          col(s"${c}_min").as("min_val"),
          col(s"${c}_max").as("max_val"),
          // guarded: an all-NULL column gives nn=0 and ANSI div-by-zero
          // ABORTS the whole profile — NULL mean is the right answer
          expr(s"CASE WHEN ${c}_nn > 0 THEN" +
            s" (2 * ${c}_sum_e2 * 10000 + ${c}_nn) div (2 * ${c}_nn) END")
            .as("mean_e6"))
      }
      wide.select(explode(array(rows: _*)).as("r"))
        .select(col("r.*"))
        .reportSort(col("col_name"))
    }),
    // ✓ constraint suite (r6): Deequ-style CHECKS — one row per declared
    // constraint with pass flag + exact violation count. PK uniqueness,
    // FK orphans (left-anti), numeric range, enum domain, non-null. The
    // honest headline: (l_orderkey, l_linenumber) is NOT unique in the
    // fixture (FIXTURES.md), so that check FAILS with its real count — a
    // DQ suite that cannot fail is decoration. Each check is an
    // independent map-side-partial aggregate; the union carries 6 rows.
    "dq_constraints" -> ((s, d) => {
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      def named(name: String, df: org.apache.spark.sql.DataFrame) =
        df.select(lit(name).as("check_name"), col("violations"))
      val checks = Seq(
        // explicit not-null precheck: Spark's multi-arg countDistinct
        // skips rows where ANY key is NULL while DuckDB's struct-distinct
        // counts them, so the uniqueness check runs only over fully-keyed
        // rows on BOTH engines (the fixture has none, but the semantics
        // must not depend on that)
        named("lineitem_pk_unique", li
          .filter(col("l_orderkey").isNotNull && col("l_linenumber").isNotNull)
          .agg((count(lit(1)) -
            countDistinct(col("l_orderkey"), col("l_linenumber")))
            .as("violations"))),
        named("orders_pk_unique", o.agg((count(lit(1)) -
          countDistinct(col("o_orderkey"))).as("violations"))),
        named("lineitem_fk_orders", li.join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))),
        named("quantity_range",
          li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
            .agg(count(lit(1)).as("violations"))),
        named("status_domain",
          o.filter(!col("o_orderstatus").isin("O", "F", "P"))
            .agg(count(lit(1)).as("violations"))),
        named("shipdate_not_null", li.filter(col("l_shipdate").isNull)
          .agg(count(lit(1)).as("violations"))))
      checks.reduce(_ union _)
        .select(col("check_name"), (col("violations") === 0).as("pass"),
          col("violations"))
        .reportSort(col("check_name"))
    }),
    // ✓ referential-integrity audit (r6): orphan-key counts for every FK
    // edge of the star — the Deequ `isContainedIn` check dq_constraints'
    // row-level suite lacks. Each edge distinct()s the fact's key set
    // FIRST (the exchange carries |keys|, never the fact) then left-anti
    // joins the dimension; 4 one-row aggregates union to the report.
    "dq_referential" -> ((s, d) => {
      def orphans(fact: org.apache.spark.sql.DataFrame, fk: String,
                  dim: org.apache.spark.sql.DataFrame, pk: String,
                  name: String) =
        fact.select(col(fk)).distinct()
          .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphan_keys"))
          .select(lit(name).as("fk"), col("n_orphan_keys"))
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      orphans(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders")
        .unionAll(orphans(li, "l_partkey", Tables.part(s, d), "p_partkey",
          "lineitem.l_partkey->part"))
        .unionAll(orphans(li, "l_suppkey", Tables.supplier(s, d), "s_suppkey",
          "lineitem.l_suppkey->supplier"))
        .unionAll(orphans(o, "o_custkey", Tables.customer(s, d), "c_custkey",
          "orders.o_custkey->customer"))
        .withColumn("ok", col("n_orphan_keys") === 0)
        .reportSort(col("fk"))
    }),
    // ✓ partition-completeness audit (r6): the full lang × source grid
    // with per-cell doc counts, zero-filling cells that have NO rows — the
    // "is a partition missing from last night's load?" check a groupBy
    // alone cannot answer (absent groups produce no row to look at). The
    // grid is the cross product of the two DISTINCT dimension sets (both
    // tiny after their partial-agg distinct; the crossJoin broadcasts one
    // side) left-joined against the observed counts, so the fact table is
    // scanned once and nothing wide ever carries it.
    "dq_completeness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val langs = docs.select(col("lang")).distinct()
      val srcs = docs.select(col("source")).distinct()
      val actual = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      langs.crossJoin(broadcast(srcs))
        .join(broadcast(actual), Seq("lang", "source"), "left_outer")
        .select(col("lang"), col("source"),
          coalesce(col("n"), lit(0L)).as("n_docs"),
          col("n").isNull.as("missing"))
        .reportSort(col("lang"), col("source"))
    }),
    // ✓ freshness audit (r9): per event stream, how stale is the newest
    // record vs the freshest stream — the "is ingestion keeping up" check
    // a pipeline runs before trusting a partition. Exact integer lag in
    // whole seconds from the µs epochs (no double time math); the global
    // max is a broadcast 1-row frame, one scan total.
    "dq_freshness" -> ((s, d) => {
      // apex frame pinned: the per-type aggregate feeds both the output
      // rows and the global-max branch — unpinned, Spark re-scans the
      // whole events table for the 1-row max (two full scans at 100 TB)
      val per = ptx.Caching.pin(
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("ts")).as("last_ts"),
            max(unix_micros(col("ts"))).as("last_us")))
      per.crossJoin(broadcast(per.agg(max(col("last_us")).as("global_us"))))
        .select(col("event_type"), col("n"), col("last_ts"),
          expr("(global_us - last_us) div 1000000").as("lag_s"))
        .reportSort(col("event_type"))
    }),
    // ✓ ingest-VOLUME anomaly audit (r11): per-day event counts z-scored
    // against the corpus's own daily-count distribution — the volume
    // grain the DQ family lacked (pt_anomaly_zscore scores event VALUES;
    // a feed that silently dies or double-delivers shows up in ROW
    // COUNTS first, and the volume gate is the standard first tripwire
    // before any content audit runs). Population z from exact integer
    // moments: the per-day counts aggregate once, the 1-row (nd, Σn,
    // Σn²) global broadcasts back, both engines compute z as the SAME
    // pinned-parenthesization double expression over identical integers
    // (the dq_drift_ttest discipline), and the anomaly flag compares the
    // ROUNDED z (engine-deterministic boundary). The zero-variance /
    // single-day guard is decided in EXACT decimal (Σn²·nd − (Σn)² > 0),
    // not on a double that could land on the boundary.
    // Scale: one corpus scan → |days| rows; everything after is
    // grid-sized. Moments accumulate in decimal(38,0) per-row-cast
    // BEFORE the sum (the 100 TB Σn² overflow rule).
    "dq_volume_anomaly" -> ((s, d) => {
      val daily = dailyCounts(Tables.events(s, d))
      volumeVerdict(daily.crossJoin(broadcast(volumeMoments(daily))))
        .reportSort(col("day"))
    }),
    // ✓ distribution-drift audit (r9): per-source Population Stability
    // Index of the document-length distribution against the corpus-wide
    // distribution — the standard "did shard X drift from the reference?"
    // gate (PSI > 0.25 is the conventional act-now threshold) run before
    // admitting a crawl shard into a training mix. Buckets reuse the
    // llm_length_histogram grain (n_chars div 50); Laplace-smoothed
    // (+1 per cell over the GLOBAL bucket list) so empty source-cells
    // contribute finite terms instead of ln(0). Each bucket TERM is
    // snapped to the e6 grid and the PSI is the exact BIGINT sum of the
    // snapped terms (psi_e6): summing the raw doubles is accumulation-
    // ORDER-dependent, and PSI's signed terms cancel enough that Spark's
    // partial-agg order vs the oracle's scan order really flips the 6th
    // decimal (measured: src1 at sf0.01) — the per-term round runs
    // BEFORE any order-sensitive reduction, so both engines sum identical
    // integers. (ln ulp skew could still move one term across its .5
    // boundary, but that is a ~1e-12 event, not the raw sum's per-row
    // coin flip.)
    // Scale: one (source,bucket) agg scans the corpus once; everything
    // after runs on the sources×buckets grid (#shards × #buckets rows,
    // independent of corpus size), with the global side broadcast.
    "dq_drift_psi" -> ((s, d) => {
      // apex pinned: the cell counts feed the global-bucket branch, the
      // per-source totals, and the grid join — unpinned, three corpus scans
      val c = ptx.Caching.pin(Tables.documents(s, d)
        .groupBy(col("source"), expr("n_chars div 50").as("b"))
        .agg(count(lit(1)).as("n")))
      psiAgainst(c, c.groupBy(col("b")).agg(sum(col("n")).as("gn")))
    }),
    // ✓ embedding-space drift audit (r9): per-label centroid vs the
    // corpus-wide centroid — cosine + L2 — the representation-space twin
    // of dq_drift_psi (a shard can hold its LENGTH distribution while its
    // topical/semantic mix drifts; centroid-vs-global is the standard
    // one-vector-per-shard summary a curation dashboard plots). Each
    // centroid COMPONENT is e6-snapped (the llm_centroid precedent: the
    // snap absorbs avg()'s accumulation-order ulps), then dot/norm/dist
    // are EXACT BIGINT sums of component products (≤ 64·1e12 ≪ 2^53, so
    // even their double images are exact) — both engines take sqrt/divide
    // on identical integers and round identical doubles.
    // Scale: one corpus scan into the pinned (label,pos) exploded frame;
    // everything downstream is labels×dim-sized with the global side
    // broadcast.
    "dq_embedding_drift" -> ((s, d) => {
      // apex pinned: the exploded component frame feeds the per-label AND
      // the global centroid branch — unpinned, two corpus scans
      val expl = ptx.Caching.pin(Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x"))))
      val perLabel = expl.groupBy(col("label"), col("pos"))
        .agg(expr("cast(round(avg(cast(x as double)) * 1e6) as long)").as("c_e6"),
          count(lit(1)).as("n"))
      val global = expl.groupBy(col("pos"))
        .agg(expr("cast(round(avg(cast(x as double)) * 1e6) as long)").as("g_e6"))
      perLabel.join(broadcast(global), Seq("pos"))
        .groupBy(col("label"))
        .agg(max(col("n")).as("n_vecs"),
          sum(col("c_e6") * col("g_e6")).as("dot_e12"),
          sum(col("c_e6") * col("c_e6")).as("cc_e12"),
          sum(col("g_e6") * col("g_e6")).as("gg_e12"),
          sum((col("c_e6") - col("g_e6")) * (col("c_e6") - col("g_e6"))).as("d2_e12"))
        .select(col("label"), col("n_vecs"),
          when(col("cc_e12") > 0 && col("gg_e12") > 0,
            round(col("dot_e12") / (sqrt(col("cc_e12")) * sqrt(col("gg_e12"))), 6))
            .as("cos_to_global"),
          round(sqrt(col("d2_e12")) / lit(1e6), 6).as("l2_to_global"))
        .reportSort(col("label"))
    }),
    // ✓ per-vector embedding outlier audit (r11): each vector's cosine to
    // its OWN label's centroid, rolled up per label with an outlier count
    // (rounded cos < 0.6) — the vector-grain companion to
    // `dq_embedding_drift` (distribution-grain) and the noise-prune gate
    // SemDeDup-style curation runs before dedup: a vector far from every
    // centroid is mislabeled/corrupt embedding output, and it degrades
    // both the IVF index (wrong cell) and semantic dedup (false
    // uniqueness). Determinism: the centroid is the SAME float32-cast
    // mean `llm_ann_ivf` persists (bit-exact across engines and parquet
    // round-trips), the cosine is the codegen'd kernel whose double fold
    // is bit-identical to the oracle's list_dot_product, and the outlier
    // threshold compares the ROUNDED cosine (engine-deterministic
    // boundary — house pattern).
    // Scale: one broadcast of the |labels|-row centroid frame + one
    // corpus scan; per-label rollup is the only shuffle. Linear, no pair
    // space (contrast llm_semdedup's Σ|cell|² verify).
    "dq_embedding_outliers" -> ((s, d) => {
      ptx.functions.VectorOps.register(s)
      val e = Tables.embeddings(s, d)
      e.join(broadcast(LlmScale.ivfCentroids(e)), Seq("label"))
        .withColumn("cos", round(expr("cosine_sim(embedding, centroid)"), 6))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          count(when(col("cos") < 0.6, 1)).as("n_outliers"),
          round(min(col("cos")), 6).as("min_cos"),
          round(avg(col("cos")), 6).as("avg_cos"))
        .reportSort(col("label"))
    }),
    // ✓ multimodal pairing audit (r9): doc↔embedding coverage across the
    // text/vector pair (vec_id overlaps doc_id by fixture contract) —
    // the dq_referential shape applied to the multimodal join key. A doc
    // without a vector silently drops out of every embedding-side op
    // (knn, semdedup, drift); a vector without a doc is an orphan the
    // index would serve with no payload. Three one-row counts unioned.
    // Scale: two anti joins + one semi-shaped count on the id key only
    // (both sides pre-projected to their key column — the exchanges
    // carry 8-byte ids, never text or vectors).
    "dq_doc_embedding_coverage" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val vecs = Tables.embeddings(s, d).select(col("vec_id"))
      val a = docs.join(vecs, col("doc_id") === col("vec_id"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("doc_without_embedding").as("check_name"), col("n"))
      val b = vecs.join(docs, col("vec_id") === col("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("embedding_without_doc").as("check_name"), col("n"))
      val c = docs.join(vecs, col("doc_id") === col("vec_id"))
        .agg(count(lit(1)).as("n"))
        .select(lit("paired").as("check_name"), col("n"))
      a.union(b).union(c).orderBy(col("check_name"))
    }),
    // ✓ Kolmogorov–Smirnov drift statistic (r9): per-source max CDF gap
    // of the doc-length distribution vs the corpus-wide distribution —
    // PSI's standard companion (PSI integrates the whole distribution;
    // KS pins the single worst point, so a localized shift PSI smooths
    // over still fires here). EXACT until the last step: with per-source
    // denominator ns·ng constant, D = max_b |cs_b·ng − cg_b·ns| /
    // (ns·ng), so the max runs over exact DECIMAL(38,0) integers and a
    // single half-up division lands ks_e6 — no per-bucket double ever
    // enters the max (the PSI snap lesson, taken to zero rounding).
    // drifted = D above the α=0.05 two-sample critical value
    // 1.36·√((ns+ng)/(ns·ng)) — both engines evaluate the identical
    // integers through the identical double expression.
    // Scale: same pinned cell agg as the PSI audit; the cumulative sums
    // run on the sources×buckets grid (bounded), never the corpus.
    "dq_drift_ks" -> ((s, d) => {
      val c = ptx.Caching.pin(Tables.documents(s, d)
        .groupBy(col("source"), expr("n_chars div 50").as("b"))
        .agg(count(lit(1)).as("n")))
      val g = c.groupBy(col("b")).agg(sum(col("n")).as("gn"))
      val st = c.groupBy(col("source")).agg(sum(col("n")).as("ns"))
      val tot = g.agg(sum(col("gn")).as("ng"))
      // r18 (guide §2.4, the dq_drift_report batch-3 shape): the
      // source-grain totals frame IS the dense grid's left side — the
      // separate distinct-sources aggregate and the ns join are gone
      val grid = st.crossJoin(broadcast(g))
        .join(broadcast(c), Seq("source", "b"), "left_outer")
        .withColumn("sn", coalesce(col("n"), lit(0L)))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("b"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid
        .withColumn("cs", sum(col("sn")).over(wb))
        .withColumn("cg", sum(col("gn")).over(wb))
        .crossJoin(broadcast(tot))
        .withColumn("dnum", abs(
          col("cs").cast("decimal(38,0)") * col("ng") -
            col("cg").cast("decimal(38,0)") * col("ns")))
        .groupBy(col("source"), col("ns"), col("ng"))
        .agg(max(col("dnum")).as("dmax"))
        .select(col("source"), col("ns").as("n_docs"),
          expr("(2 * dmax * 1000000 + cast(ns as decimal(38,0)) * ng)" +
            " div (2 * cast(ns as decimal(38,0)) * ng)").as("ks_e6"),
          expr("(dmax * 1e0) / (ns * 1e0 * ng) >" +
            " 1.36 * sqrt((ns + ng) * 1e0 / (ns * 1e0 * ng))").as("drifted"))
        .reportSort(col("source"))
    }),
    // ✓ Welch t-test drift significance (r9): per source, the two-sample
    // t statistic of mean doc length vs the REST of the corpus — the
    // inferential member of the drift family (PSI/KS say how far the
    // distributions sit apart; the t-test says whether the MEAN gap
    // clears sampling noise, the first question a small-shard alert
    // raises). Rest-of-corpus moments come free as global − source
    // (exact integer subtraction — no second scan, no self-join). All
    // moments are exact DECIMAL(38,0)/BIGINT sums; the t value is then
    // one pinned-parenthesization double expression over identical
    // integers on both engines (the PMI discipline), rounded 6dp.
    // significant = |t| > 1.96 (α=0.05 normal approx — per-source n
    // makes dof large enough that the z threshold is the honest frame).
    // Guards: sources with n<2 or a zero variance denominator yield NULL.
    // Scale: one corpus scan into per-source moments; everything after is
    // #sources-sized with the 1-row global broadcast.
    "dq_drift_ttest" -> ((s, d) => {
      // Moments accumulate IN decimal(38,0) (per-row cast before the
      // sum), not as a LONG sum cast afterwards: at 100 TB the long
      // Σx² accumulator would overflow (ANSI abort / silent wrap)
      // before any cast could help.
      val m = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars").cast("decimal(38,0)")).cast("decimal(38,0)").as("sx"),
          sum(col("n_chars").cast("decimal(38,0)") * col("n_chars"))
            .cast("decimal(38,0)").as("sxx"))
      val g = m.agg(sum(col("n")).as("ng"),
        sum(col("sx")).as("gx"), sum(col("sxx")).as("gxx"))
      m.crossJoin(broadcast(g))
        .withColumn("n2", col("ng") - col("n"))
        .withColumn("sx2", col("gx") - col("sx"))
        .withColumn("sxx2", col("gxx") - col("sxx"))
        .select(col("source"), col("n").as("n_docs"),
          expr("CASE WHEN n > 0 THEN" +
            " (2 * sx * 1000000 + n) div (2 * n) END").as("mean_e6"),
          expr("""CASE WHEN n >= 2 AND n2 >= 2 AND
            |  ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
            |  ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2 > 0
            |THEN round(
            |  ((sx * 1e0) / n - (sx2 * 1e0) / n2) / sqrt(
            |    ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
            |    ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2),
            |  6) END""".stripMargin).as("t_stat"))
        .withColumn("significant",
          when(col("t_stat").isNotNull, abs(col("t_stat")) > 1.96))
        .reportSort(col("source"))
    }),
    // ✓ composed drift report (r9): PSI + KS + Welch-t per source in ONE
    // call — the dashboard row a data-quality monitor actually renders.
    // The composition is where the efficiency lives: one pinned
    // (source,bucket) aggregate carrying count AND the n_chars moments
    // feeds all three statistics (the standalone audits each scan the
    // corpus once; three separate calls = three scans, this = one), the
    // llm_curation_pipeline share-the-apex discipline applied to the
    // drift family. Values are formula-identical to the standalone ops —
    // per-source t moments are exact sums of the bucket-level moments.
    "dq_drift_report" -> ((s, d) => {
      val c = ptx.Caching.pin(Tables.documents(s, d)
        .groupBy(col("source"), expr("n_chars div 50").as("b"))
        .agg(count(lit(1)).as("n"),
          // per-row decimal cast BEFORE the sum — see dq_drift_ttest
          sum(col("n_chars").cast("decimal(38,0)")).cast("decimal(38,0)").as("sxc"),
          sum(col("n_chars").cast("decimal(38,0)") * col("n_chars"))
            .cast("decimal(38,0)").as("sxxc")))
      val cells = c.select(col("source"), col("b"), col("n"))
      val g = cells.groupBy(col("b")).agg(sum(col("n")).as("gn"))
      // r18 (guide §2.4, two steps): batch 2 collapsed PSI's and KS's twin
      // grids into one; batch 3 goes further — the source-grain frame (ns)
      // IS the crossJoin's left side (no separate distinct-sources frame,
      // no ns join), and PSI's per-source term sum and KS's per-source
      // D-statistic max are ONE aggregation over the same windowed grid
      // (both group by source; the window's source partitioning feeds the
      // agg with zero extra exchange). Profile before batch 3: 40 jobs /
      // 784 tasks / 42 s summed task time for a ≤|sources×buckets| report
      // frame — pure stage fan-out. Values bit-identical: every row still
      // carries the same sn/gn/ns/ng/nb, term_e6 stays an independently
      // rounded integer (order-free sum), dnum the same exact decimal.
      val st = cells.groupBy(col("source")).agg(sum(col("n")).as("ns"))
      val tot = g.agg(sum(col("gn")).as("ng"), count(lit(1)).as("nb"))
      val grid = st.crossJoin(broadcast(g))
        .join(broadcast(cells), Seq("source", "b"), "left_outer")
        .withColumn("sn", coalesce(col("n"), lit(0L)))
        .crossJoin(broadcast(tot))
      val term = expr(
        "((sn + 1e0) / (ns + nb) - (gn + 1e0) / (ng + nb)) * " +
          "ln(((sn + 1e0) / (ns + nb)) / ((gn + 1e0) / (ng + nb)))")
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("b"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val psiKs = grid
        .withColumn("term_e6", round(term * lit(1000000d)).cast("long"))
        .withColumn("cs", sum(col("sn")).over(wb))
        .withColumn("cg", sum(col("gn")).over(wb))
        .withColumn("dnum", abs(
          col("cs").cast("decimal(38,0)") * col("ng") -
            col("cg").cast("decimal(38,0)") * col("ns")))
        .groupBy(col("source"), col("ns"), col("ng"))
        .agg(sum(col("term_e6")).as("psi_e6"), max(col("dnum")).as("dmax"))
        .select(col("source"), col("ns").as("n_docs"),
          col("psi_e6"), (col("psi_e6") > 250000L).as("drifted_psi"),
          expr("(2 * dmax * 1000000 + cast(ns as decimal(38,0)) * ng)" +
            " div (2 * cast(ns as decimal(38,0)) * ng)").as("ks_e6"),
          expr("(dmax * 1e0) / (ns * 1e0 * ng) >" +
            " 1.36 * sqrt((ns + ng) * 1e0 / (ns * 1e0 * ng))").as("drifted_ks"))
      val m = c.groupBy(col("source"))
        .agg(sum(col("n")).as("n"), sum(col("sxc")).as("sx"),
          sum(col("sxxc")).as("sxx"))
      val gm = m.agg(sum(col("n")).as("ngl"),
        sum(col("sx")).as("gx"), sum(col("sxx")).as("gxx"))
      val tt = m.crossJoin(broadcast(gm))
        .withColumn("n2", col("ngl") - col("n"))
        .withColumn("sx2", col("gx") - col("sx"))
        .withColumn("sxx2", col("gxx") - col("sxx"))
        .select(col("source"),
          expr("""CASE WHEN n >= 2 AND n2 >= 2 AND
            |  ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
            |  ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2 > 0
            |THEN round(
            |  ((sx * 1e0) / n - (sx2 * 1e0) / n2) / sqrt(
            |    ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
            |    ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2),
            |  6) END""".stripMargin).as("t_stat"))
        .withColumn("significant",
          when(col("t_stat").isNotNull, abs(col("t_stat")) > 1.96))
      psiKs.join(tt, Seq("source"))
        .select(col("source"), col("n_docs"), col("psi_e6"),
          col("drifted_psi"), col("ks_e6"), col("drifted_ks"),
          col("t_stat"), col("significant"))
        .reportSort(col("source"))
    })
  )

  def oracle: Map[String, String] = Map(
    // the three drift statistics' oracle formulations composed over one
    // shared cell CTE — formula-identical to the standalone oracles
    "dq_drift_report" ->
      """WITH c AS (SELECT source, n_chars // 50 AS b, count(*) AS n,
        |             CAST(sum(n_chars) AS HUGEINT) AS sxc,
        |             CAST(sum(n_chars * n_chars) AS HUGEINT) AS sxxc
        |           FROM documents GROUP BY 1, 2),
        |g AS (SELECT b, CAST(sum(n) AS BIGINT) AS gn FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(gn) AS BIGINT) AS gt, count(*) AS nb FROM g),
        |st AS (SELECT source, CAST(sum(n) AS BIGINT) AS sn_tot FROM c GROUP BY 1),
        |grid AS (SELECT s.source, g.b, g.gn, coalesce(c.n, 0) AS sn
        |         FROM (SELECT DISTINCT source FROM c) s
        |         CROSS JOIN g LEFT JOIN c ON c.source = s.source AND c.b = g.b),
        |terms AS (
        |  SELECT grid.source, sn_tot,
        |    CAST(round((((sn + 1e0) / (sn_tot + nb) - (gn + 1e0) / (gt + nb)) *
        |                ln(((sn + 1e0) / (sn_tot + nb)) /
        |                   ((gn + 1e0) / (gt + nb)))) * 1000000) AS BIGINT)
        |      AS term_e6
        |  FROM grid JOIN st ON st.source = grid.source CROSS JOIN tot),
        |psi AS (SELECT source, sn_tot AS n_docs,
        |          CAST(sum(term_e6) AS BIGINT) AS psi_e6,
        |          CAST(sum(term_e6) AS BIGINT) > 250000 AS drifted_psi
        |        FROM terms GROUP BY source, sn_tot),
        |cum AS (SELECT source, b,
        |          sum(sn) OVER (PARTITION BY source ORDER BY b) AS cs,
        |          sum(gn) OVER (PARTITION BY source ORDER BY b) AS cg
        |        FROM grid),
        |ksj AS (SELECT cum.source, cs, cg, sn_tot AS ns, gt AS ng
        |        FROM cum JOIN st ON st.source = cum.source CROSS JOIN tot),
        |ks AS (SELECT source, ns, ng,
        |         max(abs(CAST(cs AS HUGEINT) * ng - CAST(cg AS HUGEINT) * ns))
        |           AS dmax
        |       FROM ksj GROUP BY 1, 2, 3),
        |ks2 AS (SELECT source,
        |          CAST((2 * dmax * 1000000 + CAST(ns AS HUGEINT) * ng)
        |               // (2 * CAST(ns AS HUGEINT) * ng) AS BIGINT) AS ks_e6,
        |          (dmax * 1e0) / (ns * 1e0 * ng) >
        |            1.36 * sqrt((ns + ng) * 1e0 / (ns * 1e0 * ng)) AS drifted_ks
        |        FROM ks),
        |m AS (SELECT source, CAST(sum(n) AS BIGINT) AS n,
        |        CAST(sum(sxc) AS HUGEINT) AS sx,
        |        CAST(sum(sxxc) AS HUGEINT) AS sxx
        |      FROM c GROUP BY 1),
        |gm AS (SELECT CAST(sum(n) AS BIGINT) AS ngl,
        |         CAST(sum(sx) AS HUGEINT) AS gx,
        |         CAST(sum(sxx) AS HUGEINT) AS gxx FROM m),
        |tj AS (SELECT source, n, sx, sxx,
        |         ngl - n AS n2, gx - sx AS sx2, gxx - sxx AS sxx2
        |       FROM m CROSS JOIN gm),
        |tt AS (SELECT source,
        |         CASE WHEN n >= 2 AND n2 >= 2 AND
        |           ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
        |           ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2 > 0
        |         THEN round(
        |           ((sx * 1e0) / n - (sx2 * 1e0) / n2) / sqrt(
        |             ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
        |             ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2),
        |           6) END AS t_stat
        |       FROM tj)
        |SELECT psi.source, n_docs, psi_e6, drifted_psi, ks_e6, drifted_ks,
        |  t_stat,
        |  CASE WHEN t_stat IS NOT NULL THEN abs(t_stat) > 1.96 END AS significant
        |FROM psi JOIN ks2 ON ks2.source = psi.source
        |JOIN tt ON tt.source = psi.source
        |ORDER BY psi.source""".stripMargin,
    "dq_drift_ttest" ->
      """WITH m AS (SELECT source, count(*) AS n,
        |             CAST(sum(n_chars) AS HUGEINT) AS sx,
        |             CAST(sum(n_chars * n_chars) AS HUGEINT) AS sxx
        |           FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS ng,
        |        CAST(sum(sx) AS HUGEINT) AS gx,
        |        CAST(sum(sxx) AS HUGEINT) AS gxx FROM m),
        |j AS (SELECT source, n, sx, sxx,
        |        ng - n AS n2, gx - sx AS sx2, gxx - sxx AS sxx2
        |      FROM m CROSS JOIN g),
        |t AS (SELECT source, n, sx,
        |        CASE WHEN n >= 2 AND n2 >= 2 AND
        |          ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
        |          ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2 > 0
        |        THEN round(
        |          ((sx * 1e0) / n - (sx2 * 1e0) / n2) / sqrt(
        |            ((sxx * 1e0 - (sx * 1e0) * (sx * 1e0) / n) / (n - 1)) / n +
        |            ((sxx2 * 1e0 - (sx2 * 1e0) * (sx2 * 1e0) / n2) / (n2 - 1)) / n2),
        |          6) END AS t_stat
        |      FROM j)
        |SELECT source, n AS n_docs,
        |  CAST(CASE WHEN n > 0 THEN
        |    (2 * sx * 1000000 + n) // (2 * n) END AS BIGINT) AS mean_e6,
        |  t_stat,
        |  CASE WHEN t_stat IS NOT NULL THEN abs(t_stat) > 1.96 END AS significant
        |FROM t ORDER BY source""".stripMargin,
    "dq_drift_ks" ->
      """WITH c AS (SELECT source, n_chars // 50 AS b, count(*) AS n
        |           FROM documents GROUP BY 1, 2),
        |g AS (SELECT b, CAST(sum(n) AS BIGINT) AS gn FROM c GROUP BY 1),
        |st AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(gn) AS BIGINT) AS ng FROM g),
        |grid AS (SELECT s.source, g.b, g.gn, coalesce(c.n, 0) AS sn
        |         FROM (SELECT DISTINCT source FROM c) s
        |         CROSS JOIN g LEFT JOIN c ON c.source = s.source AND c.b = g.b),
        |cum AS (SELECT source, b,
        |          sum(sn) OVER (PARTITION BY source ORDER BY b) AS cs,
        |          sum(gn) OVER (PARTITION BY source ORDER BY b) AS cg
        |        FROM grid),
        |j AS (SELECT cum.source, cs, cg, ns, ng
        |      FROM cum JOIN st ON st.source = cum.source CROSS JOIN tot),
        |d AS (SELECT source, ns, ng,
        |        max(abs(CAST(cs AS HUGEINT) * ng - CAST(cg AS HUGEINT) * ns))
        |          AS dmax
        |      FROM j GROUP BY 1, 2, 3)
        |SELECT source, ns AS n_docs,
        |  CAST((2 * dmax * 1000000 + CAST(ns AS HUGEINT) * ng)
        |       // (2 * CAST(ns AS HUGEINT) * ng) AS BIGINT) AS ks_e6,
        |  (dmax * 1e0) / (ns * 1e0 * ng) >
        |    1.36 * sqrt((ns + ng) * 1e0 / (ns * 1e0 * ng)) AS drifted
        |FROM d ORDER BY source""".stripMargin,
    "dq_doc_embedding_coverage" ->
      """SELECT 'doc_without_embedding' AS check_name,
        |  (SELECT count(*) FROM documents d
        |   WHERE NOT EXISTS (SELECT 1 FROM embeddings e
        |                     WHERE e.vec_id = d.doc_id)) AS n
        |UNION ALL
        |SELECT 'embedding_without_doc',
        |  (SELECT count(*) FROM embeddings e
        |   WHERE NOT EXISTS (SELECT 1 FROM documents d
        |                     WHERE d.doc_id = e.vec_id))
        |UNION ALL
        |SELECT 'paired',
        |  (SELECT count(*) FROM documents d JOIN embeddings e
        |   ON e.vec_id = d.doc_id)
        |ORDER BY check_name""".stripMargin,
    // same centroid recipe as llm_ann_ivf's oracle: float32 CAST absorbs
    // avg() accumulation ulps, making the per-label centroid bit-exact
    // across engines; cosine threshold compares the rounded value
    "dq_embedding_outliers" ->
      """WITH cent AS (
        |  SELECT label, i, CAST(avg(CAST(embedding[i] AS DOUBLE)) AS REAL) AS c
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) s
        |  GROUP BY label, i),
        |centv AS (
        |  SELECT label, list_transform(list(c ORDER BY i), x -> CAST(x AS DOUBLE)) AS cv
        |  FROM cent GROUP BY label),
        |v AS (
        |  SELECT e.label,
        |    round(list_dot_product(ev, cv)
        |      / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(cv, cv))), 6)
        |      AS cos
        |  FROM (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |        FROM embeddings) e
        |  JOIN centv USING (label))
        |SELECT label, count(*) AS n_vecs,
        |  count(CASE WHEN cos < 0.6 THEN 1 END) AS n_outliers,
        |  round(min(cos), 6) AS min_cos, round(avg(cos), 6) AS avg_cos
        |FROM v GROUP BY label ORDER BY label""".stripMargin,
    // pos is 1-based here vs 0-based in Spark — it is only a join key
    // within each engine, never output, so the pairing is identical
    "dq_embedding_drift" ->
      """WITH e AS (SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        |           FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
        |per AS (SELECT label, pos,
        |          CAST(round(avg(x) * 1e6) AS BIGINT) AS c_e6,
        |          count(*) AS n
        |        FROM e GROUP BY 1, 2),
        |g AS (SELECT pos, CAST(round(avg(x) * 1e6) AS BIGINT) AS g_e6
        |      FROM e GROUP BY 1),
        |a AS (SELECT label, max(n) AS n_vecs,
        |        CAST(sum(c_e6 * g_e6) AS BIGINT) AS dot_e12,
        |        CAST(sum(c_e6 * c_e6) AS BIGINT) AS cc_e12,
        |        CAST(sum(g_e6 * g_e6) AS BIGINT) AS gg_e12,
        |        CAST(sum((c_e6 - g_e6) * (c_e6 - g_e6)) AS BIGINT) AS d2_e12
        |      FROM per JOIN g USING (pos) GROUP BY 1)
        |SELECT label, n_vecs,
        |  CASE WHEN cc_e12 > 0 AND gg_e12 > 0 THEN
        |    round(dot_e12 / (sqrt(cc_e12) * sqrt(gg_e12)), 6) END
        |    AS cos_to_global,
        |  round(sqrt(d2_e12) / 1e6, 6) AS l2_to_global
        |FROM a ORDER BY label""".stripMargin,
    "dq_drift_psi" ->
      """WITH c AS (SELECT source, n_chars // 50 AS b, count(*) AS n
        |           FROM documents GROUP BY 1, 2),
        |g AS (SELECT b, CAST(sum(n) AS BIGINT) AS gn FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(gn) AS BIGINT) AS gt, count(*) AS nb FROM g),
        |st AS (SELECT source, CAST(sum(n) AS BIGINT) AS sn_tot FROM c GROUP BY 1),
        |grid AS (SELECT s.source, g.b, g.gn, coalesce(c.n, 0) AS sn
        |         FROM (SELECT DISTINCT source FROM c) s
        |         CROSS JOIN g LEFT JOIN c ON c.source = s.source AND c.b = g.b),
        |terms AS (
        |  SELECT grid.source, sn_tot,
        |    CAST(round((((sn + 1e0) / (sn_tot + nb) - (gn + 1e0) / (gt + nb)) *
        |                ln(((sn + 1e0) / (sn_tot + nb)) /
        |                   ((gn + 1e0) / (gt + nb)))) * 1000000) AS BIGINT)
        |      AS term_e6
        |  FROM grid JOIN st ON st.source = grid.source CROSS JOIN tot)
        |SELECT source, sn_tot AS n_docs,
        |  CAST(sum(term_e6) AS BIGINT) AS psi_e6,
        |  CAST(sum(term_e6) AS BIGINT) > 250000 AS drifted
        |FROM terms GROUP BY source, sn_tot ORDER BY source""".stripMargin,
    // same pinned z parenthesization as the Spark side; the variance
    // guard runs in exact decimal so the boundary cannot straddle engines
    "dq_volume_anomaly" ->
      """WITH dy AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |g AS (SELECT count(*) AS nd,
        |        sum(CAST(n_events AS DECIMAL(38,0))) AS sx,
        |        sum(CAST(n_events AS DECIMAL(38,0)) * n_events) AS sxx
        |      FROM dy),
        |v AS (
        |  SELECT day, n_events,
        |    CASE WHEN nd >= 2 AND sxx * nd - sx * sx > 0
        |    THEN round((n_events * 1e0 - (sx * 1e0) / nd) / sqrt(
        |      (sxx * 1e0) / nd - ((sx * 1e0) / nd) * ((sx * 1e0) / nd)), 6)
        |    END AS z
        |  FROM dy CROSS JOIN g)
        |SELECT day, n_events, z,
        |  CASE WHEN z IS NOT NULL THEN abs(z) > 2.0 END AS anomalous
        |FROM v ORDER BY day""".stripMargin,
    "dq_freshness" ->
      """WITH per AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(max(ts) AS TIMESTAMP) AS last_ts,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
        |  FROM events GROUP BY 1),
        |g AS (SELECT max(last_us) AS global_us FROM per)
        |SELECT event_type, n, last_ts,
        |       (global_us - last_us) // 1000000 AS lag_s
        |FROM per, g ORDER BY event_type""".stripMargin,
    "dq_completeness" ->
      """WITH langs AS (SELECT DISTINCT lang FROM documents),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |actual AS (SELECT lang, source, count(*) AS n
        |           FROM documents GROUP BY 1, 2)
        |SELECT g.lang, g.source, coalesce(a.n, 0) AS n_docs,
        |       a.n IS NULL AS missing
        |FROM (SELECT lang, source FROM langs CROSS JOIN srcs) g
        |LEFT JOIN actual a ON g.lang = a.lang AND g.source = a.source
        |ORDER BY g.lang, g.source""".stripMargin,
    "dq_referential" ->
      """SELECT fk, n_orphan_keys, n_orphan_keys = 0 AS ok FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_orphan_keys
        |  FROM (SELECT DISTINCT l_orderkey FROM lineitem) k
        |  LEFT JOIN orders ON l_orderkey = o_orderkey WHERE o_orderkey IS NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part', count(*)
        |  FROM (SELECT DISTINCT l_partkey FROM lineitem) k
        |  LEFT JOIN part ON l_partkey = p_partkey WHERE p_partkey IS NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier', count(*)
        |  FROM (SELECT DISTINCT l_suppkey FROM lineitem) k
        |  LEFT JOIN supplier ON l_suppkey = s_suppkey WHERE s_suppkey IS NULL
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer', count(*)
        |  FROM (SELECT DISTINCT o_custkey FROM orders) k
        |  LEFT JOIN customer ON o_custkey = c_custkey WHERE c_custkey IS NULL)
        |ORDER BY fk""".stripMargin,
    "agg_decimal_pricing" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_price,
        |  CAST(avg(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,6)) AS avg_price,
        |  min(CAST(l_extendedprice AS DECIMAL(12,2))) AS min_price,
        |  max(CAST(l_extendedprice AS DECIMAL(12,2))) AS max_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "sub_scalar" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "sub_correlated" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "agg_minmax_by" ->
      """SELECT n_name,
        |  max_by(s_name, s_acctbal) AS richest,
        |  min_by(s_name, s_acctbal) AS poorest,
        |  bool_or(s_acctbal < 0) AS any_negative,
        |  bool_and(s_acctbal > -100000.0) AS all_bounded
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "fn_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'disc' AS metric, l_discount AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'qty', l_quantity FROM lineitem) u
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,
    // CASTs: count(*) is BIGINT but the *1000000 products and `//`
    // quotients must land back in BIGINT for the typed driver hash
    "dq_duplicate_rate" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct,
        |  count(*) - count(DISTINCT md5(text)) AS n_dups,
        |  CAST((2 * (count(*) - count(DISTINCT md5(text))) * 1000000
        |        + count(*)) // (2 * count(*)) AS BIGINT) AS dup_rate_e6
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "dq_profile" ->
      """SELECT col_name, n, n_null, n_distinct, min_val, max_val, mean_e6 FROM (
        |  SELECT 'l_quantity' AS col_name, count(*) AS n,
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    round(min(l_quantity), 6) AS min_val, round(max(l_quantity), 6) AS max_val,
        |    CASE WHEN count(l_quantity) > 0 THEN
        |      (2 * CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) * 10000
        |       + count(l_quantity)) // (2 * count(l_quantity)) END AS mean_e6
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*),
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_extendedprice),
        |    round(min(l_extendedprice), 6), round(max(l_extendedprice), 6),
        |    CASE WHEN count(l_extendedprice) > 0 THEN
        |      (2 * CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) * 10000
        |       + count(l_extendedprice)) // (2 * count(l_extendedprice)) END
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(*),
        |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_discount),
        |    round(min(l_discount), 6), round(max(l_discount), 6),
        |    CASE WHEN count(l_discount) > 0 THEN
        |      (2 * CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) * 10000
        |       + count(l_discount)) // (2 * count(l_discount)) END
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', count(*),
        |    CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_tax),
        |    round(min(l_tax), 6), round(max(l_tax), 6),
        |    CASE WHEN count(l_tax) > 0 THEN
        |      (2 * CAST(sum(CAST(round(l_tax * 100) AS BIGINT)) AS BIGINT) * 10000
        |       + count(l_tax)) // (2 * count(l_tax)) END
        |  FROM lineitem) u
        |ORDER BY col_name""".stripMargin,
    "dq_constraints" ->
      """WITH checks AS (
        |  SELECT 'lineitem_pk_unique' AS check_name,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS violations
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
        |  UNION ALL SELECT 'orders_pk_unique',
        |    count(*) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL SELECT 'lineitem_fk_orders', count(*) FROM lineitem
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL SELECT 'quantity_range', count(*) FROM lineitem
        |    WHERE l_quantity < 1 OR l_quantity > 50
        |  UNION ALL SELECT 'status_domain', count(*) FROM orders
        |    WHERE o_orderstatus NOT IN ('O', 'F', 'P')
        |  UNION ALL SELECT 'shipdate_not_null', count(*) FROM lineitem
        |    WHERE l_shipdate IS NULL)
        |SELECT check_name, violations = 0 AS pass,
        |  CAST(violations AS BIGINT) AS violations
        |FROM checks ORDER BY check_name""".stripMargin
  )
}
