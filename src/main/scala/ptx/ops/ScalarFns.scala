package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}

/** G8 — scalar function surface (SURVEY.md §2 G8). One declared query per
  * function family; every output column is a function result so the oracle
  * hashes actual function behavior, not pass-throughs.
  *
  * All of these are Catalyst built-ins → whole-stage codegen, no UDFs.
  */
object ScalarFns {

  def queries: Map[String, QFn] = Map(
    "fn_string" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub"),
          length(col("p_name")).as("len"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
          lpad(col("p_size").cast("string"), 4, "0").as("padded"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("joined"),
          regexp_replace(col("p_name"), " ", "_").as("rep"),
          reverse(col("p_brand")).as("rev"),
          element_at(split(col("p_name"), " "), 2).as("word2"))
        .orderBy(col("p_partkey"))
    }),
    "fn_regex" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("cust_digits"),
          col("c_mktsegment").rlike("^(BU|MA)").as("seg_match"),
          regexp_extract(col("c_mktsegment"), "([A-Z]+)", 1).as("seg_word"))
        .orderBy(col("c_custkey"))
    }),
    "fn_date" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey")) // r18: sort first (fn_json_map note)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dd"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
    }),
    "fn_math" -> ((s, d) => {
      // r18 split (guide §2.3/§1.1): the range exchange SAMPLES its child
      // to pick bounds, so everything below the sort is computed twice
      // (sampling + real pass). Only the 5 derived SORT-KEY columns stay
      // below; the 7 non-key projections (log/pow/abs/signum/mult) moved
      // above the sort and now compute once. The sort keys are the SAME
      // expressions as before, so the total order — and the oracle hash —
      // is unchanged (a Project above Sort preserves row order).
      Tables.lineitem(s, d)
        // r19: the derived-key projection (and the range sampler's re-run
        // of it) had been serial in the fixture's one scan task — an
        // explicit hash exchange spreads it, and the sampling pass
        // re-reads this exchange instead of re-scanning (ReuseExchange)
        .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"),
          col("l_discount"), col("l_tax"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).as("tax_pct_floor"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          greatest(col("l_quantity"), lit(10.0)).as("qty_hi"),
          least(col("l_quantity"), lit(10.0)).as("qty_lo"))
        // (l_orderkey, l_linenumber) is not unique; the extra keys determine
        // every output column (extprice via sqrt_price, qty via qty_hi+qty_lo,
        // disc via disc_pct_ceil, tax via tax_pct_floor), so remaining ties
        // are full-row duplicates
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("sqrt_price"),
          col("qty_hi"), col("qty_lo"), col("disc_pct_ceil"), col("tax_pct_floor"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * col("l_discount")).as("disc_amt"),
          abs(col("l_quantity") - 25.0).as("dev"),
          col("disc_pct_ceil"), col("tax_pct_floor"), col("sqrt_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(log10(col("l_extendedprice")), 6).as("log10_price"),
          round(pow(col("l_quantity"), 2.0), 2).as("qty_sq"),
          (col("l_linenumber") % 3).as("ln_mod"),
          signum(col("l_discount") - 0.05).as("disc_sign"),
          col("qty_hi"), col("qty_lo"))
    }),
    "fn_conditional" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") > 0, "credit").otherwise("debit").as("side"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("B_DEFAULT")).as("seg_or_default"),
          when(col("c_acctbal") < 0, -col("c_acctbal")).otherwise(col("c_acctbal")).as("abs_bal"),
          nullif(col("c_nationkey").cast("int"), lit(0)).as("natkey_nz"))
        .orderBy(col("c_custkey"))
    }),
    "fn_array" -> ((s, d) => {
      // float32 arrays upcast to double before math (oracle-parity discipline)
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(element_at(col("embedding"), 64).cast("double"), 6).as("e64"),
          round(expr(
            "aggregate(slice(embedding, 1, 4), CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"
          ), 6).as("head_sum"),
          round(expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
          ), 4).as("l2_sq"),
          round(array_max(expr("transform(embedding, x -> CAST(x AS DOUBLE))")), 6).as("emax"))
        .orderBy(col("vec_id"))
    }),
    "fn_json_map" -> ((s, d) => {
      // r18: event_id is a RAW column — sort first, parse above the sort
      // (guide §2.3): the JSON parse is the query's whole cost and the
      // range sampling below a projected sort re-ran it per invocation
      Tables.events(s, d)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k2"),
          (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"))
    }),
    // array set operations over word arrays; outputs joined to strings so
    // the oracle compares scalars (set ops are order-unspecified → each is
    // sorted first)
    "fn_array_ops" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .withColumn("a", expr("slice(w, 1, 5)"))
        .withColumn("b", expr("slice(w, 3, 5)"))
        .select(
          col("doc_id"),
          array_join(sort_array(array_union(col("a"), col("b"))), ",").as("u"),
          array_join(sort_array(array_intersect(col("a"), col("b"))), ",").as("i"),
          array_join(sort_array(array_except(col("a"), col("b"))), ",").as("x"),
          size(array_distinct(col("w"))).as("nd"),
          array_join(flatten(array(col("a"), col("b"))), ",").as("cat"))
        .orderBy(col("doc_id"))
    }),
    // MapType semantics (SURVEY §1.2 note): build a real MapType column via
    // str_to_map over the stripped JSON, then access/inspect it. Output is
    // flattened to scalars so the oracle (which has no str_to_map) matches
    // on values.
    "fn_map" -> ((s, d) => {
      // r18: sort first on the raw key, parse above (fn_json_map note)
      Tables.events(s, d)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .withColumn("m", expr(
          """str_to_map(regexp_replace(props, '[{}"\\s]', ''), ',', ':')"""))
        .select(
          col("event_id"),
          element_at(col("m"), "k").cast("int").as("k_via_map"),
          size(col("m")).as("n_keys"),
          array_join(map_keys(col("m")), ",").as("keys"))
    }),
    // ✓ bitwise family: &, |, xor, shifts, popcount over 64-bit keys —
    // all codegen'd single-instruction ops (partition/bucket math,
    // bitmask flags, the building blocks SimHash/bitmap ops use).
    // DuckDB's bit_count returns TINYINT (oracle casts to INT to match
    // Spark).
    "fn_bitwise" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255L)).as("b_and"),
        col("p_partkey").bitwiseOR(lit(4096L)).as("b_or"),
        col("p_partkey").bitwiseXOR(col("p_size").cast("long")).as("b_xor"),
        shiftleft(col("p_partkey"), 3).as("b_shl"),
        shiftright(col("p_partkey"), 2).as("b_shr"),
        bit_count(col("p_partkey")).as("b_pop"))
        .orderBy(col("p_partkey"))
        .limit(500)
    }),
    // try_* null-on-error arithmetic (r5) — the ANSI-mode escape hatches a
    // dirty-data ingest actually needs: Spark 4 runs ANSI ON, where /0 and
    // long overflow THROW; try_divide/try_add return NULL instead, letting
    // a pipeline quarantine bad rows rather than die mid-job. try_cast
    // exercises mixed numeric/non-numeric strings (the CSV-ingest reality).
    // All three are row-local, codegen'd, shuffle-free.
    "fn_try_arith" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
      // the sort adds every input the projection reads, so any rows still
      // tied are byte-identical and the LIMIT boundary is engine-stable
      Tables.lineitem(s, d)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_quantity"), col("l_discount"), col("l_returnflag"))
        .limit(2000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // divisor 0 for discounts < 2.5% (~25% of rows) → NULL, not error
          round(expr("try_divide(l_extendedprice, round(l_discount * 20))"), 6)
            .as("safe_div"),
          // overflows max long for every orderkey > 7 → NULL, not error
          expr("try_add(l_orderkey, 9223372036854775800L)").as("big_add"),
          // odd lines carry a numeric string, even lines a letter flag
          expr("""try_cast(IF(l_linenumber % 2 = 1,
                   CAST(CAST(l_quantity AS INT) AS STRING), l_returnflag)
                   AS INT)""").as("mixed_int"))
    }),
    // ✓ cryptographic-hash parity (r9): md5 + sha256 over the same utf-8
    // text bytes on both engines — the fingerprint functions are the
    // dedup/manifest backbone of this library (chunk fps, payload
    // checksums, shard manifests), so their cross-engine byte-level
    // agreement is a contract worth pinning as its own query, not only
    // as a side effect of dedup results. Pure scan, zero shuffle but the
    // output sort.
    "fn_hash" -> ((s, d) => {
      // r18: sort first on the raw key, hash above (fn_json_map note)
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"))
    })
  )

  def oracle: Map[String, String] = Map(
    "fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substr(p_name, 1, 5) AS sub, length(p_name) AS len,
        |  trim(' ' || p_name || ' ') AS trimmed,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
        |  p_brand || '/' || p_type AS joined,
        |  replace(p_name, ' ', '_') AS rep,
        |  reverse(p_brand) AS rev,
        |  string_split(p_name, ' ')[2] AS word2
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, 'Customer#(\d+)', 1) AS cust_digits,
        |  regexp_matches(c_mktsegment, '^(BU|MA)') AS seg_match,
        |  regexp_extract(c_mktsegment, '([A-Z]+)', 1) AS seg_word
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dd,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS days_since,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * l_discount AS disc_amt,
        |  abs(l_quantity - 25.0) AS dev,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice), 6) AS log10_price,
        |  round(pow(l_quantity, 2.0), 2) AS qty_sq,
        |  l_linenumber % 3 AS ln_mod,
        |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |       WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS disc_sign,
        |  greatest(l_quantity, 10.0) AS qty_hi,
        |  least(l_quantity, 10.0) AS qty_lo
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, sqrt_price, qty_hi, qty_lo,
        |         disc_pct_ceil, tax_pct_floor""".stripMargin,
    "fn_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal > 0 THEN 'credit' ELSE 'debit' END AS side,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'B_DEFAULT') AS seg_or_default,
        |  CASE WHEN c_acctbal < 0 THEN -c_acctbal ELSE c_acctbal END AS abs_bal,
        |  nullif(CAST(c_nationkey AS INTEGER), 0) AS natkey_nz
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |  round(CAST(embedding[64] AS DOUBLE), 6) AS e64,
        |  round(list_aggregate(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)), 'sum'), 6) AS head_sum,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS l2_sq,
        |  round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS emax
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_json_map" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k2,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array_ops" ->
      """SELECT doc_id,
        |  -- DuckDB list_sort(NULL-or-empty) yields NULL where Spark's
        |  -- sort_array yields []; coalesce to the empty string
        |  coalesce(array_to_string(list_sort(list_distinct(a || b)), ','), '') AS u,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |        x -> list_contains(b, x))), ','), '') AS i,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |        x -> NOT list_contains(b, x))), ','), '') AS x,
        |  len(list_distinct(w)) AS nd,
        |  array_to_string(a || b, ',') AS cat
        |FROM (SELECT doc_id, w, w[1:5] AS a, w[3:7] AS b
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t) s
        |ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_via_map,
        |  1 AS n_keys, 'k' AS keys
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS b_and,
        |  p_partkey | 4096 AS b_or,
        |  xor(p_partkey, CAST(p_size AS BIGINT)) AS b_xor,
        |  p_partkey << 3 AS b_shl,
        |  p_partkey >> 2 AS b_shr,
        |  CAST(bit_count(p_partkey) AS INTEGER) AS b_pop
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "fn_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice / NULLIF(round(l_discount * 20), 0), 6) AS safe_div,
        |  CASE WHEN l_orderkey > 7 THEN NULL
        |       ELSE CAST(l_orderkey + 9223372036854775800 AS BIGINT) END AS big_add,
        |  TRY_CAST(CASE WHEN l_linenumber % 2 = 1
        |                THEN CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
        |                ELSE l_returnflag END AS INTEGER) AS mixed_int
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity,
        |         l_discount, l_returnflag
        |LIMIT 2000""".stripMargin
  )
}
