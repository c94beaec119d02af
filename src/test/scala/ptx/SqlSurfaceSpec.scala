package ptx

import org.scalatest.funsuite.AnyFunSuite

/** Entry-point B at full width (r6, VERDICT r5 §5): run every oracle SQL
  * text through `spark.sql` over same-named temp views and require the
  * result to equal the DataFrame formulation of the same query.
  *
  * The oracle strings are written in DuckDB's dialect for the driver's
  * correctness gate; most of that dialect is plain ANSI that Spark parses
  * identically, which makes the oracle map double as a free SQL-string
  * test surface. Queries excluded here carry an explicit reason — either
  * DuckDB-only syntax/functions, or the raw-nanosecond `events` table
  * (the SQL assumes DuckDB's TIMESTAMP(NANOS) reading; Spark loads events
  * through the `Tables.events` µs-normalization, so the text is not
  * meaning-preserving across engines even when it parses).
  *
  * Contract: every NON-skipped oracle must parse, run, and match the
  * DataFrame result row-for-row (columns aligned by name, driver
  * discipline). A parse failure outside the skip list is a test failure —
  * so dialect drift in new oracles is caught at commit time, not by the
  * driver.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val SF = TestSpark.SF

  /** Queries whose oracle text cannot run meaningfully in Spark SQL.
    * Every entry names the DuckDB-ism; discovered mechanically by running
    * the full map through spark.sql (r6). */
  private val skips: Map[String, String] = {
    val listFns = "DuckDB list/string fns (string_split/list_*/unnest/array_to_string)"
    Map(
      // DuckDB list/string function family — Spark spells these
      // split/transform/filter/aggregate/explode/array_join
      "llm_bm25" -> listFns, "llm_containment" -> listFns,
      "llm_decontaminate" -> listFns, "llm_dedup_cluster" -> listFns,
      "llm_dedup_cluster_sizes" -> listFns,
      "llm_dedup_embed" -> listFns, "llm_dedup_near" -> listFns,
      "llm_embed_norm" -> listFns, "llm_fingerprint" -> listFns,
      "llm_knn_cosine" -> listFns, "llm_lang_id" -> listFns,
      "llm_quality_filter" -> listFns, "llm_quality_score" -> listFns,
      "llm_quantize_embed" -> listFns, "llm_repetition" -> listFns,
      "llm_semantic_topk_text" -> listFns, "llm_text_clean" -> listFns,
      "llm_text_stats" -> listFns, "llm_tfidf" -> listFns,
      "llm_keyword_extract" -> listFns, "llm_bigram_lm" -> listFns,
      "llm_pmi_collocations" -> listFns, "llm_bpe_pair_counts" -> listFns,
      "llm_curation_pipeline" -> listFns, "llm_vocab_coverage" -> listFns,
      "llm_token_count" -> listFns, "llm_unigram_logprob" -> listFns,
      "llm_wordcount" -> listFns, "llm_semdedup" -> listFns,
      "llm_chunk_overlap" -> listFns, "llm_tokenizer_fertility" -> listFns,
      "llm_containment_prefix" -> listFns,
      "llm_mix_entropy" -> listFns, "llm_dedup_spans" -> listFns,
      "llm_span_rewrite" -> listFns,
      "llm_chunk_dedup" -> listFns, "llm_ngram_diversity" -> listFns,
      "llm_stopword_candidates" -> listFns,
      "llm_ccnet_buckets" -> listFns,
      "llm_split_contamination" -> listFns,
      "llm_doc_novelty" -> listFns,
      "llm_eval_leakage" -> listFns,
      "llm_ann_recall" -> listFns,
      "llm_source_overlap" -> listFns,
      "llm_hot_shingles" -> listFns,
      "llm_dedup_prefix" -> listFns,
      "llm_winnowing" -> (listFns + " + // integer division"),
      "llm_dedup_threshold_curve" -> (listFns + " + [..] list literal"),
      "llm_embed_threshold_curve" -> (listFns + " + [..] list literal"),
      "llm_embed_threshold_curve_sem" -> (listFns + " + [..] list literal"),
      "llm_dedup_winnow" -> (listFns + " + // integer division"),
      "llm_dedup_winnow_capped" -> (listFns + " + // integer division"),
      "dq_embedding_outliers" -> "ORDER BY inside list() + list_dot_product",
      "llm_zipf_fit" -> "HUGEINT type (Spark: DECIMAL(38,0)) + string_split",
      "dq_drift_ks" -> "HUGEINT type (Spark: DECIMAL(38,0))",
      "dq_drift_ttest" -> "HUGEINT type (Spark: DECIMAL(38,0))",
      "dq_drift_report" -> "HUGEINT type (Spark: DECIMAL(38,0))",
      "dq_embedding_drift" -> ("embedding[i] is 1-based in DuckDB, 0-based " +
        "in Spark (join-key only, but generate_series/unnest don't parse)"),
      "agg_topk_sketch" -> listFns,
      "agg_topk_union" -> listFns, "mm_frame_sample" -> listFns,
      // DuckDB-only functions
      "agg_percentile" -> "quantile_cont (Spark: percentile)",
      "fn_bitwise" -> "xor() function (Spark: ^ operator)",
      "fn_date" -> "epoch() (Spark: unix_timestamp)",
      "fn_regex" -> "regexp_matches (Spark: rlike)",
      "fn_hash" -> "sha256() (Spark: sha2(x, 256))",
      "mm_binary_meta" -> "1-arg encode() (Spark encode needs charset)",
      "mm_modality_mix" -> "1-arg encode() (Spark encode needs charset)",
      "mm_dedup_payload" -> "1-arg encode() (Spark encode needs charset)",
      "mm_payload_entropy" -> "1-arg encode() + hex-pair byte explode",
      // DuckDB-only syntax
      "agg_collect_sorted" -> "ORDER BY inside array_agg",
      "agg_string_concat" -> "ORDER BY inside string_agg",
      "llm_ann_ivf" -> "ORDER BY inside array_agg",
      "llm_hybrid_rrf" -> "select-alias reference in same SELECT list",
      "llm_token_budget" -> "select-alias reference in same SELECT list",
      "fn_array" -> "list slicing arr[a:b]",
      "fn_array_ops" -> "list slicing arr[a:b]",
      "fn_string" -> "CAST(x AS VARCHAR) without length",
      "fn_try_arith" -> "CAST(x AS VARCHAR) without length",
      // parses in BOTH engines but means something different — the trap
      // this suite exists to catch and document
      "llm_centroid" -> ("embedding[i] is 1-based in DuckDB, 0-based in " +
        "Spark: same text, off-by-one result"))
  }

  private def norm(v: Any): Any = v match {
    case d: java.math.BigDecimal => BigDecimal(d.stripTrailingZeros())
    case d: BigDecimal => BigDecimal(d.underlying.stripTrailingZeros())
    case f: Float => f.toDouble
    case a: scala.collection.Seq[_] => a.map(norm).toList
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => (norm(k), norm(x)) }.toSeq.sortBy(_.toString()).toList
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm).toList
    case x => x
  }

  /** Collect with columns aligned by sorted name (the driver's compare
    * discipline), row order as produced (declared queries sort totally). */
  private def shape(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    val order = df.columns.zipWithIndex.sortBy(_._1).map(_._2)
    df.collect().toSeq.map(r => order.map(i => norm(r.get(i))).toSeq)
  }

  test("every non-excluded oracle SQL parses in Spark and matches its DataFrame twin") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      Tables.t(spark, SF, t).createOrReplaceTempView(t)
    // events deliberately NOT registered: oracles over it manipulate the
    // raw nanosecond column, which Spark's loader has already normalized
    val eventsBased = QueryRegistry.oracleSql.filter(_._2.toLowerCase
      .matches("(?s).*\\bfrom\\s+events\\b.*|(?s).*\\bjoin\\s+events\\b.*")).keySet
    var matched = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    QueryRegistry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      if (!skips.contains(name) && !eventsBased.contains(name)) {
        try {
          // dialect shim: DuckDB spells integer division `//`, Spark `div`.
          // Both truncate toward zero on integer operands (verified — the
          // half-up identities depend on it), so the rewrite is
          // meaning-preserving and keeps the r7 fixed-point oracles on
          // this surface instead of growing the skip list. Only operator
          // position (whitespace/paren-delimited) is rewritten so a future
          // '//' inside a string literal (URL, regex) survives untouched.
          val viaSql = shape(spark.sql(
            sql.replaceAll("""(?<=[\s)])//(?=[\s(])""", " div ")))
          val viaDf = shape(QueryRegistry.all(name)(spark, SF))
          ptx.Caching.releaseAll()
          if (viaSql == viaDf) matched += 1
          else {
            val i = viaSql.zip(viaDf).indexWhere { case (a, b) => a != b }
            failures += s"$name: MISMATCH (rows sql=${viaSql.size} df=${viaDf.size}, " +
              s"first diff row $i: sql=${viaSql.lift(i)} df=${viaDf.lift(i)})"
          }
        } catch {
          case e: Throwable =>
            failures += s"$name: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}"
        }
      }
    }
    assert(failures.isEmpty,
      s"non-excluded oracles must run in Spark and match:\n  ${failures.mkString("\n  ")}")
    // teeth: the surface must stay wide — most of the oracle map is ANSI.
    // (r6 measurement: 140 oracles − ~19 events-based − 40 skips ≈ 81.)
    assert(matched >= 60, s"only $matched oracle SQLs matched; expected >= 60")
    info(s"$matched oracle SQLs ran identically through spark.sql")
  }
}
