package ptx

import org.scalatest.funsuite.AnyFunSuite

/** Runs every registered query at sf0.001 twice and asserts identical
  * results — the self-parity harness from SURVEY §5.2. Nondeterminism
  * (unsorted output, collect_list order, ties without tiebreak) is the #1
  * oracle-compare killer; this catches it without DuckDB in the JVM.
  */
class OpsSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // queries that legitimately return 0 rows on the tiny sf0.001 slices
  private val mayBeEmpty = Set("llm_dedup_embed", "llm_dedup_near",
    "llm_dedup_minhash_lsh", "llm_dedup_simhash", "llm_dedup_cluster",
    "llm_dedup_cluster_lsh", "pt_threshold_alerts", "agg_having")

  QueryRegistry.all.foreach { case (name, fn) =>
    test(s"$name: deterministic and well-formed at sf0.001") {
      try {
        val r1 = fn(spark, TestSpark.SF).collect().map(_.toString).toSeq
        val r2 = fn(spark, TestSpark.SF).collect().map(_.toString).toSeq
        assert(r1 == r2, s"$name is nondeterministic across runs")
        if (!mayBeEmpty(name)) assert(r1.nonEmpty, s"$name returned no rows")
      } finally Caching.releaseAll()
    }
  }

  test("operator-pinned caches are released, not leaked (ADVICE r1)") {
    // delta-based: other suites share this session (and may cache), so
    // only assert about RDDs that appear during OUR query
    val before = spark.sparkContext.getPersistentRDDs.keySet
    QueryRegistry.all("llm_dedup_near")(spark, TestSpark.SF).count()
    val pinnedNow = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinnedNow.nonEmpty, "expected llm_dedup_near to pin its shingle frame")
    Caching.releaseAll()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.intersect(pinnedNow)
    assert(leaked.isEmpty, s"releaseAll left cached RDDs behind: $leaked")
  }

  test("every oracle key has a query; ◌ keys are the declared sketch ops") {
    assert((QueryRegistry.oracleSql.keySet -- QueryRegistry.all.keySet).isEmpty)
    val noOracle = QueryRegistry.all.keySet -- QueryRegistry.oracleSql.keySet
    assert(noOracle == Set("agg_approx_distinct", "agg_approx_percentile",
      "agg_hll_sketch", "agg_hll_union",
      "llm_dedup_minhash_lsh", "llm_dedup_simhash", "llm_dedup_cluster_lsh",
      "llm_ann_lsh", "llm_ann_ivf_kmeans", "llm_quantize_pq",
      "mm_decode_features", "scan_sample"))
  }
}
