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
    "llm_dedup_minhash_lsh", "llm_dedup_simhash", "pt_threshold_alerts",
    "agg_having")

  QueryRegistry.all.foreach { case (name, fn) =>
    test(s"$name: deterministic and well-formed at sf0.001") {
      val r1 = fn(spark, TestSpark.SF).collect().map(_.toString).toSeq
      val r2 = fn(spark, TestSpark.SF).collect().map(_.toString).toSeq
      assert(r1 == r2, s"$name is nondeterministic across runs")
      if (!mayBeEmpty(name)) assert(r1.nonEmpty, s"$name returned no rows")
    }
  }

  test("every oracle key has a query; ◌ keys are the declared sketch ops") {
    assert((QueryRegistry.oracleSql.keySet -- QueryRegistry.all.keySet).isEmpty)
    val noOracle = QueryRegistry.all.keySet -- QueryRegistry.oracleSql.keySet
    assert(noOracle == Set("agg_approx_distinct", "agg_approx_percentile",
      "llm_dedup_minhash_lsh", "llm_dedup_simhash", "llm_ann_lsh",
      "mm_decode_features", "scan_sample"))
  }
}
