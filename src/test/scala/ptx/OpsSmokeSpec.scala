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

  test("source lint: no whole-frame driver materialization in operator sources (r11)") {
    // `.collect()` inside a declared operator means the op is not
    // distributed — the brief's scale-killer. The only sanctioned
    // driver-side fetch in ops/ is a 1-ROW MODEL-PARAMETER `.head()`
    // on an aggregate (the Bloom-sketch / centroid pattern), pinned
    // here by exact count so a new one must justify itself in this
    // lint. (VectorIndex.kmeans' k-row centroid collect lives in
    // sources/, outside the declared-operator surface.)
    import scala.jdk.CollectionConverters._
    val opsDir = java.nio.file.Paths.get("src/main/scala/ptx/ops")
    assert(java.nio.file.Files.isDirectory(opsDir),
      s"lint must run from the repo root; cwd=${System.getProperty("user.dir")}")
    val sources = java.nio.file.Files.walk(opsDir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    assert(sources.nonEmpty)
    val collects = sources.filter(p =>
      java.nio.file.Files.readString(p).contains(".collect()"))
      .map(_.getFileName.toString)
    assert(collects.isEmpty, s"operator sources call .collect(): $collects")
    val heads = sources.map { p =>
      p.getFileName.toString ->
        "\\.head\\(\\)".r.findAllIn(java.nio.file.Files.readString(p)).size
    }.filter(_._2 > 0).toMap
    assert(heads == Map("Curation.scala" -> 1),
      s"unexpected driver-side .head() in ops/: $heads — sanctioned " +
        "fetches are 1-row model parameters only; update this lint with " +
        "the justification if adding one")
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

  test("registry lint: every query output is atomic-typed (VERDICT r9 #2)") {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    // The driver dumps EVERY declared query (◌ included) and
    // pandas-sorts all columns to canonicalize; array/map/struct cells
    // become unhashable ndarrays there and crash the compare (the r9
    // llm_quantize_pq failure). Lint the whole registry so the failure
    // class can't recur silently.
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    // self-check: the lint must flag a deliberately array-emitting frame
    val bad = spark.sql("SELECT array(1, 2) AS a, 1 AS b")
    assert(bad.schema.fields.exists(f => !atomic(f.dataType)),
      "lint self-check failed to flag an array column")
    QueryRegistry.all.foreach { case (name, fn) =>
      val schema = try fn(spark, TestSpark.SF).schema finally Caching.releaseAll()
      val offenders = schema.fields.filterNot(f => atomic(f.dataType))
      assert(offenders.isEmpty, s"$name emits non-atomic top-level columns: " +
        offenders.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    }
  }

  test("anchorScaleTwin pairs real registry keys, anchors distinct from twins") {
    QueryRegistry.anchorScaleTwin.foreach { case (anchor, twin) =>
      assert(QueryRegistry.all.contains(anchor), s"unknown anchor $anchor")
      assert(QueryRegistry.all.contains(twin), s"unknown scale twin $twin")
      assert(anchor != twin)
    }
  }

  test("every SCALE.md anchor-bound query has an anchorScaleTwin entry (r15)") {
    // the pinned list of queries docs/SCALE.md classes as anchor-bound
    // (quadratic or anchor-frame-inherited at the 10× probe). Adding an
    // anchor-class query without registering its scale twin — the r14
    // drift where QUERIES.md advertised 33-41×-at-10× curves as
    // scale-path — now fails HERE instead of surfacing in a doc review.
    // A twin may itself be exact and oracled (win_range_banded,
    // llm_embed_threshold_curve_sem); what the map asserts is only
    // which plan a 100 TB deployment runs.
    val anchorBound = Set(
      "llm_dedup_near",            // 78× at 10× (SCALE.md probe table)
      "llm_containment",           // 113×
      "llm_dedup_winnow",          // 95×
      "llm_dedup_embed",           // all-pairs BNLJ (77.7 s at 10×)
      "llm_dedup_threshold_curve", // 33×
      "llm_embed_threshold_curve", // 41×
      "llm_dedup_cluster_sizes",   // inherits the exact-pair anchor
      "win_range_frame")           // key-cardinality-bound, not quadratic
    assert(QueryRegistry.anchorScaleTwin.keySet == anchorBound,
      "anchorScaleTwin drifted from the SCALE.md anchor-bound class: " +
        s"map-only ${QueryRegistry.anchorScaleTwin.keySet -- anchorBound}, " +
        s"unmapped ${anchorBound -- QueryRegistry.anchorScaleTwin.keySet}")
  }

  test("every oracle key has a query; ◌ keys are the declared sketch ops") {
    assert((QueryRegistry.oracleSql.keySet -- QueryRegistry.all.keySet).isEmpty)
    val noOracle = QueryRegistry.all.keySet -- QueryRegistry.oracleSql.keySet
    assert(noOracle == Set("agg_approx_distinct", "agg_approx_percentile",
      "agg_hll_sketch", "agg_hll_union",
      "llm_dedup_minhash_lsh", "llm_dedup_simhash", "llm_dedup_cluster_lsh",
      "llm_dedup_threshold_curve_lsh", // r14: banded-candidate curve twin
      "llm_bpe_learn", // r14: iterative merge learner (driver loop)
      "llm_bpe_encode", // r15: encoder over the learned merge table
      "llm_bpe_doc_tokens", // r16: doc-grain counts via the type join
      "llm_tokenizer_fertility_bpe", // r16: per-lang real-token fertility
      "llm_pack_sequences_bpe", // r16: packing on real tokenizer counts
      "llm_token_budget_bpe", // r16: budget on real tokenizer counts
      "llm_ann_lsh", "llm_ann_ivf_kmeans", "llm_quantize_pq",
      "llm_ann_recall_kmeans", // r14: served-index recall (iterative build)
      "llm_ann_recall_lsh", // r15: LSH-path recall (seeded planes)
      "llm_semdedup_kmeans", // r15: semantic dedup over learned cells
      "llm_dedup_cluster_sizes_lsh", // r15: histogram over banded labels
      "mm_decode_features", "scan_sample",
      "llm_split_contamination_bloom")) // r11: FP-inflated Bloom twin
  }
}
