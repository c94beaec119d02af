package ptx.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared 3-word shingle construction for the dedup family — ONE definition
  * so the exact (llm_dedup_near) and LSH (llm_dedup_minhash_lsh) paths can
  * never diverge on what counts as a shingle.
  */
object TextShingles {
  /** distinct (doc_id, shingle) pairs for a documents frame. The shingle
    * column is the 3-gram's 64-BIT KEY from the codegen'd [[GramHashes]]
    * kernel (r10), not the joined string: every consumer (inverted-index
    * joins, minhash signatures, the broadcast decontamination index) only
    * ever compares/counts/aggregates shingles, so an 8-byte key gives the
    * same answers with ~3× narrower exchanges and no per-shingle string
    * allocation — measured 2× on this stream's build (MicroBench r10),
    * with the identical distinct count on the fixture corpus. The prior
    * HOF form (`transform(sequence(...), i -> concat_ws(...))`) also ran
    * interpreted, the same pathology the span family's gram stream had.
    * Same ≈2e-11 64-bit pair-collision caveat as the span/minhash keys
    * (two distinct shingles colliding would merge their index entries);
    * the DuckDB oracles group shingle STRINGS, so parity runs verify the
    * counts agree. Documents with fewer than 3 words yield no rows
    * (kernel returns the empty array, matching the oracle's
    * `WHERE i <= len(w) - 2` guard).
    *
    * Dedup is per-doc, so `array_distinct` BEFORE the explode — the old
    * `.distinct()` after it shuffled the whole exploded shingle stream
    * (~8× the text bytes) to deduplicate pairs that can only collide
    * within one row. The `repartition(doc_id)` moves the one remaining
    * shuffle to the narrow pre-explode frame: it restores fan-out when
    * the corpus arrives in few input splits (a small parquet file reads
    * as ONE partition — measured 2× on the dedup family at local[32]
    * without it) and hash-partitions by doc_id, which the
    * `groupBy(doc_id)` consumers in every dedup operator then reuse
    * without their own exchange.
    *
    * Pass `repartitionByDoc = false` when the result feeds a broadcast
    * (e.g. llm_decontaminate's eval index): the broadcast collects to the
    * driver anyway, so the repartition exchange would be pure overhead.
    */
  def shingles(documents: DataFrame, repartitionByDoc: Boolean = true): DataFrame = {
    TextGrams.register(documents.sparkSession)
    val parted = if (repartitionByDoc) documents.repartition(col("doc_id")) else documents
    parted
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(array_distinct(expr("gram_hashes(w, 3)"))).as("shingle"))
  }

  /** (doc1, doc2, inter): distinct-shingle intersection counts for every
    * doc pair passing `keep` — the inverted-index core shared by
    * llm_dedup_near, llm_containment, and llm_hybrid_rrf's lexical side
    * (ONE definition so the three can never diverge, same rationale as
    * [[shingles]]). `keep` predicates on a single side (e.g. a probe
    * filter) push below the join, so restricting one side costs nothing.
    * SCALE: quadratic in per-shingle df — the callers' shared guard
    * (docs/SCALE.md §G11) routes 100 TB corpora through MinHash banding.
    */
  def intersections(sh: DataFrame,
                    keep: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
                      => org.apache.spark.sql.Column): DataFrame = {
    val a = sh.toDF("doc1", "shingle")
    val b = sh.toDF("doc2", "shingle")
    a.join(b, Seq("shingle"))
      .filter(keep(col("doc1"), col("doc2")))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("inter"))
  }

  /** (doc_id, n_sh): per-doc distinct-shingle counts — the denominator
    * frame for Jaccard/containment over [[intersections]]. */
  def docSizes(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
}
