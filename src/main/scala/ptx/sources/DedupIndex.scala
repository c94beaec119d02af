package ptx.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted near-dup index: the build-once / probe-many split of the
  * MinHash-LSH path — the [[VectorIndex]] discipline at the dedup grain.
  *
  * `llm_dedup_minhash_lsh` signs and bands the whole corpus inline, which
  * is right for a one-shot audit but wrong for the workflow a 100 TB lake
  * actually runs: shards arrive INCREMENTALLY, and re-signing petabytes to
  * admit a gigabyte shard is the cost this index removes. Persisting the
  * per-doc signatures once makes each admission linear in the SHARD:
  *
  *  - `write` runs the corpus signature aggregation once and lays down two
  *    parquet tables: `bands/` (doc_id, band, key — the candidate-join
  *    side) and `sets/` (doc_id, n_sh, shset — the exact-verify side);
  *  - `probe` signs ONLY the new shard, joins its band keys against the
  *    persisted band table (plus the shard's own, so intra-shard dups are
  *    caught too), and exact-verifies candidates against the union of
  *    persisted and shard sets;
  *  - `append` admits the shard into the index for the next round.
  *
  * Bit-stability: signatures are xxhash64 minima over the shared
  * [[ptx.functions.TextShingles]] stream — pure integer functions of the
  * text, so a parquet round-trip is exact and `probe` returns byte-identical
  * pairs to an inline full recompute restricted to shard-touching pairs
  * (asserted in IoSpec). Shared recipe objects
  * ([[ptx.ops.LlmScale.minhashSignatures]]/`bandKeys`/`verifyJaccard`)
  * make divergence from the query path a compile-time impossibility.
  *
  * Scale: the probe's band join shuffles the persisted band table by its
  * 8-byte key once per admission — at deployment scale that table lives
  * bucketed by `key` (bucketed table / liquid layout), making admissions
  * shuffle-free on the index side. Candidate fan-out is banding-bounded
  * exactly as in the inline query; the verify fetches only candidate
  * doc_ids' sets. Caller contract: doc_ids are unique corpus-wide (a
  * re-crawled payload arrives under a new id — that is what the index is
  * for).
  *
  * Layout: every writer lands under a `batch=<tag>` partition subdir of
  * `bands/` and `sets/` in OVERWRITE mode, so re-running an admission with
  * the same tag REPLACES its files instead of duplicating them — the
  * idempotent-replay contract the streaming admission pipeline
  * ([[ptx.stream.Pipelines.shardAdmission]]) needs for retried
  * micro-batches, and shard-grain compaction/pruning units at rest.
  * Readers drop the discovered `batch` column by explicit projection.
  */
object DedupIndex {

  /** Corpus pass: build and persist signatures for `docs` (doc_id, text). */
  def write(docs: DataFrame, dir: String): Unit =
    writeTag(docs, dir, "base", SaveMode.Overwrite)

  /** Near-dup pairs `(doc1, doc2, jaccard ≥ threshold)` touching the new
    * shard: shard↔index and shard↔shard, never index↔index (those were
    * reported when their shards were admitted). Signs only the shard. */
  def probe(spark: SparkSession, dir: String, newDocs: DataFrame,
            threshold: Double = 0.4): DataFrame = {
    ptx.functions.VectorOps.register(spark) // sorted_intersect_count
    val shardSig = ptx.Caching.pin(ptx.ops.LlmScale.minhashSignatures(
      ptx.functions.TextShingles.shingles(newDocs)
        .select(col("doc_id"), col("shingle").as("h"))))
    val shardBands = ptx.ops.LlmScale.bandKeys(shardSig)
    // explicit projections drop the batch=<tag> partition column the
    // layout adds on read
    val allBands = spark.read.parquet(s"$dir/bands")
      .select(col("doc_id"), col("band"), col("key"))
      .unionByName(shardBands)
    // one side is always the shard; doc1 < doc2 dedups the shard↔shard
    // mirror and canonicalizes shard↔index order
    val cands = shardBands.toDF("a", "band", "key")
      .join(allBands.toDF("b", "band", "key"), Seq("band", "key"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("doc1"),
        greatest(col("a"), col("b")).as("doc2"))
      .distinct()
    // dropDuplicates, not a bare union: a RETRIED admission probes a shard
    // whose docs may already sit in the index (the failed attempt's
    // append landed) — without the dedup each such doc's rows appear on
    // both sides of the verify join and fan every touching pair out ×2.
    // Signatures are pure functions of the text, so the duplicate rows
    // are identical and either copy is correct.
    val sets = spark.read.parquet(s"$dir/sets")
      .select(col("doc_id"), col("n_sh"), col("shset"))
      .unionByName(shardSig.select(col("doc_id"), col("n_sh"), col("shset")))
      .dropDuplicates("doc_id")
    ptx.ops.LlmScale.verifyJaccard(cands, sets, threshold)
      .orderBy(col("doc1"), col("doc2"))
  }

  /** Admit a shard: add its signatures to the persisted index under its
    * own `batch=<tag>` partition (overwrite — re-admitting the same tag
    * replaces, never duplicates). Call after [[probe]]'s action completes
    * (and its pins are released). */
  def append(docs: DataFrame, dir: String, tag: String): Unit =
    writeTag(docs, dir, tag, SaveMode.Overwrite)

  /** Compact the index at `dir` into a fresh single-partition copy at
    * `dst` (never in place — the Io.compact contract, same path guard):
    * after many small-shard admissions the band/set tables hold one tiny
    * parquet partition per batch, and the probe's index-side scan pays
    * per-file open and footer cost for each. The copy holds the same
    * rows under one `batch=base` partition — probes against it are
    * row-identical (signatures are per-doc rows; asserted in IoSpec) —
    * with the band table RANGE-partitioned by `key` then sorted within
    * tasks, so each output file covers a disjoint key interval and a
    * band-key join prunes on footer min/max (a bare
    * sortWithinPartitions would sort each multi-file read bundle whose
    * keys already span the full range — no pruning at exactly the
    * accumulated-index scale this exists for). Run between admissions
    * (like any compaction, not concurrency-safe with an in-flight
    * append); the layer above swaps directories. */
  def compact(spark: SparkSession, dir: String, dst: String): Unit = {
    Io.assertDisjointPaths(spark, dir, dst)
    spark.read.parquet(s"$dir/bands")
      .select(col("doc_id"), col("band"), col("key"))
      .repartitionByRange(col("key"))
      .sortWithinPartitions(col("key"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/bands/batch=base")
    spark.read.parquet(s"$dir/sets")
      .select(col("doc_id"), col("n_sh"), col("shset"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/sets/batch=base")
  }

  private def writeTag(docs: DataFrame, dir: String, tag: String,
                       mode: SaveMode): Unit = {
    val sig = ptx.ops.LlmScale.minhashSignatures(
      ptx.functions.TextShingles.shingles(docs)
        .select(col("doc_id"), col("shingle").as("h")))
      .persist(StorageLevel.MEMORY_AND_DISK) // two writers below; lifecycle
    try {                                    // is contained in this call
      ptx.ops.LlmScale.bandKeys(sig)
        .write.mode(mode).parquet(s"$dir/bands/batch=$tag")
      sig.select(col("doc_id"), col("n_sh"), col("shset"))
        .write.mode(mode).parquet(s"$dir/sets/batch=$tag")
    } finally sig.unpersist()
  }
}
