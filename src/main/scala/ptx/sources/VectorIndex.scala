package ptx.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index: the build-once / probe-many split of the IVF path.
  *
  * `llm_ann_ivf` computes its coarse centroids inline, which is right for a
  * one-shot query but wrong for a serving workload: at billions of vectors
  * the centroid build is a full corpus pass, while each probe batch only
  * needs the (tiny) centroid frame plus the probed cells. Persisting the
  * index as parquet makes the build amortized and the probe side cheap:
  *
  *  - `write` runs the corpus-pass centroid aggregation once and lays the
  *    per-cell centroids down as parquet (KBs — one float32 vector per
  *    cell);
  *  - `read`/`probe` load ONLY the index (broadcast-sized by construction)
  *    and touch corpus vectors cell-by-cell through the candidate join.
  *
  * Parquet round-trips float32 exactly, and the centroid build CASTs to
  * float32 before writing (absorbing avg()'s accumulation-order ulps), so
  * a probe against the persisted index is bit-identical to the inline
  * query — asserted in IoSpec.
  */
object VectorIndex {

  /** Corpus pass: build and persist the per-cell coarse centroids. */
  def write(embeddings: DataFrame, dir: String): Unit =
    ptx.ops.LlmScale.ivfCentroids(embeddings)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Load a persisted index (schema: label, centroid array<float>). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Probe a persisted index: top-k neighbors per probe from the nprobe
    * nearest cells. `probes` must have columns (probe_id, p). */
  def probe(spark: SparkSession, dir: String, embeddings: DataFrame,
            probes: DataFrame, nprobe: Int = 3, k: Int = 5): DataFrame = {
    ptx.functions.VectorOps.register(spark)
    ptx.ops.LlmScale.ivfProbe(read(spark, dir), embeddings, probes, nprobe, k)
  }
}
