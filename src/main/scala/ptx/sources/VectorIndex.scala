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
  /** Compact a serving index maintained by the streaming refresh
    * pipeline (`cells/batch=<id>` appended per micro-batch) into a fresh
    * copy at `dst` — never in place, the Io.compact path guard (shared
    * helper, the [[DedupIndex.compact]] twin). The cell table collapses
    * to one `batch=base` partition RANGE-partitioned by `label` then
    * task-sorted (each output file covers a disjoint label interval —
    * a probe reads only its nprobe cells, so footer min/max pruning
    * pays directly; a bare within-partition sort would leave every
    * file's label range full-width once the table spans multiple read
    * partitions); the centroid frame copies over bit-exactly (float32
    * round-trips parquet). Run between refreshes; the layer above
    * swaps dirs. */
  def compactCells(spark: SparkSession, dir: String, dst: String): Unit = {
    Io.assertDisjointPaths(spark, dir, dst)
    spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("embedding"), col("label"))
      .repartitionByRange(col("label"))
      .sortWithinPartitions(col("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/cells/batch=base")
    spark.read.parquet(s"$dir/centroids")
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/centroids")
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Probe a persisted index: top-k neighbors per probe from the nprobe
    * nearest cells. `probes` must have columns (probe_id, p). */
  def probe(spark: SparkSession, dir: String, embeddings: DataFrame,
            probes: DataFrame, nprobe: Int = 3, k: Int = 5): DataFrame = {
    ptx.functions.VectorOps.register(spark)
    // SERVING shape (r12): the probe batch's cell frame is
    // model-parameter-sized (probes × nprobe rows — the kmeans
    // centroid-collect precedent, and like it this collect lives in
    // sources/, outside the declared-operator lint surface), so collect
    // it ONCE (r13, ADVICE r12: the previous labels-only collect
    // re-executed the probes×centroids cross join a second time inside
    // the verify's broadcast build): the wanted labels come out of the
    // collected rows driver-side, pushed as an In(label, …) filter INTO
    // the corpus scan — against the compactCells range-laid-by-label
    // layout the filter prunes row groups on footer min/max — and the
    // verify broadcasts the same rows back as a LocalRelation, whose
    // broadcast build re-runs nothing. The corpus is neither fully read
    // nor shuffled per probe batch (IoSpec asserts both on the physical
    // plan; the inline llm_ann_ivf query keeps the exchange form,
    // results identical either way).
    val cellsPlan = ptx.ops.LlmScale.ivfProbeCells(read(spark, dir), probes, nprobe)
    val cellRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    cellsPlan.collect().foreach(cellRows.add)
    val li = cellsPlan.schema.fieldIndex("label")
    val wanted = cellRows.toArray(Array.empty[org.apache.spark.sql.Row])
      .map(_.getInt(li)).distinct.toSeq
    val cells = spark.createDataFrame(cellRows, cellsPlan.schema)
    val cand = embeddings.select(col("vec_id").as("cand_id"),
      col("embedding").as("c"), col("label"))
      .filter(col("label").isin(wanted: _*))
    ptx.ops.LlmScale.ivfVerify(broadcast(cells), cand, k)
  }

  /** Zero-shuffle nearest-cell assignment: the k centroids fold into a
    * one-row broadcast array and each vector argmaxes over it in one HOF
    * pass (highest cosine wins, lower cell id on ties). THE assignment
    * primitive shared by the k-means builder and the streaming index
    * refresh — a per-vector groupBy/window formulation would shuffle the
    * corpus instead. `vecs` needs (vec_id, embedding); returns the same
    * columns plus the assigned cell `label`. */
  def assign(vecs: DataFrame, cent: DataFrame): DataFrame = {
    ptx.functions.VectorOps.register(vecs.sparkSession)
    val centArr = cent.agg(
      expr("array_sort(collect_list(struct(label, centroid)))").as("cents"))
    vecs.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        """array_max(transform(cents,
          |  c -> struct(cosine_sim(embedding, c.centroid) AS s,
          |              -c.label AS nl)))""".stripMargin))
      .select(col("vec_id"), col("embedding"), (-col("best.nl")).cast("int").as("label"))
  }

  /** Deterministic mini-Lloyd k-means — the production IVF cell builder
    * the label-based stand-in defers to. No RNG anywhere: seeds are the k
    * lowest-vec_id vectors and ties in assignment break toward the lower
    * cell id, so the build is reproducible across runs, engines, and
    * partitionings (the property every other deterministic operator in
    * this engine pins).
    *
    * Scale shape, per iteration:
    *  - ASSIGNMENT is shuffle-free: the k centroids fold into a one-row
    *    broadcast array and each vector argmaxes over it in one HOF pass
    *    (a per-vector window/groupBy formulation would shuffle the corpus
    *    every round);
    *  - UPDATE is the one unavoidable corpus shuffle (posexplode + mean
    *    per (cell, dim)), identical in shape to [[ptx.ops.LlmScale.ivfCentroids]];
    *  - the centroid frame is localCheckpoint'ed each round — k×dim floats
    *    — so plan lineage stays O(1) per round (the r3 cluster lesson).
    *
    * Returns (centroids (label, centroid float32), assignments
    * (vec_id, label)). Cosine assignment + mean update (spherical-ish
    * k-means without the renorm; the probe side only ranks by cosine, so
    * centroid scale is irrelevant).
    */
  def kmeans(embeddings: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"kmeans needs at least one iteration, got $iters")
    val spark = embeddings.sparkSession
    ptx.functions.VectorOps.register(spark)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    // seed frame is k rows — the global window runs AFTER the limit
    var cent: DataFrame = e.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(w) - 1).as("label"), col("embedding").as("centroid"))
    var asg: DataFrame = null
    (1 to iters).foreach { _ =>
      asg = assign(e, cent).select(col("vec_id"), col("label"))
      // the ONE centroid recipe (float32 cast is load-bearing for the
      // bit-exact persist/probe contract) — shared, not re-implemented
      cent = ptx.ops.LlmScale.ivfCentroids(e.join(asg, "vec_id"))
        .localCheckpoint()
    }
    (cent, asg)
  }
}
