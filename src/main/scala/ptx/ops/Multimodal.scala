package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}

/** Multimodal-column operators (builder prompt): media payloads as opaque
  * binary columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The binding tables carry no real media, so the payload is the utf-8 bytes
  * of `text` (a deterministic stand-in) and the decoder in
  * `ptx.functions.MediaDecode` is a STUB — but the Spark-side plumbing is
  * real: binary column + metadata schema, partition-wise batch decode via
  * mapPartitions over a typed Dataset, and a downstream relational agg over
  * extracted features.
  *
  * Scale notes (100 TB): payload bytes never pass through a shuffle — decode
  * runs in the scan stage (mapPartitions before any wide op) and only the
  * small feature vectors continue. Metadata-only queries (`mm_binary_meta`)
  * never materialize payload beyond the projected columns.
  */
object Multimodal {

  def queries: Map[String, QFn] = Map(
    // ✓ typed metadata over a binary payload column
    "mm_binary_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("text")).as("fp"),
          // synthetic typed media metadata derived deterministically
          (lit(16) + col("doc_id") % 64).as("img_w"),
          (lit(16) + (col("doc_id") * 7) % 64).as("img_h"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"))
        .orderBy(col("doc_id"))
    }),
    // ◌ partition-wise decode + feature extraction (stubbed decoder),
    // then a relational agg over the features — no oracle (imperative
    // mapPartitions path); covered by MultimodalSpec.
    "mm_decode_features" -> ((s, d) => {
      import s.implicits._
      val bin = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      val feats = bin.mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, ptx.functions.MediaDecode.features(bytes))
        }
      }.toDF("doc_id", "features")
      feats
        .select(col("doc_id"),
          round(expr("aggregate(features, 0D, (a, x) -> a + x * x)"), 6).as("f_norm_sq"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy(col("doc_id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS fp,
        |  16 + doc_id % 64 AS img_w,
        |  16 + (doc_id * 7) % 64 AS img_h,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
