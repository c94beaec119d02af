package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}
import ptx.ops.BoundedSort.ReportSortOps

/** Multimodal-column operators (builder prompt): media payloads as opaque
  * binary columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The binding tables carry no real media, so the payloads are IMAGES
  * BUILT FROM the corpus bytes — `ptx.functions.MediaDecode.toBmp` wraps
  * each doc's utf-8 bytes as a real 24 bpp Windows BMP, and since r17 the
  * decoder is a REAL pure-JVM BMP parser (little-endian header fields,
  * 4-byte row alignment, bottom-up rows, loud failure on unsupported
  * flavors) extracting pixel statistics — not a stand-in hash. The
  * Spark-side plumbing is the production shape: binary column + metadata
  * schema, partition-wise batch decode via mapPartitions over a typed
  * Dataset, and a downstream relational agg over extracted features.
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
    // ✓ per-source modality mix (r13): docs, payload bytes, and e6 doc
    // share per (source, kind) — the modality-balance report a
    // multimodal ingest monitors (a source whose image/audio/video mix
    // lurches is a pipeline change upstream: a new renderer, a broken
    // extractor — and the mix decides downstream decode capacity). Kind
    // is the group's deterministic doc_id%3 metadata (mm_binary_meta's
    // convention); share via half-up e6 against a per-source window
    // total. The window sum over counts is the HUGEINT oracle class —
    // CAST in the SQL (the win_range_banded r12 lesson).
    // Scale: one scan → (source, kind) agg → |sources×kinds| window.
    "mm_modality_mix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("source"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          octet_length(col("payload")).as("nb"))
        .groupBy(col("source"), col("kind"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nb")).as("n_bytes"))
        .withColumn("n_src",
          sum(col("n_docs")).over(Window.partitionBy(col("source"))))
        .select(col("source"), col("kind"), col("n_docs"), col("n_bytes"),
          expr("(2 * n_docs * 1000000 + n_src) div (2 * n_src)")
            .as("doc_share_e6"))
        .reportSort(col("source"), col("kind"))
    }),
    // ✓ payload-entropy triage (r11): e6-snapped Shannon entropy (nats)
    // of each payload's byte distribution via the codegen'd
    // `ByteEntropy` kernel — the before-decode health check that
    // separates degenerate/truncated payloads (→0) from text (~3) from
    // compressed/encrypted blobs (→ln 256 ≈ 5.545) without decoding.
    // Exactness: each ≤256-term −p·ln p is one pinned double expression
    // from exact (c, n) integers, half-up e6-snapped, then summed
    // exactly — the PSI term discipline; the oracle mirrors it per term
    // (hex-pair byte explode, n-bounded). Scale: one fused histogram
    // pass per row in the scan stage; payload bytes never shuffle (the
    // oracle's per-byte explode is the formulation this kernel exists
    // to avoid at media sizes).
    "mm_payload_entropy" -> ((s, d) => {
      ptx.functions.ByteEntropyFn.register(s)
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          expr("byte_entropy_e6(payload)").as("entropy_e6"))
        .orderBy(col("doc_id"))
    }),
    // ✓ aspect-preserving resize planning over typed media metadata: fit
    // (img_w, img_h) into a 32x32 box without upscaling — the relational
    // half of a resize stage (the pixel kernel would sit behind
    // MediaDecode like the decoder stub).
    "mm_resize" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          (lit(16) + col("doc_id") % 64).as("img_w"),
          (lit(16) + (col("doc_id") * 7) % 64).as("img_h"))
        .withColumn("scale_num", lit(32))
        .withColumn("out_w", expr(
          "CAST(CASE WHEN img_w <= 32 AND img_h <= 32 THEN img_w " +
            "ELSE greatest(1, (img_w * 32) div greatest(img_w, img_h)) END AS BIGINT)"))
        .withColumn("out_h", expr(
          "CAST(CASE WHEN img_w <= 32 AND img_h <= 32 THEN img_h " +
            "ELSE greatest(1, (img_h * 32) div greatest(img_w, img_h)) END AS BIGINT)"))
        .select(col("doc_id"), col("img_w"), col("img_h"), col("out_w"), col("out_h"))
        .orderBy(col("doc_id"))
    }),
    // ✓ frame sampling plan for video payloads: every 7th frame index of a
    // synthetic n_frames, exploded to (doc, frame) rows — the shape a
    // frame-extraction stage fans out over before the per-frame decode.
    "mm_frame_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2) // the 'video' kind of mm_binary_meta
        .withColumn("n_frames", (lit(10) + col("doc_id") % 50))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 7)")).as("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
    // ✓ payload checksum dedup (r9): exact dedup of BINARY payloads by
    // content — the first pass of every multimodal ingest (the same image
    // re-crawled under different ids). The grouping key is the payload's
    // md5, so at 100 TB the 16-byte digest shuffles, never payload
    // bytes — the module's scale invariant holds through the dedup too.
    // n_copies + keep-lowest-id canonical mirror llm_dedup_exact's
    // semantics at the byte grain (md5 collision odds ~2^-64 at any
    // plausible corpus size; a byte-exact verify join would bolt on the
    // llm_dedup family's pattern if that ever mattered).
    "mm_dedup_payload" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("fp"))
        .withColumn("n_copies", count(lit(1)).over(w))
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .withColumn("is_canonical", col("doc_id") === col("keep_id"))
        .orderBy(col("doc_id"))
    }),
    // ◌ partition-wise decode + feature extraction: each payload is a
    // REAL 24 bpp BMP (toBmp wraps the doc bytes; r17 — decoder upgraded
    // from stub to an actual BMP parser), decoded to pixel statistics
    // [w, h, mean B/G/R, mean/stddev luma, bright fraction], then a
    // relational agg over the features — no oracle (imperative
    // mapPartitions path); MultimodalSpec pins hand-computed feature
    // vectors on known pixel buffers, the encode/decode round trip,
    // padding/row-order handling, and loud rejection of malformed files.
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
    "mm_dedup_payload" ->
      """WITH b AS (SELECT doc_id,
        |             octet_length(encode(text)) AS n_bytes,
        |             md5(text) AS fp
        |           FROM documents)
        |SELECT doc_id, n_bytes, fp,
        |  count(*) OVER (PARTITION BY fp) AS n_copies,
        |  min(doc_id) OVER (PARTITION BY fp) AS keep_id,
        |  doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_canonical
        |FROM b ORDER BY doc_id""".stripMargin,
    // CASTs: DuckDB sum(BIGINT) — both the byte sum and the per-source
    // window total — returns HUGEINT while Spark stays int64
    "mm_modality_mix" ->
      """WITH m AS (SELECT source,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS nb FROM documents),
        |g AS (SELECT source, kind, count(*) AS n_docs,
        |        CAST(sum(nb) AS BIGINT) AS n_bytes FROM m GROUP BY 1, 2),
        |t AS (SELECT source, kind, n_docs, n_bytes,
        |        CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |      FROM g)
        |SELECT source, kind, n_docs, n_bytes,
        |  CAST((2 * n_docs * 1000000 + n_src) // (2 * n_src) AS BIGINT) AS doc_share_e6
        |FROM t ORDER BY source, kind""".stripMargin,
    // per-byte explode via hex pairs (DuckDB has no blob-element access);
    // the term expression and rounding mirror the kernel's pinned
    // parenthesization exactly
    "mm_payload_entropy" ->
      """WITH b AS (SELECT doc_id, encode(text) AS payload FROM documents),
        |h AS (SELECT doc_id, octet_length(payload) AS n, hex(payload) AS hx
        |      FROM b),
        |e AS (SELECT doc_id, n, substr(hx, 2 * i - 1, 2) AS byte
        |      FROM h, unnest(generate_series(1, n)) AS s(i)
        |      WHERE n > 0),
        |c AS (SELECT doc_id, n, byte, count(*) AS c FROM e GROUP BY 1, 2, 3),
        |t AS (SELECT doc_id, n,
        |        CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1000000, 0)
        |          AS BIGINT) AS term
        |      FROM c WHERE c < n)
        |SELECT h.doc_id, h.n AS n_bytes,
        |  CAST(CASE WHEN h.n IS NULL THEN NULL
        |       ELSE coalesce(sum(t.term), 0) END AS BIGINT) AS entropy_e6
        |FROM h LEFT JOIN t ON t.doc_id = h.doc_id
        |GROUP BY h.doc_id, h.n ORDER BY h.doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id, img_w, img_h,
        |  CAST(CASE WHEN img_w <= 32 AND img_h <= 32 THEN img_w
        |       ELSE greatest(1, (img_w * 32) // greatest(img_w, img_h)) END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN img_w <= 32 AND img_h <= 32 THEN img_h
        |       ELSE greatest(1, (img_h * 32) // greatest(img_w, img_h)) END AS BIGINT) AS out_h
        |FROM (SELECT doc_id, 16 + doc_id % 64 AS img_w, 16 + (doc_id * 7) % 64 AS img_h
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, n_frames, k * 7 AS frame_idx FROM (
        |  SELECT doc_id, 10 + doc_id % 50 AS n_frames FROM documents
        |  WHERE doc_id % 3 = 2) v
        |CROSS JOIN (SELECT unnest(generate_series(0, 1000)) AS k) s
        |WHERE k * 7 <= n_frames - 1
        |ORDER BY doc_id, frame_idx""".stripMargin,
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
