package ptx.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import ptx.{QFn, Tables}
import ptx.ops.BoundedSort.ReportSortOps

/** G11 — LLM-data-pipeline operators (SURVEY.md §2 G11): dedup, similarity
  * search, multimodal joins, text analysis.
  *
  * Scale notes (100 TB):
  *  - exact dedup = one shuffle on text (or on a text hash at scale — same
  *    plan shape);
  *  - near-dup via shingle inverted index: explode → distinct → self-join on
  *    shingle. At 100 TB the declared-exact form is preceded by the
  *    MinHash-LSH pre-filter (`llm_dedup_minhash_lsh`) so the self-join only
  *    sees banded candidates, not the full shingle index;
  *  - knn: probes are broadcast (small side), candidates streamed — no
  *    shuffle of the big side; per-probe top-k via window on the probe key.
  */
object LlmData {

  /** embeddings with the float32 vector upcast to double once. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"), col("label"))

  /** top-k cosine neighbors for probes with vec_id < nProbes.
    * Scoring: the codegen'd ptx.functions.CosineSim expression (float arrays
    * in, sequential double fold — bit-identical to the DuckDB oracle's
    * list_dot_product over double-cast lists, one fused loop instead of
    * three HOF lambda chains). Reduction: the mergeable TopK aggregator —
    * map-side partial top-k, so the shuffle carries k entries per probe per
    * partition instead of every (probe, candidate) pair (the window
    * formulation would co-locate all pairs before ranking).
    */
  private def knn(s: SparkSession, d: String, nProbes: Int, k: Int): DataFrame = {
    ptx.functions.VectorOps.register(s)
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
    val cand = emb.select(col("vec_id").as("cand_id"), col("embedding").as("c"))
    cand.crossJoin(broadcast(probes))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", expr("cosine_sim(p, c)"))
      .groupBy(col("probe_id"))
      .agg(ptx.functions.Aggregators.top_k(col("sim"), col("cand_id"), k).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("probe_id"), (col("pos") + 1).as("rnk"),
        col("e._2").as("cand_id"), col("e._1").as("sim"))
  }

  def queries: Map[String, QFn] = Map(
    "llm_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    }),
    // Exact Jaccard ≥ 0.4 pairs via a count-based shingle inverted index.
    // A PPJoin-style prefix-filtered variant (index only each doc's
    // |s|-⌈t|s|⌉+1 rarest shingles; exact by the AllPairs prefix theorem)
    // was implemented and MEASURED at sf0.1: candidates drop 1.13M → 0.52M
    // but wall time rises 2.0 s → 4.5-6.8 s — the rarity window sort, the
    // df join and the per-candidate set verify cost more than the narrow
    // join+count they save at this corpus size/skew (df p99 = 18, max 25;
    // no hot-shingle blowup to kill). Kept: the count-based index for the
    // graded scale; the skew-robust 100 TB paths remain minhash-LSH /
    // simhash (`ops/LlmScale.scala`), which bound candidates by banding
    // rather than prefix order. See docs/SCALE.md §G11.
    //
    // SCALE GUARD: this exact form is the small-corpus correctness anchor.
    // Its inverted-index self-join is quadratic in per-shingle document
    // frequency — one hot shingle shared by m docs yields m² candidate
    // rows, so at 100 TB a single boilerplate phrase OOMs the join. At
    // scale run `llm_dedup_minhash_lsh` (LlmScale.scala), whose banding
    // bounds candidates regardless of df skew, and reserve this operator
    // for verifying candidate pairs it emits. docs/SCALE.md §G11.
    "llm_dedup_near" -> ((s, d) => {
      // pin: the shingle frame feeds the inverted-index join twice and
      // the per-doc counts once; column pruning differs per consumer so
      // exchange reuse cannot deduplicate the scans without the cache.
      // Released by the harness via Caching.releaseAll() post-action.
      val sh = ptx.Caching.pin(
        ptx.functions.TextShingles.shingles(Tables.documents(s, d)))
      val n = ptx.functions.TextShingles.docSizes(sh)
      val inter = ptx.functions.TextShingles.intersections(sh, _ < _)
      val jac = col("inter").cast("double") /
        (col("na.n_sh") + col("nb.n_sh") - col("inter"))
      inter
        .join(n.as("na"), col("doc1") === col("na.doc_id"))
        .join(n.as("nb"), col("doc2") === col("nb.doc_id"))
        .withColumn("jaccard", round(jac, 6))
        .filter(jac >= 0.4)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }),
    "llm_knn_cosine" -> ((s, d) => {
      knn(s, d, nProbes = 100, k = 10)
        .select(col("probe_id"), col("rnk"), col("cand_id"), round(col("sim"), 6).as("sim"))
        .reportSort(col("probe_id"), col("rnk"))
    }),
    "llm_embed_norm" -> ((s, d) => {
      vecs(s, d)
        .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("nrm")), 4).as("avg_norm"),
          round(min(col("nrm")), 4).as("min_norm"),
          round(max(col("nrm")), 4).as("max_norm"))
        .reportSort(col("label"))
    }),
    "llm_centroid" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .filter(col("pos") < 4)
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("x").cast("double")), 6).as("c"))
        .reportSort(col("label"), col("pos"))
    }),
    // e6 micro-means via half-up integer division — char/word sums and
    // doc counts are exact BIGINTs, and round(sum/count) flips on
    // 2^a·5^b group counts (the r6 pt_burn_rate half-point lesson).
    "llm_text_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("sum_words"),
          countDistinct(col("source")).as("n_sources"))
        .select(col("lang"), col("n_docs"),
          // char/word sums fit BIGINT even at 100 TB of text (~1e14), but
          // the ·10⁶ product does not — lift to DECIMAL(38,0) (q8 rule)
          expr("(2 * cast(sum_chars as decimal(38,0)) * 1000000 + n_docs)" +
            " div (2 * n_docs)").as("avg_chars_e6"),
          expr("(2 * cast(sum_words as decimal(38,0)) * 1000000 + n_docs)" +
            " div (2 * n_docs)").as("avg_words_e6"),
          col("n_sources"))
        .reportSort(col("lang"))
    }),
    "llm_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .reportSort(col("n").desc, col("word"))
        .limit(20)
    }),
    "llm_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      // single tokenize pass: each doc has exactly one lang, so
      // df(word) = Σ over langs of distinct-docs(word, lang)
      val perLang = tok.groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("nd"))
      val dfw = perLang.groupBy(col("word")).agg(sum(col("nd")).as("df"))
      val w = Window.partitionBy(col("lang")).orderBy(col("score").desc, col("word"))
      perLang.join(dfw, Seq("word")).crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("lang"), col("rnk"), col("word"), round(col("score"), 6).as("score"))
        .reportSort(col("lang"), col("rnk"))
    }),
    // ✓ per-document keyword extraction (r6): top-3 TF-IDF terms per doc —
    // the summarization/tagging primitive downstream of the corpus-level
    // llm_tfidf. Same float discipline as llm_tfidf (tf · ln ratio is one
    // deterministic expression per row; ties break on word). The df side
    // is a |vocab|-row aggregate joined back on word; the per-doc top-3
    // window shuffles on doc_id — nothing is |corpus×vocab|-sized.
    "llm_keyword_extract" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      val tf = tok.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      // df derives from tf, not from a second corpus explode: tf's rows
      // ARE the distinct (doc, word) pairs, so count(*) per word ==
      // countDistinct(doc_id) over the token stream — one tokenize pass
      // total (measured 8 → 6 exchanges)
      val dfw = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("word"))
      tf.join(dfw, Seq("word")).crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("word"),
          round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"), col("rnk"))
    }),
    "llm_multimodal_join" -> ((s, d) => {
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .reportSort(col("label"))
    }),
    "llm_semantic_topk_text" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      knn(s, d, nProbes = 10, k = 5)
        .join(docs, col("cand_id") === col("doc_id"))
        .select(col("probe_id"), col("rnk"), col("cand_id"),
          round(col("sim"), 6).as("sim"), col("text").as("neighbor_text"))
        .reportSort(col("probe_id"), col("rnk"))
    }),
    // ✓ BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed 3-term query,
    // top-10 docs. Shuffle-free per-doc scoring: term frequencies come
    // from HOF filters over the split words array (no explode, no token
    // shuffle), and the corpus stats (N, Σlen, per-term df) are ONE
    // 1-row aggregate broadcast back. Determinism: tf/df/len are exact
    // ints, avgdl divides exact ints, and the 3 term scores are summed in
    // ONE fixed-associativity expression — never a float sum across rows,
    // so both engines compute bit-identical doubles.
    "llm_bm25" -> ((s, d) => {
      val terms = Seq("spark", "query", "merge")
      val base = ptx.Caching.pin(
        Tables.documents(s, d)
          .withColumn("w", split(col("text"), " "))
          .select(Seq(col("doc_id"), size(col("w")).as("dl")) ++
            terms.zipWithIndex.map { case (t, i) =>
              expr(s"size(filter(w, x -> x = '$t'))").as(s"tf$i")
            }: _*))
      val statCols = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_len")) ++
        terms.indices.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = base.agg(statCols.head, statCols.tail: _*)
      def term(i: Int): Column = {
        val idf = log((col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
        idf * (col(s"tf$i") * 2.2) /
          (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      }
      base.crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sum_len").cast("double") / col("n_docs"))
        .withColumn("score", round(term(0) + term(1) + term(2), 6))
        .filter(col("score") > 0)
        .select(col("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    }),
    // ✓ hybrid retrieval via reciprocal-rank fusion (r5): the standard
    // RAG pattern — a semantic ranking (embedding cosine top-20 per
    // probe, the codegen'd kernel + mergeable TopK) and a lexical ranking
    // (shingle Jaccard vs the probe doc, window top-20) fused as
    // Σ 1/(60 + rank) with a missing ranking contributing 0, exact-int
    // denominators so both engines compute identical doubles. The two
    // rankings run independently (no barrier between their shuffles) and
    // meet in ONE outer join keyed (probe, cand) — at 100 TB each side
    // is probe-bounded (k rows per probe), so the fusion join is tiny
    // regardless of corpus size.
    "llm_hybrid_rrf" -> ((s, d) => {
      val sem = knn(s, d, nProbes = 10, k = 20)
        .select(col("probe_id"), col("cand_id"), col("rnk").as("sem_rnk"))
      val sh = ptx.Caching.pin(
        ptx.functions.TextShingles.shingles(Tables.documents(s, d)))
      val n = ptx.functions.TextShingles.docSizes(sh)
      val inter = ptx.functions.TextShingles
        .intersections(sh, (p, c) => p < 10 && p =!= c)
        .toDF("probe_id", "cand_id", "inter")
      val jac = col("inter").cast("double") /
        (col("np.n_sh") + col("nc.n_sh") - col("inter"))
      val wLex = Window.partitionBy(col("probe_id"))
        .orderBy(col("jac").desc, col("cand_id"))
      val lex = inter
        .join(n.as("np"), col("probe_id") === col("np.doc_id"))
        .join(n.as("nc"), col("cand_id") === col("nc.doc_id"))
        .withColumn("jac", jac)
        .withColumn("lex_rnk", row_number().over(wLex))
        .filter(col("lex_rnk") <= 20)
        .select(col("probe_id"), col("cand_id"), col("lex_rnk"))
      val fused = sem.join(lex, Seq("probe_id", "cand_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("sem_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("lex_rnk")), lit(0.0)))
      val wTop = Window.partitionBy(col("probe_id"))
        .orderBy(col("rrf").desc, col("cand_id"))
      fused.withColumn("rnk", row_number().over(wTop))
        .filter(col("rnk") <= 5)
        .select(col("probe_id"), col("rnk"), col("cand_id"),
          round(col("rrf"), 6).as("rrf"))
        .reportSort(col("probe_id"), col("rnk"))
    }),
    // ✓ directed shingle containment ≥ 0.5 (r5): |A∩B| / |A| — the
    // quote/subset detector exact Jaccard misses (a short doc embedded in
    // a long one has low Jaccard but high containment). Same inverted
    // index as llm_dedup_near — intersections computed ONCE on unordered
    // pairs, then both directions emitted — and the same scale guard
    // applies: df-quadratic, anchor only. NOTE (r9): MinHash banding is
    // NOT a valid candidate router here — high-containment/low-Jaccard
    // pairs sit below any banding threshold; the df-skew-robust scale
    // formulation is `llm_containment_prefix` (LlmScale.scala, one-sided
    // prefix filtering — exact at its threshold). Containment divides
    // exact ints → no float boundary.
    "llm_containment" -> ((s, d) => {
      val sh = ptx.Caching.pin(
        ptx.functions.TextShingles.shingles(Tables.documents(s, d)))
      val n = ptx.functions.TextShingles.docSizes(sh)
      val inter = ptx.functions.TextShingles.intersections(sh, _ < _)
      // r19 (guide §2.4): both directions EXPLODE off one intersection row
      // — the union form referenced `inter` twice, and while ReuseExchange
      // deduped the shuffle, the post-shuffle pair aggregation and its
      // scan ran once per branch. Same rows, same values.
      val dir = inter.select(explode(array(
          struct(col("doc1").as("src"), col("doc2").as("dst"),
            col("inter").as("inter")),
          struct(col("doc2").as("src"), col("doc1").as("dst"),
            col("inter").as("inter")))).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"),
          col("p.inter").as("inter"))
      val c = col("inter").cast("double") / col("n_sh")
      dir.join(n, col("src") === col("doc_id"))
        .filter(c >= 0.5)
        .select(col("src"), col("dst"), round(c, 6).as("containment"))
        .orderBy(col("src"), col("dst"))
    })
  )

  /** Shared oracle CTE fragments (DuckDB dialect). */
  private val VX =
    "(SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  private def knnSql(nProbes: Int, k: Int): String =
    s"""WITH vx AS (SELECT * FROM $VX t),
       |pairs AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |         list_dot_product(p.v, c.v)
       |           / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
       |  FROM vx p JOIN vx c ON p.vec_id < $nProbes AND p.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT probe_id, cand_id, sim,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rnk
       |  FROM pairs)
       |SELECT probe_id, rnk, cand_id, round(sim, 6) AS sim FROM ranked WHERE rnk <= $k""".stripMargin

  def oracle: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "llm_dedup_near" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |-- constant series because DuckDB 1.0 lacks lateral generate_series(col);
        |-- 1000 comfortably exceeds the fixture max of 99 words/doc
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |       FROM words CROSS JOIN (SELECT unnest(generate_series(1, 1000)) AS i) s
        |       WHERE i <= len(w) - 2),
        |n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc1, doc2,
        |       round(CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter), 6) AS jaccard
        |FROM inter JOIN n na ON na.doc_id = doc1 JOIN n nb ON nb.doc_id = doc2
        |WHERE CAST(inter AS DOUBLE) / (na.n_sh + nb.n_sh - inter) >= 0.4
        |ORDER BY doc1, doc2""".stripMargin,
    "llm_knn_cosine" ->
      (knnSql(100, 10) + "\nORDER BY probe_id, rnk"),
    "llm_embed_norm" ->
      s"""SELECT label, count(*) AS n,
        |  round(avg(nrm), 4) AS avg_norm, round(min(nrm), 4) AS min_norm,
        |  round(max(nrm), 4) AS max_norm
        |FROM (SELECT label, sqrt(list_dot_product(v, v)) AS nrm FROM $VX t) x
        |GROUP BY label ORDER BY label""".stripMargin,
    "llm_centroid" ->
      """SELECT label, i - 1 AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c
        |FROM embeddings CROSS JOIN (VALUES (1), (2), (3), (4)) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    "llm_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  (2 * CAST(sum(n_chars) AS BIGINT) * 1000000 + count(*))
        |    // (2 * count(*)) AS avg_chars_e6,
        |  (2 * CAST(sum(len(string_split(text, ' '))) AS BIGINT) * 1000000
        |   + count(*)) // (2 * count(*)) AS avg_words_e6,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "llm_wordcount" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "llm_tfidf" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        |             FROM documents),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |dfw AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
        |tf AS (SELECT lang, word, count(*) AS tf FROM tok GROUP BY lang, word),
        |sc AS (SELECT lang, tf.word AS word,
        |              tf * ln((n_docs + 1.0) / (df + 1.0)) AS score
        |       FROM tf JOIN dfw ON tf.word = dfw.word CROSS JOIN nd),
        |ranked AS (SELECT lang, word, score,
        |                  row_number() OVER (PARTITION BY lang
        |                                     ORDER BY score DESC, word) AS rnk
        |           FROM sc)
        |SELECT lang, rnk, word, round(score, 6) AS score FROM ranked
        |WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin,
    "llm_keyword_extract" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfw AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, tf.word AS word,
        |              tf * ln((n_docs + 1.0) / (df + 1.0)) AS score
        |       FROM tf JOIN dfw ON tf.word = dfw.word CROSS JOIN nd),
        |ranked AS (SELECT doc_id, word, score,
        |                  row_number() OVER (PARTITION BY doc_id
        |                                     ORDER BY score DESC, word) AS rnk
        |           FROM sc)
        |SELECT doc_id, rnk, word, round(score, 6) AS score FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "llm_multimodal_join" ->
      """SELECT label, count(*) AS n, round(avg(n_chars), 6) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY label ORDER BY label""".stripMargin,
    "llm_semantic_topk_text" ->
      s"""WITH vx AS (SELECT * FROM $VX t),
        |pairs AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         list_dot_product(p.v, c.v)
        |           / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM vx p JOIN vx c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT probe_id, cand_id, sim,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rnk
        |  FROM pairs)
        |SELECT probe_id, rnk, cand_id, round(sim, 6) AS sim, text AS neighbor_text
        |FROM ranked JOIN documents ON cand_id = doc_id
        |WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,
    "llm_bm25" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |base AS (SELECT doc_id, len(words) AS dl,
        |  len(list_filter(words, x -> x = 'spark')) AS tf0,
        |  len(list_filter(words, x -> x = 'query')) AS tf1,
        |  len(list_filter(words, x -> x = 'merge')) AS tf2
        |  FROM w),
        |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_len,
        |  sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |  sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |  sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM base),
        |sc AS (SELECT doc_id,
        |  round(
        |    ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2)
        |      / (tf0 + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_len AS DOUBLE) / n_docs)))
        |  + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2)
        |      / (tf1 + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_len AS DOUBLE) / n_docs)))
        |  + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2)
        |      / (tf2 + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_len AS DOUBLE) / n_docs))), 6)
        |  AS score
        |  FROM base CROSS JOIN st)
        |SELECT doc_id, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "llm_hybrid_rrf" ->
      """WITH vx AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |            FROM embeddings),
        |pairs AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         list_dot_product(p.v, c.v)
        |           / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
        |  FROM vx p JOIN vx c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
        |sem AS (
        |  SELECT probe_id, cand_id,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS sem_rnk
        |  FROM pairs QUALIFY sem_rnk <= 20),
        |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |       FROM words CROSS JOIN (SELECT unnest(generate_series(1, 1000)) AS i) s
        |       WHERE i <= len(w) - 2),
        |n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS probe_id, b.doc_id AS cand_id, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |            AND a.doc_id < 10 AND b.doc_id <> a.doc_id
        |          GROUP BY 1, 2),
        |lex AS (
        |  SELECT probe_id, cand_id,
        |         row_number() OVER (PARTITION BY probe_id ORDER BY jac DESC, cand_id) AS lex_rnk
        |  FROM (SELECT probe_id, cand_id,
        |          CAST(inter AS DOUBLE) / (np.n_sh + nc.n_sh - inter) AS jac
        |        FROM inter JOIN n np ON np.doc_id = probe_id
        |                   JOIN n nc ON nc.doc_id = cand_id) j
        |  QUALIFY lex_rnk <= 20),
        |fused AS (
        |  SELECT coalesce(s.probe_id, l.probe_id) AS probe_id,
        |         coalesce(s.cand_id, l.cand_id) AS cand_id,
        |         coalesce(1.0 / (60 + s.sem_rnk), 0)
        |           + coalesce(1.0 / (60 + l.lex_rnk), 0) AS rrf
        |  FROM sem s FULL OUTER JOIN lex l
        |    ON s.probe_id = l.probe_id AND s.cand_id = l.cand_id)
        |SELECT probe_id,
        |       row_number() OVER (PARTITION BY probe_id ORDER BY rrf DESC, cand_id) AS rnk,
        |       cand_id, round(rrf, 6) AS rrf
        |FROM fused
        |QUALIFY rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin,
    "llm_containment" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |-- 1000 comfortably exceeds the fixture max of 99 words/doc
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |       FROM words CROSS JOIN (SELECT unnest(generate_series(1, 1000)) AS i) s
        |       WHERE i <= len(w) - 2),
        |n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |dir AS (SELECT doc1 AS src, doc2 AS dst, inter FROM inter
        |        UNION ALL SELECT doc2, doc1, inter FROM inter)
        |SELECT src, dst, round(CAST(inter AS DOUBLE) / n_sh, 6) AS containment
        |FROM dir JOIN n ON src = n.doc_id
        |WHERE CAST(inter AS DOUBLE) / n_sh >= 0.5
        |ORDER BY src, dst""".stripMargin
  )
}
