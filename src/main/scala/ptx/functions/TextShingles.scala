package ptx.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared 3-word shingle construction for the dedup family — ONE definition
  * so the exact (llm_dedup_near) and LSH (llm_dedup_minhash_lsh) paths can
  * never diverge on what counts as a shingle.
  */
object TextShingles {
  /** SQL fragment producing the shingle array from a `w` words column.
    * Documents with fewer than 3 words yield an empty array (matching the
    * oracle's `WHERE i <= len(w) - 2` guard) — without the CASE,
    * `sequence(1, size-2)` would DESCEND for short docs and the transform
    * would index out of bounds (a hard error under Spark 4 ANSI mode).
    */
  val shingleExpr: String =
    """CASE WHEN size(w) >= 3 THEN
      |  transform(sequence(1, size(w) - 2),
      |    i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
      |ELSE array() END""".stripMargin

  /** distinct (doc_id, shingle) pairs for a documents frame. */
  def shingles(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
      .distinct()
}
