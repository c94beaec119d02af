package ptx.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: generate the SCALE.md "10× probe" corpus for the document and
  * embedding tables — a deterministic 10× replication of a fixture dir with
  * per-replica perturbed texts (so replicas are near-dups, not exact dups)
  * and key-shifted ids (so id uniqueness holds). Earlier probes built this
  * ad hoc; this pins the recipe so the numbers in docs/SCALE.md are
  * reproducible:
  *   sbt "runMain ptx.tools.ProbeData /root/testdata/sf0.1 /tmp/probe10x"
  *   sbt "runMain ptx.tools.Explain /tmp/probe10x --time <query> ..."
  */
object ProbeData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val reps = spark.range(10).select(col("id").as("r"))

    // documents: replica 0 is the original; replicas 1..9 append a
    // replica-tag word so they are NEAR-dups of it (shared grams/chunks,
    // different fingerprints). n_chars is recomputed to keep the fixture
    // contract n_chars = length(text).
    val docs = ptx.Tables.documents(spark, src)
      .crossJoin(reps)
      .select(
        (col("doc_id") + col("r") * 10000000L).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r"))).as("text"),
        col("lang"),
        col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: key-shifted replicas with a small deterministic
    // per-replica component shift (replicas cluster near the original —
    // the realistic shape for a re-crawled/near-duplicate corpus).
    val emb = ptx.Tables.embeddings(spark, src)
      .crossJoin(reps)
      .select(
        (col("vec_id") + col("r") * 10000000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x + r * 0.001 as float))")
          .as("embedding"),
        col("label"))
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: key-shifted replicas — 10× rows AND 10× the user domain
    // (user_id shifts per replica), event times unchanged so window/
    // session group counts scale with users, matching the original
    // probe's "1M events with 10× the users" construction.
    val ev = ptx.Tables.events(spark, src)
      .crossJoin(reps)
      .select(
        (col("event_id") + col("r") * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("r") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    ev.write.mode("overwrite").parquet(s"$out/events.parquet")

    println(s"wrote 10x documents+embeddings+events under $out")
    spark.stop()
  }
}
