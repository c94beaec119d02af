package ptx.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder prompt: "salting for skew").
  *
  * AQE's skew-join split handles most runtime skew; salting is the library
  * answer for *aggregation* hot keys, where a single grouping key (a viral
  * document, a null-ish default id) would funnel its entire partition
  * through one reducer.
  */
object Skew {

  /** Two-phase salted aggregation: group by (key, salt ∈ [0, buckets)) so a
    * hot key's rows spread over `buckets` reducers, then re-aggregate the
    * partials by key. `partial` must be decomposable (sum/count/min/max and
    * their compositions); the caller supplies both phases.
    *
    * Example — skew-safe count+sum of value per user:
    * {{{
    * saltedAgg(events, col("user_id"), 16)(
    *   partial = df => df.agg(count(lit(1)).as("n"), sum("value").as("s")),
    *   merge   = df => df.agg(sum("n").as("n"), sum("s").as("s")))
    * }}}
    *
    * Scale note: the salt is `pmod(monotonically_increasing_id(), buckets)`
    * — round-robin per row, so even MILLIONS OF IDENTICAL ROWS under one
    * hot key spread evenly (a content hash would send them all to one
    * bucket). Deterministic for a fixed partition layout; no rand().
    *
    * INVARIANT (SURVEY §2.1(7) boundary): `monotonically_increasing_id` is
    * banned from declared query OUTPUT because its values depend on the
    * partition layout. Its use here is legitimate only because the salt is
    * aggregated away — `__salt` and `__key` are internals and must never
    * escape into the returned schema (enforced below; a caller-supplied
    * `partial` that projects them is a bug).
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partials = partial(salted.groupBy(key.as("__key"), col("__salt")))
    val out = merge(partials.groupBy(col("__key"))).withColumnRenamed("__key", "key")
    require(!out.columns.exists(c => c == "__salt" || c == "__key"),
      s"saltedAgg internals escaped into the output schema " +
        s"(${out.columns.mkString(", ")}): the partition-layout-dependent " +
        s"salt must be aggregated away, never projected")
    // name check alone misses an ALIASED projection (max(__salt) AS x);
    // the merge-level Aggregate — the topmost one — may reference __salt
    // through no expression at all, aliased or not
    val topAgg = out.queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    topAgg.foreach { a =>
      val refs = a.aggregateExpressions.flatMap(_.references).map(_.name)
      require(!refs.contains("__salt"),
        "saltedAgg: the merge phase references __salt (possibly aliased) " +
          "— the partition-layout-dependent salt must not reach the output")
    }
    out
  }

  /** Salted shuffle join for a skewed big side: salt the big side's rows
    * into `buckets` sub-keys and replicate the small side once per salt, so
    * one hot hash bucket becomes `buckets` even ones. Row multiplicity is
    * unchanged — each big row matches exactly its own salt's replica.
    *
    * `forceShuffle` pins a shuffled join (SHUFFLE_HASH hint on the
    * replicated side): on a small test dim JoinSelection would broadcast —
    * correct, but then nothing shuffles and the salt never reaches a
    * partitioner, so the plan under test wouldn't be the plan this utility
    * exists for (a dim too big to broadcast against a skewed fact side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, buckets: Int,
                 forceShuffle: Boolean = false): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val salts = small.sparkSession.range(buckets.toLong)
      .select(col("id").cast("int").as("__salt"))
    val replicated = small.crossJoin(salts)
    val replicatedSmall = if (forceShuffle) replicated.hint("shuffle_hash") else replicated
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("__salt") === replicatedSmall("__salt"))
      .drop(saltedBig("__salt")).drop(replicatedSmall("__salt"))
  }
}
