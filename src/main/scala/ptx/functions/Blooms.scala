package ptx.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's built-in Bloom-filter pair.
  *
  * Spark ships both halves — `BloomFilterAggregate` (the mergeable
  * sketch-building aggregate behind AQE runtime filters) and its probe
  * twin `BloomFilterMightContain` — but keeps them optimizer-internal:
  * neither resolves from the user SQL search path. The engine's
  * Bloom-bounded operators (`llm_split_contamination_bloom`) and SQL users
  * of an extensions-built session get the pair here under the same
  * `bloom_filter_agg` / `might_contain` names the Spark codebase uses.
  *
  * Semantics (one-sided error): `might_contain(bf, v)` never returns false
  * for an inserted value; it returns true for a non-member with probability
  * ≈ fpp(numBits, distinct insertions). The filter side must be foldable
  * (a collected sketch literal — a model parameter, like kmeans centroids)
  * or a scalar subquery; the value side is the engine's 64-bit key grain
  * (GramHashes / xxhash64 outputs), so probes ride whole-stage codegen.
  *
  * Scale (100 TB): the build side is the point — bloom_filter_agg's
  * partial buffers merge by bitwise OR, so constructing the sketch over N
  * rows shuffles only (#partitions × numBits/8) bytes, CONSTANT in N,
  * where a distinct-then-join formulation shuffles every distinct key.
  * numBits must be sized to the distinct-key budget (fpp ≈
  * exp(−(bits/item)·ln²2)); past broadcastable sketch sizes the standard
  * continuation is range-sharding the filter by key prefix.
  */
object Blooms {
  private[ptx] def buildMightContain(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"might_contain requires exactly 2 arguments, got ${exprs.length}")
    BloomFilterMightContain(exprs(0), exprs(1))
  }

  /** `bloom_filter_agg(value, estimatedNumItems, numBits)`. Spark holds
    * this name in its INTERNAL registry only (resolvable by optimizer
    * rules, not from the user search path — verified: UNRESOLVED_ROUTINE
    * from spark.sql), so the session registration below is what makes it
    * callable at all. The analyzer wraps the returned AggregateFunction
    * into an AggregateExpression during resolution. */
  private[ptx] def buildAgg(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"bloom_filter_agg requires exactly 3 arguments, got ${exprs.length}")
    new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
  }

  /** Makes `might_contain` + `bloom_filter_agg` usable from `expr(...)` /
    * `spark.sql(...)` in this session. Guarded like the other kernels
    * ([[Registration.ensure]]): no-op when the name already resolves to
    * this expression (including a [[ptx.PtxExtensions]]-built session),
    * loud failure on a foreign binding. */
  def register(spark: SparkSession): Unit = {
    Registration.ensure(spark, "might_contain", 2, buildMightContain)
    Registration.ensure(spark, "bloom_filter_agg", 3, buildAgg)
  }
}
