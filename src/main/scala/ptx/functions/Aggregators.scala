package ptx.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Library UDF/UDAF surface (SURVEY §2 G8 note): the declared queries use
  * only Catalyst built-ins (codegen + pushdown preserved), but the engine
  * ships one typed Aggregator for users who need black-box aggregation.
  *
  * Scale note: Aggregator is mergeable (partial aggregation map-side), so it
  * shuffles one (sum, weight) pair per group per partition — the same
  * two-phase shape as built-in aggregates.
  */
object Aggregators {

  /** Weighted mean: value-weight pairs → Σwx / Σw (NaN on zero total
    * weight — the scalaDouble output encoder cannot carry null). */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped Column form usable in DataFrame aggs:
    * `df.agg(weighted_mean(col("x"), col("w")))`. */
  def weighted_mean(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)

  /** Bounded top-k by (score desc, id asc) as a mergeable aggregate.
    *
    * Scale note: this is the partial-aggregation form of per-group top-k —
    * each map task keeps at most k entries per group, so the shuffle carries
    * k rows per group per partition instead of every (group, candidate)
    * pair, unlike the row_number()-window formulation which must co-locate
    * ALL pairs of a group before ranking.
    *
    * The buffer is a sorted list (k is small); reduce inserts in order and
    * trims, merge is a bounded merge of two sorted lists — deterministic for
    * distinct (score, id) pairs regardless of arrival order.
    */
  class TopK(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], List[(Double, Long)]] {
    // java.lang.Double.compare, not primitive >, so NaN orders as GREATEST —
    // matching SQL ORDER BY score DESC (both Spark and DuckDB sort NaN
    // first descending); primitive > would silently rank NaN last.
    private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    override def zero: List[(Double, Long)] = Nil
    override def reduce(buf: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] = {
      val (pre, post) = buf.span(better(_, a))
      if (pre.length >= k) buf else (pre ::: a :: post).take(k)
    }
    override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] = {
      val out = List.newBuilder[(Double, Long)]
      var (l, r) = (b1, b2); var n = 0
      while (n < k && (l.nonEmpty || r.nonEmpty)) {
        if (r.isEmpty || (l.nonEmpty && better(l.head, r.head))) { out += l.head; l = l.tail }
        else { out += r.head; r = r.tail }
        n += 1
      }
      out.result()
    }
    override def finish(r: List[(Double, Long)]): List[(Double, Long)] = r
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  }

  /** `top_k(score, id, k)` → array<struct<_1: score, _2: id>> sorted by
    * (score desc, id asc), at most k entries. */
  def top_k(score: Column, id: Column, k: Int): Column =
    udaf(new TopK(k)).apply(score, id)

  /** 64-bit SimHash signature as ONE mergeable aggregate over token hashes:
    * per-bit ±1 votes in a 64-long buffer, sign-threshold on finish.
    *
    * Replaces the 64-separate-`sum(when(...))` formulation — semantically
    * identical (vote `+1` when bit i of the hash is set, else `-1`; bit i of
    * the signature set when the vote total is positive), but the generated
    * aggregate is a single tight loop instead of 64 codegen'd agg
    * expressions (measured: ~2× on both first-plan and steady-state time).
    *
    * Scale note: mergeable → map-side partials; the shuffle carries one
    * 64-long buffer per doc per partition, same two-phase shape as built-in
    * aggregates.
    */
  object SimHash extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](64)
    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < 64) { b(i) += ((h >>> i) & 1L) * 2L - 1L; i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Long = {
      var sig = 0L
      var i = 0
      while (i < 64) { if (b(i) > 0) sig |= 1L << i; i += 1 }
      sig
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** `simhash(tokenHash)` → 64-bit signature as a LongType column. */
  def simhash(tokenHash: Column): Column = udaf(SimHash).apply(tokenHash)
}
