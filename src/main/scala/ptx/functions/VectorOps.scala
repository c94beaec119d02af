package ptx.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over two float32 vectors, computed in double.
  *
  * The HOF formulation (`aggregate(zip_with(...))`) evaluates three
  * non-codegen lambda chains per row pair (measured 15 s for 100×2000 pairs,
  * BASELINE.md); this expression is a single codegen'd loop — the SURVEY §4
  * perf lever. Accumulation is strictly sequential (index 0..n-1) with each
  * element upcast float→double, which is bit-identical to the DuckDB oracle's
  * `list_dot_product(list_transform(...))` fold, so correctness parity is
  * unchanged.
  *
  * Scale note (100 TB): scoring is embarrassingly parallel — no state, no
  * shuffle; one fused whole-stage-codegen loop per (probe, candidate) pair.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be ArrayType(FloatType); call sites are library-internal
  // (ExpectsInputTypes is private[sql], so no declarative check here)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toFloatArray()
    val b = r.asInstanceOf[ArrayData].toFloatArray()
    CosineSim.cosine(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val cls = CosineSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.cosine($l.toFloatArray(), $r.toFloatArray());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Sequential-fold cosine; shared by interpreted and codegen paths.
    * Dimensions must agree — a mismatch is a schema/data bug (e.g. a
    * 32-dim vector among 64-dim) and silently truncating would produce
    * plausible-but-wrong rankings, so fail loudly instead (ADVICE r1;
    * ExpectsInputTypes is private[sql], so the kernel enforces it).
    */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"cosine_sim: vector length mismatch (${a.length} vs ${b.length})")
    val n = a.length
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Nearest-cell argmax over a centroid table: `nearest_cell(embedding,
  * cents)` where `cents` is `array<struct<label int, centroid
  * array<float>>>` — returns the label with the highest cosine, lower
  * label on ties. This is the codegen'd form of the HOF the assignment
  * primitive used through r16's first half
  * (`array_max(transform(cents, c -> struct(cosine_sim(...), -label)))`):
  * Spark evaluates HOF lambdas interpreted per element, so the full-corpus
  * assignment pass paid ~1µs of lambda machinery per (vector, cell) on
  * top of the 64-dim cosine — this expression is one fused loop sharing
  * [[CosineSim]]'s exact accumulation order (same s per cell, same
  * (s, label) total order), so assignments are BIT-IDENTICAL to the HOF's
  * and every downstream equality pin holds unchanged. */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(l: Any, r: Any): Any =
    NearestCell.nearest(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val cls = NearestCell.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.nearest($l, $r);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCell {
  /** Shared interpreted/codegen body. The per-cell score is computed by
    * the SAME sequential fold as [[CosineSim.cosine]] (float→double
    * upcast, index 0..n-1, dot/na/nb updated in that order), reading the
    * centroid floats straight off ArrayData — no per-cell array copy.
    *
    * Score comparison uses Spark's DOUBLE TOTAL ORDER (the
    * `SQLOrderingUtil.compareDoubles` rule: `==` first so -0.0 equals
    * 0.0, otherwise `java.lang.Double.compare` so NaN sorts GREATEST) —
    * r17, ADVICE r16 medium: the plain `s > bestS` this replaced is
    * false for NaN cosines (a zero-norm embedding or centroid), so the
    * kernel silently skipped cells the `array_max(transform(...))` HOF
    * it must stay bit-identical to would have picked, and an all-NaN
    * row escaped with the Int.MaxValue initializer as a "label". The
    * first cell now always seeds (bestS, bestL), so no sentinel exists
    * to escape; NaN-vs-NaN compares equal and ties break to the lower
    * label, exactly the HOF's struct(sim, -label) max. */
  def nearest(e: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    require(k > 0, "nearest_cell: empty centroid table")
    val a = e.toFloatArray()
    var bestS = 0.0
    var bestL = 0
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val l = row.getInt(0)
      val b = row.getArray(1)
      val n = a.length
      require(b.numElements() == n,
        s"nearest_cell: vector length mismatch ($n vs ${b.numElements()})")
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val s = dot / (math.sqrt(na) * math.sqrt(nb))
      val cmp =
        if (c == 0) 1 // first cell seeds unconditionally
        else if (s == bestS) 0
        else java.lang.Double.compare(s, bestS)
      if (cmp > 0 || (cmp == 0 && l < bestL)) { bestS = s; bestL = l }
      c += 1
    }
    bestL
  }
}

object VectorOps {
  /** Shared builders — also used by the [[ptx.PtxExtensions]] injection. */
  private[ptx] def buildCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
    CosineSim(exprs(0), exprs(1))
  }
  private[ptx] def buildSortedIntersect(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"sorted_intersect_count requires exactly 2 arguments, got ${exprs.length}")
    SortedIntersectCount(exprs(0), exprs(1))
  }
  private[ptx] def buildNearestCell(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"nearest_cell requires exactly 2 arguments, got ${exprs.length}")
    NearestCell(exprs(0), exprs(1))
  }

  /** Makes the vector kernels usable from `expr(...)` / `spark.sql(...)`
    * in this session. Guarded like TextGrams.register (ADVICE r10): no-op
    * when the names already resolve to these kernels, loud failure on a
    * foreign binding — see [[Registration.ensure]]. */
  def register(spark: SparkSession): Unit = {
    Registration.ensure(spark, "cosine_sim", 2, buildCosine)
    Registration.ensure(spark, "sorted_intersect_count", 2, buildSortedIntersect)
    Registration.ensure(spark, "nearest_cell", 2, buildNearestCell)
  }
}
