package ptx.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** The multi-table sign-LSH signature `lsh_sig(embedding, L, bits)` —
  * `array<int>` of length L, table t's code packing bit b := 1 iff
  * `cosine_sim(embedding, plane(t,b)) > 0` over the seed-7 random planes.
  *
  * This is the r18 OPTIMIZATION form of the expression forest the LSH tier
  * built inline: L×bits separate `IF(cosine_sim(embedding, <64-float array
  * literal>) > 0, 1<<b, 0)` expressions summed per table. That forest made
  * CATALYST the bottleneck, not the data — at L=16×6 the analyzer/optimizer
  * walked 96 subtrees each dragging a 64-element literal array, measured
  * 1.76 s of driver-side plan compilation PER INVOCATION of `llm_ann_lsh`
  * at sf0.1 (vs 0.75 s of total executor task time; guide §1.1 —
  * first-principles says signing 2k×96 planes is microseconds of FLOPs).
  * One expression with the planes held as a memoized constant collapses
  * plan size and evaluates all L codes in a single fused loop per row
  * (one `toFloatArray` instead of 96).
  *
  * BIT-IDENTITY with the old forest (pinned by LlmOpsSpec): the planes are
  * the same seed-7 `nextFloat()*2f-1f` stream in the same tabulation order
  * (the old path rendered each float through `toString` → SQL `CAST(s AS
  * FLOAT)`, which round-trips every Float exactly, so literal == memoized
  * value), and the sign test `cosine_sim > 0` reduces to `dot > 0`:
  * norms are positive (random planes are never the zero vector), a
  * zero-norm embedding yields cosine NaN and dot 0 — both fail `> 0` — and
  * sign(dot/(√na·√nb)) = sign(dot) otherwise. The norm accumulators the
  * cosine fold paid per plane are skipped entirely (3× fewer FLOPs).
  */
case class LshSig(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {
  require(tables >= 1 && bits >= 1 && bits <= 30,
    s"lsh_sig: need 1 <= tables and 1 <= bits <= 30, got L=$tables bits=$bits")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "lsh_sig"

  override def nullSafeEval(e: Any): Any =
    LshSig.sig(e.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val cls = LshSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.sig($e, $tables, $bits);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSig {
  // one plane table per (L, bits) ever used in a JVM (the serving default
  // plus sweep configurations) — tiny (L×bits×64 floats) and immutable
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Float]]]()

  /** Seed-7 hyperplanes, row-major (table-then-bit) — the exact draw order
    * of the old `Seq.tabulate(L, bits)(... Array.fill(64)(rnd.nextFloat()
    * * 2f - 1f))`. */
  private[ptx] def planes(tables: Int, bits: Int): Array[Array[Float]] =
    planeCache.computeIfAbsent((tables, bits), { case (l, b) =>
      val rnd = new scala.util.Random(7)
      Array.fill(l * b)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    })

  /** Shared interpreted/codegen body: all L bucket codes in one pass over
    * the embedding. Dimension mismatch fails loudly, like [[CosineSim]]. */
  def sig(e: ArrayData, tables: Int, bits: Int): ArrayData = {
    val a = e.toFloatArray()
    val ps = planes(tables, bits)
    val n = a.length
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var code = 0
      var b = 0
      while (b < bits) {
        val p = ps(t * bits + b)
        require(p.length == n,
          s"lsh_sig: vector length mismatch ($n vs ${p.length})")
        var dot = 0.0
        var i = 0
        while (i < n) { dot += a(i).toDouble * p(i).toDouble; i += 1 }
        if (dot > 0) code |= (1 << b)
        b += 1
      }
      out(t) = code
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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
  private[ptx] def buildLshSig(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"lsh_sig requires exactly 3 arguments (vec, tables, bits), got ${exprs.length}")
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(null, _) => 1 // registration probe
      case other => throw new IllegalArgumentException(
        s"lsh_sig $what must be an integer literal, got $other")
    }
    LshSig(exprs(0), intLit(exprs(1), "tables"), intLit(exprs(2), "bits"))
  }

  /** Makes the vector kernels usable from `expr(...)` / `spark.sql(...)`
    * in this session. Guarded like TextGrams.register (ADVICE r10): no-op
    * when the names already resolve to these kernels, loud failure on a
    * foreign binding — see [[Registration.ensure]]. */
  def register(spark: SparkSession): Unit = {
    Registration.ensure(spark, "cosine_sim", 2, buildCosine)
    Registration.ensure(spark, "sorted_intersect_count", 2, buildSortedIntersect)
    Registration.ensure(spark, "nearest_cell", 2, buildNearestCell)
    Registration.ensure(spark, "lsh_sig", 3, buildLshSig)
  }
}
