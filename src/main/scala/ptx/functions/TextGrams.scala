package ptx.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Word-5-gram hash stream over a token array: one 64-bit key per gram
  * occurrence, in position order — `posexplode(gram_hashes(w))` is the
  * (pos, h) gram-occurrence stream of the Lee et al. span-dedup family.
  *
  * Why an expression and not `transform(sequence(...), i ->
  * xxhash64(array_join(slice(w, i, 5), ' ')))`: higher-order functions
  * evaluate INTERPRETED (no codegen), and that form allocates a sliced
  * array plus a joined gram string per occurrence — profiled as the
  * dominant CPU of both span queries. Replacing only the string-join with
  * hash-combines INSIDE the lambda measured 3× WORSE (interpreted
  * element_at + boxing per gram, r10); the fix is to leave the HOF world
  * entirely. This kernel hashes each token's bytes ONCE (XXH64, seed 42 —
  * the builtin xxhash64's seed) and then chains the five token hashes
  * through XXH64's long-merge per gram — the same construction as the
  * variadic builtin `xxhash64(h1, ..., h5)`, one allocation for the whole
  * row's output. 5.9 s → ~3 s detector / 5.5 s → ~3 s rewriter at sf0.1
  * local[4].
  *
  * Key semantics vs the string form: both are engine-internal 64-bit gram
  * keys with the same ≈2e-11 pair-collision caveat (the DuckDB oracle
  * groups gram STRINGS); fixed-width token hashes additionally remove the
  * join-separator ambiguity. Position order is preserved by the chain
  * order. Tokens are hashed by raw bytes; a null token (impossible from
  * `split`, the only call-site producer) hashes as a fixed sentinel (the
  * seed), which deliberately DIFFERS from the variadic builtin's
  * null-skip — the skip would make "a NULL b" and "a b" grams collide,
  * the sentinel keeps them distinct. The FunctionsSpec twin test pins
  * the null-free construction only.
  *
  * Scale note (100 TB): embarrassingly parallel scan-local work, one
  * fused loop per row inside whole-stage codegen — the gram stream stays
  * corpus-token-LINEAR and the shuffle still moves 8-byte keys.
  */
case class GramHashes(child: Expression, width: Int = 5) extends UnaryExpression {
  require(width >= 1, s"gram width must be >= 1, got $width")
  // registered into arbitrary spark.sql via TextGrams.register /
  // PtxExtensions, so misuse must fail at ANALYSIS time with a clear
  // message, not as a runtime ClassCastException from nullSafeEval
  // (ADVICE r10). ExpectsInputTypes is private[sql]; overriding
  // checkInputDataTypes directly gives the same analysis-time gate.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires an array<string> argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(tokens: Any): Any =
    GramHashes.hashes(tokens.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = GramHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashes($t, $width);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  private val Seed = 42L   // the builtin xxhash64's seed

  /** Shared kernel (interpreted + codegen paths): per-token byte hash,
    * then a chained long-hash per width-`n` gram window. Returns the
    * empty array for rows shorter than `n` tokens (posexplode then
    * yields no rows, like the old CASE WHEN ... ELSE array() END). */
  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) =
        if (tokens.isNullAt(i)) Seed
        else XXH64.hashUTF8String(tokens.getUTF8String(i), Seed)
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    var g = 0
    while (g <= len - n) {
      var h = Seed
      var k = 0
      while (k < n) {
        h = XXH64.hashLong(th(g + k), h)
        k += 1
      }
      out(g) = h
      g += 1
    }
    new GenericArrayData(out)
  }
}

object TextGrams {
  /** Shared builder: `gram_hashes(w)` for the span family's 5-grams,
    * `gram_hashes(w, n)` for any other width (the dedup family's 3-word
    * shingles). The width must be a literal. Used by both the temp-function
    * registration below and the [[ptx.PtxExtensions]] injection. */
  private[ptx] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 2,
      s"gram_hashes requires 1 or 2 arguments, got ${exprs.length}")
    val width = if (exprs.length == 1) 5 else exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"gram_hashes width must be an integer literal, got $other")
    }
    GramHashes(exprs(0), width)
  }

  /** Makes gram_hashes usable from `expr(...)` / `spark.sql(...)` in this
    * session. Guarded (ADVICE r10): a no-op when the name already resolves
    * to this kernel (prior call, or a PtxExtensions-built session); fails
    * loudly if the session bound the name to something else — see
    * [[Registration.ensure]]. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "gram_hashes", 1, build,
      // also probe the 2-arg (explicit width) form: a foreign builder
      // that drops or rebinds the width argument must be rejected too
      extraProbes = Seq(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(null),
        org.apache.spark.sql.catalyst.expressions.Literal(3))))
}
