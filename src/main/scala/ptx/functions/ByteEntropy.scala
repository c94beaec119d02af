package ptx.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** e6-snapped Shannon entropy (nats) of a binary payload's byte
  * distribution — the payload-content health signal the multimodal family
  * lacked: a media column's entropy separates degenerate/truncated
  * payloads (runs of one byte → near 0) from plain text (~3 nats) from
  * compressed/encrypted blobs (→ ln 256 ≈ 5.545) without decoding
  * anything, so it runs BEFORE the decode stage as a cheap triage.
  *
  * Why an expression: the SQL formulation explodes one row per byte
  * (DuckDB's hex-pair trick — the oracle does exactly that), which at
  * media sizes is a 10⁶× row blow-up per payload; this kernel is one
  * fused histogram pass per row inside whole-stage codegen, payload
  * never leaves the scan.
  *
  * Determinism (the PSI e6-term lesson): each of the ≤256 byte terms
  * −p·ln p (p = c/n from exact integers) is computed as ONE pinned
  * double expression and half-up-snapped to the e6 grid, then the terms
  * are summed EXACTLY as longs in fixed byte order — no
  * accumulation-order or last-ulp drift across engines. The oracle
  * mirrors the same per-term expression and rounding.
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_entropy_e6 requires a binary argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_entropy_e6"

  override def nullSafeEval(bytes: Any): Any =
    ByteEntropy.entropyE6(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val cls = ByteEntropy.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.entropyE6($b);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteEntropy {
  /** Shared kernel (interpreted + codegen paths). Empty payload → 0. A
    * single-valued payload (c == n) contributes the exact-zero term and
    * is skipped, matching the oracle's `WHERE c < n` guard. */
  def entropyE6(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val c = new Array[Int](256)
    var i = 0
    while (i < n) { c(bytes(i) & 0xff) += 1; i += 1 }
    var sum = 0L
    var b = 0
    while (b < 256) {
      val cb = c(b)
      if (cb > 0 && cb < n) {
        // pinned parenthesization — must match the oracle SQL
        // round(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1000000, 0) exactly
        val p = cb.toDouble / n
        sum += math.round(-p * math.log(p) * 1e6)
      }
      b += 1
    }
    sum
  }
}

object ByteEntropyFn {
  private[ptx] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"byte_entropy_e6 requires 1 argument, got ${exprs.length}")
    ByteEntropy(exprs.head)
  }

  /** Guarded session registration — see [[Registration.ensure]]. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "byte_entropy_e6", 1, build)
}
