package ptx.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Distinct-intersection cardinality of two SORTED long arrays.
  *
  * `size(array_intersect(a, b))` materializes the intersection as a new
  * array through a hash set per row; for the dedup verify step only the
  * CARDINALITY is needed and both inputs are already sorted
  * (`sort_array(collect_list(...))`), so a single fused merge pass — no
  * allocation, no hashing — produces the same number. Same distinct
  * semantics as `array_intersect`: duplicate values count once (the merge
  * skips runs of equal values).
  *
  * Scale note: per-row scalar kernel inside whole-stage codegen,
  * embarrassingly parallel like CosineSim.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be sorted ArrayType(LongType); call sites are
  // library-internal (ExpectsInputTypes is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    SortedIntersectCount.count(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val cls = SortedIntersectCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.count($l.toLongArray(), $r.toLongArray());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Sorted-merge distinct-intersection count; shared by interpreted and
    * codegen paths. Inputs MUST be ascending-sorted (duplicates allowed —
    * a matched value counts once, as in `array_intersect`). */
  def count(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var c = 0L
    val n = a.length; val m = b.length
    while (i < n && j < m) {
      val x = a(i); val y = b(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        while (i < n && a(i) == x) i += 1
        while (j < m && b(j) == x) j += 1
      }
    }
    c
  }
}
