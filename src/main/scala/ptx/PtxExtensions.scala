package ptx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import ptx.functions.CosineSim

/** SparkSessionExtensions entry point: makes the engine's custom functions
  * available in ANY session (including pure-SQL ones) via
  *   SparkSession.builder().withExtensions(new PtxExtensions)
  * or spark.sql.extensions=ptx.PtxExtensions.
  *
  * This is the library's Catalyst injection point; planner strategies/rules
  * would be registered here too if an operator ever needs one (none does —
  * SURVEY §4: the declared surface is fully expressible with built-ins).
  */
class PtxExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_sim requires exactly 2 arguments, got ${children.length}")
        CosineSim(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[ptx.functions.SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sorted_intersect_count requires exactly 2 arguments, got ${children.length}")
        ptx.functions.SortedIntersectCount(children(0), children(1))
      }))
  }
}
