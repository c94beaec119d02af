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
      (children: Seq[Expression]) => ptx.functions.VectorOps.buildCosine(children)))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[ptx.functions.SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) =>
        ptx.functions.VectorOps.buildSortedIntersect(children)))
    ext.injectFunction((
      new FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[ptx.functions.NearestCell].getName,
        "nearest_cell"),
      (children: Seq[Expression]) =>
        ptx.functions.VectorOps.buildNearestCell(children)))
    // gram_hashes joined the injected set in r11 (VERDICT r10 #6): SQL
    // users of an extensions-built session get the span/shingle kernel
    // without any operator call first; the operators' TextGrams.register
    // then recognizes the injected binding and no-ops.
    ext.injectFunction((
      new FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[ptx.functions.GramHashes].getName, "gram_hashes"),
      (children: Seq[Expression]) => ptx.functions.TextGrams.build(children)))
    ext.injectFunction((
      new FunctionIdentifier("byte_entropy_e6"),
      new ExpressionInfo(classOf[ptx.functions.ByteEntropy].getName,
        "byte_entropy_e6"),
      (children: Seq[Expression]) => ptx.functions.ByteEntropyFn.build(children)))
    // the Bloom pair (r11): Spark ships both halves but keeps them
    // optimizer-internal (neither resolves from user SQL); injecting them
    // gives pure-SQL sessions build + probe (ptx.functions.Blooms).
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) => ptx.functions.Blooms.buildMightContain(children)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => ptx.functions.Blooms.buildAgg(children)))
  }
}
