package ptx

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import ptx.functions.MediaDecode

/** G14 multimodal coverage (referenced by Multimodal.scala and SURVEY §2 G14):
  * the stubbed decoder's values are asserted end-to-end through the
  * mapPartitions path, not just at the kernel level.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("MediaDecode.features: hand-computed histogram for a known payload") {
    // bytes 0,32,64,...,224 land one in each of the 8 buckets of width 32
    val uniform = (0 until 8).map(b => (b * 32).toByte).toArray
    assert(MediaDecode.features(uniform).toSeq == Seq.fill(8)(0.125))
    // 'a' = 97 → bucket 97*8/256 = 3; all mass in bucket 3
    val aa = "aaaa".getBytes("UTF-8")
    assert(MediaDecode.features(aa).toSeq == Seq(0d, 0d, 0d, 1d, 0d, 0d, 0d, 0d))
    assert(MediaDecode.features(Array.emptyByteArray).toSeq == Seq.fill(8)(0d))
  }

  test("mm_decode_features: query output equals an in-JVM decode of the same text") {
    val rows = QueryRegistry.all("mm_decode_features")(spark, TestSpark.SF)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val texts = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == texts.keySet, "every document must be decoded")
    // same rounding as Spark's round(): BigDecimal.valueOf (Double.toString
    // form), scale 6, HALF_UP
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    texts.foreach { case (id, text) =>
      val f = MediaDecode.features(text.getBytes("UTF-8"))
      val normSq = r6(f.map(x => x * x).sum)
      val f0 = r6(f(0))
      assert(rows(id) == ((normSq, f0)), s"doc $id: got ${rows(id)}, want ($normSq, $f0)")
    }
  }

  test("mm_decode_features: decode runs in the scan stage, before any shuffle") {
    val plan = QueryRegistry.all("mm_decode_features")(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString()
    val mapIdx = plan.linesIterator.indexWhere(_.contains("MapPartitions"))
    assert(mapIdx >= 0, s"no MapPartitions in plan:\n$plan")
    // payload bytes must not cross an exchange: every Exchange sits ABOVE
    // (printed before) the MapPartitions node in the plan tree
    val exchangeBelow = plan.linesIterator.drop(mapIdx + 1).exists(_.contains("Exchange"))
    assert(!exchangeBelow, s"decode happens after a shuffle:\n$plan")
  }
}
