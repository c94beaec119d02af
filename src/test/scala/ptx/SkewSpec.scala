package ptx

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import ptx.functions.Skew

/** Salting utilities: results must equal the unsalted formulations. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedAgg equals plain groupBy aggregation") {
    val e = Tables.events(spark, TestSpark.SF)
    val plain = e.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(e, col("user_id"), buckets = 8)(
        partial = g => g.agg(count(lit(1)).as("n"), sum("value").as("s")),
        merge = g => g.agg(sum("n").as("n"), round(sum("s"), 2).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedAgg never leaks __salt/__key internals into the output schema (r6)") {
    val e = Tables.events(spark, TestSpark.SF)
    val out = Skew.saltedAgg(e, col("user_id"), buckets = 8)(
      partial = g => g.agg(count(lit(1)).as("n")),
      merge = g => g.agg(sum("n").as("n")))
    // SURVEY §2.1(7): the salt derives from monotonically_increasing_id —
    // partition-layout-dependent, so it must be aggregated away, never
    // projected. The schema is the contract.
    assert(out.columns.toSeq == Seq("key", "n"))
    assert(!out.columns.exists(c => c.startsWith("__")))
    // and a merge phase that tries to project the salt is rejected loudly
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedAgg(e, col("user_id"), buckets = 8)(
        partial = g => g.agg(count(lit(1)).as("n")),
        merge = g => g.agg(sum("n").as("n"), max("__salt").as("__salt")))
    }
    assert(ex.getMessage.contains("salt"))
    // ...including under an innocent-looking ALIAS (the name check alone
    // would miss this; the plan-reference check catches it)
    val ex2 = intercept[IllegalArgumentException] {
      Skew.saltedAgg(e, col("user_id"), buckets = 8)(
        partial = g => g.agg(count(lit(1)).as("n")),
        merge = g => g.agg(sum("n").as("n"), max("__salt").as("salt_out")))
    }
    assert(ex2.getMessage.contains("salt"))
  }

  test("saltedJoin equals plain join (row multiplicity preserved)") {
    val e = Tables.events(spark, TestSpark.SF).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, TestSpark.SF)
      .select(col("user_id")).distinct()
      .withColumn("u_bucket", col("user_id") % 3)
      .withColumnRenamed("user_id", "u_id")
    val plain = e.join(dim, e("user_id") === dim("u_id"))
      .select("event_id", "u_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = Skew.saltedJoin(e, dim, "user_id", "u_id", buckets = 8)
      .select("event_id", "u_bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("loader schema assertion rejects unknown tables loudly") {
    val ex = intercept[IllegalArgumentException] {
      Tables.t(spark, TestSpark.SF, "nope")
    }
    assert(ex.getMessage.contains("unknown table"))
  }
}
