package ptx

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Entry-point B (SURVEY §3.2): the SQL string path must produce the same
  * results as the DataFrame path, and PtxExtensions must expose the custom
  * function to pure-SQL sessions.
  */
class SqlEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spark.sql pricing summary equals the DataFrame formulation") {
    Tables.lineitem(spark, TestSpark.SF).createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem_v
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect().map(_.toString).toSeq
    val df = QueryRegistry.all("agg_pricing_summary")(spark, TestSpark.SF)
      .collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("spark.sql q13 distribution equals the DataFrame formulation (r5)") {
    Tables.customer(spark, TestSpark.SF).createOrReplaceTempView("customer_v")
    Tables.orders(spark, TestSpark.SF).createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer_v LEFT JOIN orders_v
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
      .collect().map(_.toString).toSeq
    val df = QueryRegistry.all("q13_cust_distribution")(spark, TestSpark.SF)
      .collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("PtxExtensions injects cosine_sim into a fresh SQL-only session") {
    val old = spark // ensure the shared context exists
    // getOrCreate returns the existing default session (without extensions),
    // so detach it first; the new session reuses the same SparkContext.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new PtxExtensions)
        .getOrCreate()
      val v = s2.sql(
        "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(2 AS FLOAT), CAST(4 AS FLOAT)))").collect()(0).getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
