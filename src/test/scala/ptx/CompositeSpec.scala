package ptx

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** G17 composite analytics — golden anchors + invariants beyond the
  * OpsSmokeSpec determinism pass (the oracle compare is parity.py).
  */
class CompositeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def q(name: String) = QueryRegistry.all(name)(spark, TestSpark.SF)

  test("q17: golden avg_yearly at sf0.001 (DuckDB-derived)") {
    val v = q("q17_small_qty_revenue").collect()(0).getDouble(0)
    assert(v == 570702.55, s"q17 avg_yearly drifted: $v")
  }

  test("q13: distribution counts every customer exactly once") {
    val total = q("q13_cust_distribution")
      .agg(sum(col("custdist"))).collect()(0).getLong(0)
    val nCust = Tables.customer(spark, TestSpark.SF).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("q21: sole-latest shippers are a subset of per-order supplier counts") {
    // every reported supplier must ship at least one multi-supplier order;
    // numwait is bounded by that supplier's distinct multi-supplier orders
    val l = Tables.lineitem(spark, TestSpark.SF)
    val multi = l.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("ns"))
      .filter(col("ns") > 1).count()
    val waits = q("q21_late_suppliers")
      .agg(sum(col("numwait"))).collect()(0).getLong(0)
    assert(waits <= multi,
      s"q21 reports $waits sole-latest orders but only $multi multi-supplier orders exist")
  }

  test("q22: every reported nation count is positive and keys are distinct") {
    val rows = q("q22_idle_customers").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
    assert(rows.map(_.get(0)).distinct.length == rows.length)
  }

  test("q14: promo share is the rounded ratio of its own reported operands") {
    val r = q("q14_promo_share").collect()(0)
    val (promo, total, share) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo > 0 && promo < total)
    assert(share == BigDecimal(100.0 * promo / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q19: only the three declared brands appear, with positive revenue") {
    val rows = q("q19_disjunctive").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet
      .subsetOf(Set("Brand#12", "Brand#23", "Brand#3")))
    assert(rows.forall(_.getDouble(2) > 0))
  }
}
