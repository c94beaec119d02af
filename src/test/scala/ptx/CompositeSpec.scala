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

  test("q3: at most 10 rows, sorted by revenue desc, only pre-cutoff orders") {
    val rows = q("q3_shipping_priority").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // o_orderdate surfaces as TIMESTAMP_NTZ → java.time.LocalDateTime
    val cutoff = java.time.LocalDateTime.parse("1998-06-01T00:00:00")
    assert(rows.forall(_.getAs[java.time.LocalDateTime](2).isBefore(cutoff)))
  }

  test("q4: slow-fulfilment orders are a subset of the quarter's orders") {
    val counted = q("q4_priority_count")
      .agg(sum(col("order_count"))).collect()(0).getLong(0)
    val quarter = Tables.orders(spark, TestSpark.SF)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-04-01"))).count()
    assert(counted > 0 && counted <= quarter,
      s"q4 counted $counted of $quarter quarter orders")
  }

  test("q7: both directions appear and nations are never equal") {
    val rows = q("q7_volume_shipping").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18")))
    assert(rows.forall(r => Set(1996, 1997).contains(r.getInt(2))))
  }

  test("q8: share is the rounded ratio of its own reported operands") {
    val rows = q("q8_market_share").collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(1)).foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat <= tot)
      assert(share == BigDecimal(nat / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q10: exactly 20 rows, revenue descending, custkey tie-break") {
    val rows = q("q10_returned_items").collect()
    assert(rows.length == 20)
    val keys = rows.map(r => (-r.getDouble(2), r.getLong(0)))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
  }

  test("q15: every reported supplier hits the quarter's max revenue") {
    try {
      val rows = q("q15_top_supplier").collect()
      assert(rows.nonEmpty)
      val revs = rows.map(_.getDouble(2)).distinct
      assert(revs.length == 1, s"q15 returned non-max rows: ${revs.toSeq}")
    } finally Caching.releaseAll() // q15 pins its aggregate apex
  }

  test("q16: excluded brand absent, sizes within the declared set") {
    val rows = q("q16_supplier_variety").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) != "Brand#5"))
    assert(rows.forall(r => Set(1, 5, 9, 13, 17, 21).contains(r.getInt(2))))
    // supplier_cnt is bounded by the supplier table size
    val nSup = Tables.supplier(spark, TestSpark.SF).count()
    assert(rows.forall(_.getLong(3) <= nSup))
  }

  test("q2: one winner per part, and it truly is that part's cheapest shipment") {
    val rows = q("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    val parts = rows.map(_.getLong(0))
    assert(parts.distinct.length == parts.length, "a part has two winners")
    // the reported price is the part's global minimum half-up e6 unit
    // price (the query switched from round(double) to exact fixed point
    // in r7 — same integer formulation here, independently aggregated)
    val mins = Tables.lineitem(spark, TestSpark.SF)
      .join(Tables.part(spark, TestSpark.SF).filter(col("p_size") === 9),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(min(expr("(2 * cast(round(l_extendedprice * 100) as bigint) * 10000" +
        " + cast(l_quantity as bigint))" +
        " div (2 * cast(l_quantity as bigint))")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(3) == mins(r.getLong(0)),
        s"part ${r.getLong(0)}: reported ${r.getLong(3)} vs min ${mins(r.getLong(0))}")
    }
  }

  test("q9: grouped by (nation, year) uniquely, years within order range") {
    val rows = q("q9_profit_proxy").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getInt(1)))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall(r => r.getInt(1) >= 1995 && r.getInt(1) <= 2001))
  }

  test("r5 composite plans: no nested-loop joins, semi stays semi, limits fold into TakeOrdered") {
    def plan(name: String): String = {
      val df = QueryRegistry.all(name)(spark, TestSpark.SF)
      df.collect() // let AQE finalize so the asserted plan is the executed one
      val p = df.queryExecution.executedPlan.toString
      Caching.releaseAll()
      p
    }
    val all = Seq("q3_shipping_priority", "q4_priority_count", "q7_volume_shipping",
      "q8_market_share", "q9_profit_proxy", "q10_returned_items",
      "q15_top_supplier", "q16_supplier_variety")
    val plans = all.map(n => n -> plan(n)).toMap
    // a residual-predicate EXISTS must never degrade to a nested loop
    plans.foreach { case (n, p) =>
      assert(!p.contains("BroadcastNestedLoop"), s"$n plans a BNLJ:\n$p")
    }
    assert(plans("q4_priority_count").contains("LeftSemi"),
      "q4's EXISTS should plan as a semi join")
    // filtered dims must broadcast into the fact scans
    Seq("q7_volume_shipping", "q8_market_share", "q9_profit_proxy").foreach { n =>
      assert(plans(n).contains("BroadcastHashJoin"), s"$n lost its broadcast dims")
    }
    // top-k with limit must fold into TakeOrderedAndProject, not a global sort
    Seq("q3_shipping_priority", "q10_returned_items").foreach { n =>
      assert(plans(n).contains("TakeOrderedAndProject"), s"$n sorts globally")
    }
  }
}
