package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}

/** G17 — composite analytics: the classic TPC-H multi-operator shapes
  * (Q13/Q17/Q18/Q21/Q22) adapted to the binding columns (no partsupp,
  * no l_commitdate/l_receiptdate, no c_phone — each query notes its
  * adaptation). These exercise the *composition* patterns a warehouse
  * workload actually runs — outer-join re-aggregation, correlated-avg
  * decorrelation, having-over-join, multi-correlated exists/not-exists,
  * anti-join + scalar subquery — on top of operators that are each
  * individually covered in G3/G4/G15.
  *
  * Scale notes (100 TB):
  *  - every per-key aggregate here shuffles once on its natural key and
  *    re-aggregates a tiny frame (counts-of-counts, per-part avgs);
  *  - the correlated subqueries are expressed as join + groupBy so the
  *    plan is an explicit shuffle/broadcast choice, not an opaque rewrite
  *    (Extras.sub_correlated covers Catalyst's decorrelator already);
  *  - the q17 per-part threshold frame is partkey-grouped (tiny relative
  *    to lineitem) and joins back broadcast-or-shuffle as AQE decides.
  */
object Composite {

  def queries: Map[String, QFn] = Map(
    // Q13 shape: how many customers placed 0, 1, 2 … orders (order-count
    // distribution). LEFT join so never-ordered customers count at 0;
    // "non-urgent" predicate stands in for Q13's comment filter.
    "q13_cust_distribution" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips the null-matched rows
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    // Q17 shape: revenue lost by only stocking small orders — lineitems of
    // STANDARD-type parts with quantity below 20% of that part's average.
    // Correlated avg expressed as an explicit per-part aggregate + join
    // (the scale-stable plan: the per-part frame is |part|-sized, not
    // |lineitem|-sized).
    "q17_small_qty_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_type").startsWith("STANDARD"))
        .select(col("p_partkey"))
      val perPart = l.groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(perPart, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),
    // Q18 shape: large-volume orders — orders whose total quantity exceeds
    // 300, with customer attribution, top-100 by price. HAVING over a join
    // feeding a second join.
    "q18_large_orders" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val big = l.groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 300)
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), round(col("o_totalprice"), 2).as("price"),
          col("total_qty"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(100)
    }),
    // Q21 shape adapted (no l_receiptdate/l_commitdate in the binding
    // lineitem): suppliers who were the sole latest shipper on a
    // multi-supplier order — their lineitem hit the order's max shipdate
    // and no other supplier shares that max. EXISTS (another supplier on
    // the order) + NOT EXISTS (another supplier at the max date), both
    // expressed as aggregates over one per-(order, supplier) frame so the
    // order's lineitems shuffle once, not three times.
    "q21_late_suppliers" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val perOrderSupp = l.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("supp_max"))
      // both EXISTS predicates as chained windows over ONE l_orderkey
      // shuffle (the per-order frame is |orders|·|supps-per-order|-sized)
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = perOrderSupp
        .withColumn("order_max", max(col("supp_max")).over(w))
        .withColumn("n_supps", count(lit(1)).over(w))
        .withColumn("n_at_max",
          sum(when(col("supp_max") === col("order_max"), 1L).otherwise(0L)).over(w))
      flagged
        .filter(col("n_supps") > 1 && col("supp_max") === col("order_max") &&
          col("n_at_max") === 1)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),
    // Q22 shape adapted (no c_phone country code; every fixture customer
    // has ≥1 order, so "never ordered" would be vacuous — the anti-join
    // target is "no URGENT order" instead): wealthy customers — balance
    // above the positive-balance average — with no urgent order, counted
    // per nation. Anti join + scalar aggregate, both explicit.
    "q22_idle_customers" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      // avg rounded before the compare: the raw double avg differs across
      // engines at ~1e-12 (accumulation order), an engine-divergent
      // boundary for any balance equal to it — same discipline as q14's
      // rounded-operand division and llm_unigram_logprob's keep flag
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(round(avg(col("c_acctbal")), 6).as("a"))
      val idle = c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("a"))
      idle.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }),
    // Q14 shape: promo revenue share in ship-year 1997. The share divides
    // the two ROUNDED sums so both engines divide identical operands
    // (raw double sums differ in accumulation order).
    "q14_promo_share" -> ((s, d) => {
      val l = Tables.lineitem(s, d).filter(
        col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))), 2)
            .as("promo_rev"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          round(lit(100.0) * col("promo_rev") / col("total_rev"), 6)
            .as("promo_share"))
    }),
    // Q19 shape: disjunctive multi-column predicate (three OR'd
    // brand/size/quantity triples) — the pattern that exercises CNF
    // conversion and partial predicate pushdown; grouped by brand so the
    // result hashes more than one row.
    "q19_disjunctive" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 30) &&
            col("l_quantity").between(20, 30)))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("p_brand"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type LIKE 'STANDARD%'
        |JOIN (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) pa ON l_partkey = pa.pk
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |       round(o_totalprice, 2) AS price, total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING round(sum(l_quantity), 2) > 300) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY price DESC, o_orderkey LIMIT 100""".stripMargin,
    "q21_late_suppliers" ->
      """WITH pos AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_max
        |  FROM lineitem GROUP BY l_orderkey, l_suppkey),
        |w1 AS (
        |  SELECT *, max(supp_max) OVER (PARTITION BY l_orderkey) AS order_max,
        |         count(*) OVER (PARTITION BY l_orderkey) AS n_supps
        |  FROM pos),
        |w2 AS (
        |  SELECT *, sum(CASE WHEN supp_max = order_max THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY l_orderkey) AS n_at_max
        |  FROM w1)
        |SELECT s_name, count(*) AS numwait
        |FROM w2 JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_supps > 1 AND supp_max = order_max AND n_at_max = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |       round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q14_promo_share" ->
      """SELECT promo_rev, total_rev,
        |       round(100.0 * promo_rev / total_rev, 6) AS promo_share
        |FROM (
        |  SELECT
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |              THEN l_extendedprice * (1 - l_discount) END), 2) AS promo_rev,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01') t""".stripMargin,
    "q19_disjunctive" ->
      """SELECT p_brand, count(*) AS n,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 30
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
