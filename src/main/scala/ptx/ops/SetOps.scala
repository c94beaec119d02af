package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}
import ptx.ops.BoundedSort.ReportSortOps

/** G7 — set operations (SURVEY.md §2 G7).
  *
  * Scale notes (100 TB): UNION ALL is a zero-shuffle concatenation;
  * UNION/INTERSECT/EXCEPT each cost one shuffle on the full row (Spark
  * plans them as aggregate / left-semi / left-anti over all columns).
  */
object SetOps {

  def queries: Map[String, QFn] = Map(
    "set_union_all" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val a = l.filter(col("l_returnflag") === "A")
      val b = l.filter(col("l_returnflag") === "N")
      a.unionAll(b)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .reportSort(col("l_returnflag"))
    }),
    "set_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      a.union(b).distinct().orderBy(col("custkey"))
    }),
    "set_intersect" -> ((s, d) => {
      val a = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("custkey"))
      a.intersect(b).orderBy(col("custkey"))
    }),
    "set_except" -> ((s, d) => {
      val a = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      a.except(b).orderBy(col("custkey"))
    }),
    // ✓ bag semantics: INTERSECT ALL keeps min(multiplicity) per value —
    // custkeys appear once per order, so a customer with 3 'F' and 2 'O'
    // orders yields 2 rows. Spark plans this as a single-shuffle
    // aggregate counting per-side multiplicities, then a generator —
    // no row explosion crosses the shuffle.
    "set_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      a.intersectAll(b).orderBy(col("custkey"))
    }),
    // ✓ EXCEPT ALL: multiplicity difference (orders minus 'F' orders per
    // custkey = each customer's non-F order count, as rows)
    "set_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.select(col("o_custkey").as("custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      a.exceptAll(b).orderBy(col("custkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT l_returnflag, count(*) AS n FROM (
        |  SELECT * FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL SELECT * FROM lineitem WHERE l_returnflag = 'N') u
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_union_distinct" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') u
        |ORDER BY custkey""".stripMargin,
    "set_intersect" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 0) t
        |ORDER BY custkey""".stripMargin,
    "set_except" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < 0) t
        |ORDER BY custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
        |ORDER BY custkey""".stripMargin,
    "set_except_all" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
        |ORDER BY custkey""".stripMargin
  )
}
