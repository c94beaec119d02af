package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}
import ptx.ops.BoundedSort.ReportSortOps

/** G1 — scan / source surface (SURVEY.md §2 G1).
  *
  * Scale notes (100 TB): `scan_project` and `scan_filter_pushdown` are the
  * canonical "did pushdown happen" exemplars — their plans must show
  * ReadSchema limited to the selected columns and PushedFilters containing
  * the predicate (asserted in ScanSpec). At cluster scale these run as one
  * task per parquet split with no shuffle before the aggregate.
  */
object Scans {

  def queries: Map[String, QFn] = Map(
    "scan_project" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique (measured — FIXTURES.md's
      // uniqueness claim is wrong at every sf); adding l_extendedprice makes
      // any remaining tie a full-row duplicate, so order cannot affect the
      // hash compare.
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(100)
    }),
    "scan_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .reportSort(col("l_returnflag"))
    }),
    "scan_events_ns" -> ((s, d) => {
      // end-to-end exercise of the TIMESTAMP(NANOS) load path (Tables.events)
      Tables.events(s, d)
        .select(col("event_id"), col("ts"))
        .orderBy(col("event_id"))
        .limit(100)
    }),
    "scan_union_files" -> ((s, d) => {
      // two independent reads composed — the multi-source scan exemplar
      val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      a.unionAll(b)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .reportSort(col("o_orderstatus"))
    })
  )

  def oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 100""".stripMargin,
    "scan_filter_pushdown" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_quantity > 45 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "scan_events_ns" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |ORDER BY event_id LIMIT 100""".stripMargin,
    "scan_union_files" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
        |  SELECT * FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL SELECT * FROM orders WHERE o_orderstatus = 'O') u
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
