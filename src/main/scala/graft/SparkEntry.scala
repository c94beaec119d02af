package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real work lives in the `ptx` package; this object only wires the
  * registry into the harness shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q5-shape star join (SURVEY §7.1): 1 row at sf0.001 (measured).
    */
  def entry(spark: SparkSession): DataFrame =
    ptx.QueryRegistry.all("join_star_q5")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ptx.QueryRegistry.all
  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables (DuckDB dialect by contract). Keys absent here are the
    * declared-◌ ops (sketches/approximate) covered by unit tests instead. */
  def oracleSql: Map[String, String] = ptx.QueryRegistry.oracleSql
}
