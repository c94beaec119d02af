package ptx.ops

import org.apache.spark.sql.functions._
import ptx.{QFn, Tables}

/** G2 — predicate / projection surface (SURVEY.md §2 G2). */
object FilterProject {

  def queries: Map[String, QFn] = Map(
    "filter_predicates" -> ((s, d) => {
      // AND / OR / NOT / BETWEEN / IN / LIKE / null-safe equality
      Tables.part(s, d)
        .filter(
          (col("p_type").like("PROMO%") || col("p_size").between(1, 15)) &&
          col("p_brand").isin("Brand#1", "Brand#12", "Brand#23") &&
          !(col("p_retailprice") > 915.0) &&
          col("p_type") <=> col("p_type"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),
    "project_case_expr" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          when(col("o_totalprice") < 100000.0, "low")
            .when(col("o_totalprice") < 300000.0, "mid")
            .otherwise("high").as("band"),
          // no round: raw IEEE double arithmetic is bitwise identical across
          // engines, while round-at-an-exact-half diverges (Spark rounds the
          // shortest decimal repr, DuckDB the binary value)
          (col("o_totalprice") * 0.1 + 5.0).as("fee"))
        .orderBy(col("o_orderkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "filter_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE (p_type LIKE 'PROMO%' OR p_size BETWEEN 1 AND 15)
        |  AND p_brand IN ('Brand#1', 'Brand#12', 'Brand#23')
        |  AND NOT (p_retailprice > 915.0)
        |  AND p_type IS NOT DISTINCT FROM p_type
        |ORDER BY p_partkey""".stripMargin,
    "project_case_expr" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price,
        |  CASE WHEN o_totalprice < 100000.0 THEN 'low'
        |       WHEN o_totalprice < 300000.0 THEN 'mid' ELSE 'high' END AS band,
        |  o_totalprice * 0.1 + 5.0 AS fee
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
