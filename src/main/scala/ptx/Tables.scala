package ptx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-asserted loaders for the binding tables (FIXTURES.md).
  *
  * Scale note (100 TB): all loads are plain columnar parquet scans — column
  * pruning and predicate pushdown are preserved because no UDF or cache sits
  * between `spark.read.parquet` and the first transformation. On a real
  * cluster these same paths would be directories of many files; nothing here
  * assumes a single file.
  */
object Tables {
  /** Expected columns per table (FIXTURES.md): loads assert instead of
    * inferring so a driver-side data change fails loudly, not silently. */
  private val expectedCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"))

  private def assertSchema(df: DataFrame, name: String): DataFrame = {
    val missing = expectedCols(name).toSet -- df.columns.toSet
    require(missing.isEmpty, s"table $name is missing expected columns $missing " +
      s"(got ${df.columns.mkString(",")}) — fixture drift, see FIXTURES.md")
    df
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(expectedCols.contains(name), s"unknown table $name")
    if (name == "events") events(spark, dir)
    else assertSchema(spark.read.parquet(s"$dir/$name.parquet"), name)
  }

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to load.
    * Verified recipe (FIXTURES.md "events"): read nanos as long, then
    * integer-divide to micros. `cast(ts/1000 as long)` would drift ±1 µs
    * (double ulp at 1.7e18 ≈ 256 ns) — integer `div` is exact and matches
    * DuckDB's ns→µs truncation bit-for-bit.
    *
    * Note: `nanosAsLong` is session-wide and stays set afterwards — any
    * OTHER nanos-timestamp parquet read in the same session would load as
    * long instead of failing. Acceptable here (events is the only nanos
    * table in the binding data); a multi-tenant deployment would scope it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assertSchema(
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)")),
      "events")
  }

  /** Streaming read of the events table (file source) with the same ns→µs
    * recipe as the batch loader — the binding table as a stream. Streaming
    * sources need an explicit schema; ts arrives as epoch-nanos long under
    * the nanosAsLong conf.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source requires a directory; glob-filter the single file
    spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Streaming read of the documents table (file source) — for running the
    * stateless curation/text-analysis transforms on a document stream. */
  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  // Shorthand accessors
  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
