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
  /** Tables with no load-time quirks. */
  private val plain = Set("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else {
      require(plain(name), s"unknown table $name")
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to load.
    * Verified recipe (FIXTURES.md "events"): read nanos as long, then
    * integer-divide to micros. `cast(ts/1000 as long)` would drift ±1 µs
    * (double ulp at 1.7e18 ≈ 256 ns) — integer `div` is exact and matches
    * DuckDB's ns→µs truncation bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

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
