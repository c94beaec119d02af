package ptx.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the binding parquet tables: schema-pinned CSV
  * and JSON readers, and the partitioned / bucketed writers a 100 TB layout
  * needs.
  *
  * Scale notes:
  *  - readers take an explicit schema — runtime inference is a full extra
  *    pass over the data and non-deterministic under schema drift; at scale
  *    the schema is a contract, not a discovery;
  *  - `writePartitioned` lays out hive-style `col=value` directories so
  *    later reads prune partitions from the path (PartitionFilters, no
  *    footer reads outside the range);
  *  - `writeBucketed` pre-shuffles into N buckets by join/group key so
  *    downstream joins/aggs on that key skip their exchange entirely.
  */
object Io {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")   // malformed rows are a pipeline bug, not data
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned parquet layout (one directory per value of each
    * partition column). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted managed table: co-locates rows by key so joins and
    * aggregations on `bucketCol` need no shuffle. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCol: String, sortCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCol)
      .format("parquet")
      .saveAsTable(table)
}
