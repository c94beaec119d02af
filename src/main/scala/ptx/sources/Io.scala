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

  /** ORC round-trip (r6) — the second columnar format a warehouse meets.
    * Same explicit-schema contract as the CSV/JSON readers; ORC carries
    * its own schema but pinning one rejects drifted files at plan time
    * instead of poisoning downstream unions. Predicate pushdown and
    * column pruning work the same as parquet (native vectorized reader).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

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

  /** Compact a parquet directory's small files into ~`targetMB`-sized
    * outputs at `dst` (r5) — the operational fix for the small-files
    * problem: a streaming sink or over-parallel write leaves thousands of
    * KB-sized files whose per-file open/footer cost dominates later scans.
    * Output partition count = ceil(input bytes / target), from the REAL
    * on-disk size (Hadoop FS listing), not a row-count guess — parquet
    * compression ratios vary too much for rows to predict bytes.
    * `sortCol` range-partitions before writing so each output file covers
    * a disjoint key range (min/max footer stats then prune scans on that
    * column). `partitionCols` (r6) writes a hive-style `col=value` layout
    * instead: rows are RANGE-clustered by (partition value, spread key)
    * so each directory receives its files from the few tasks whose range
    * covers that value, while a hot value still splits across enough
    * tasks to honor `targetMB`
    * — without the clustering, every task writes a sliver into every
    * directory and the "compaction" multiplies the file count by the
    * partition count. Writes to a fresh directory — never in place: a
    * failed in-place compaction loses the input.
    */
  /** The never-in-place contract shared by every compactor: neither path
    * may be an ancestor of the other, else an exact-path overwrite would
    * write output files INTO the source and double-count rows on the next
    * read. Both paths are qualified through the Hadoop filesystem (NOT
    * java.io.File, which would resolve s3://, hdfs:// etc. against the
    * local cwd and collapse '//' — ADVICE r5), then ancestor-checked at
    * directory-component granularity; local paths are additionally
    * canonicalized so a 'current -> v3' symlink cannot smuggle one
    * inside the other. */
  private[sources] def assertDisjointPaths(spark: SparkSession,
                                           src: String, dst: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualify(p: String): java.net.URI = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val q = hp.getFileSystem(hconf).makeQualified(hp).toUri
      if (q.getScheme == "file")
        new java.io.File(q.getPath).getCanonicalFile.toURI
      else q
    }
    val srcUri = qualify(src)
    val dstUri = qualify(dst)
    def isAncestor(a: java.net.URI, b: java.net.URI): Boolean =
      a.getScheme == b.getScheme && a.getAuthority == b.getAuthority && {
        val ap = a.getPath.stripSuffix("/")
        b.getPath == ap || b.getPath.startsWith(ap + "/")
      }
    require(!isAncestor(srcUri, dstUri) && !isAncestor(dstUri, srcUri),
      s"dst must be outside src (src=$srcUri dst=$dstUri)")
  }

  def compact(spark: SparkSession, src: String, dst: String,
              targetMB: Int = 128, sortCol: Option[String] = None,
              partitionCols: Seq[String] = Nil): Long = {
    require(targetMB > 0, s"targetMB must be positive, got $targetMB")
    assertDisjointPaths(spark, src, dst) // never-in-place (helper doc)
    val hPath = new org.apache.hadoop.fs.Path(src)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val parts = math.max(1L, (bytes + targetMB.toLong * 1024 * 1024 - 1) /
      (targetMB.toLong * 1024 * 1024)).toInt
    val df = spark.read.parquet(src)
    import org.apache.spark.sql.functions.{col, xxhash64, struct}
    val shaped =
      if (partitionCols.nonEmpty) {
        // RANGE-partition by (partitionCols, spread): a plain hash on the
        // partition columns would put EVERY row of one value in a single
        // task — one arbitrarily large file per directory, silently
        // ignoring targetMB. Ranging keeps a value's rows contiguous
        // (each task writes into 1-2 directories) while the spread key
        // splits a big value across enough tasks to honor the size
        // target. Spread = sortCol when given (footer min/max stats then
        // also prune on it), else a content hash (deterministic, layout-
        // independent).
        val spread = sortCol.map(col).getOrElse(
          xxhash64(struct(df.columns.map(col): _*)))
        df.repartitionByRange(parts, (partitionCols.map(col) :+ spread): _*)
      } else sortCol match {
        case Some(c) => df.repartitionByRange(parts, col(c))
        case None => df.repartition(parts)
      }
    val writer = shaped.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(dst)
    parts.toLong
  }
}
