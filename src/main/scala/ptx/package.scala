package object ptx {
  /** The harness query shape: (session, sf-dir) => result frame. */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
