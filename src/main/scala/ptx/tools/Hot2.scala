package ptx.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Hot2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hot2] $l: ${(System.nanoTime()-t0)/1e9}%.2f s ($r)")
    }
    val t = 0.4
    val sh = ptx.Caching.pin(ptx.functions.TextShingles.shingles(ptx.Tables.documents(spark, sfDir)))
    sh.count() // populate cache
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = sh.join(df, Seq("shingle"))
      .select(col("doc_id"), col("shingle"),
        row_number().over(wDoc).as("pos"),
        count(lit(1)).over(Window.partitionBy(col("doc_id"))).as("n_sh"))
      .filter(col("pos") <= col("n_sh") - ceil(col("n_sh") * t) + 1)
      .select(col("doc_id"), col("shingle"))
    val cands = prefix.toDF("doc1", "shingle")
      .join(prefix.toDF("doc2", "shingle"), Seq("shingle"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
    time("prefix postings")(prefix.count())
    val cc = ptx.Caching.pin(cands)
    time("candidates")(cc.count())
    val setsStr = sh.groupBy(col("doc_id")).agg(sort_array(collect_list(col("shingle"))).as("set"), count(lit(1)).as("n"))
    time("verify on string sets")(
      cc.join(setsStr.toDF("doc1","set1","n1"), Seq("doc1"))
        .join(setsStr.toDF("doc2","set2","n2"), Seq("doc2"))
        .withColumn("inter", size(array_intersect(col("set1"), col("set2"))).cast("long"))
        .filter(col("inter").cast("double")/(col("n1")+col("n2")-col("inter")) >= 0.4).count())
    val setsH = sh.groupBy(col("doc_id")).agg(sort_array(collect_list(xxhash64(col("shingle")))).as("set"), count(lit(1)).as("n"))
    time("verify on long-hash sets")(
      cc.join(setsH.toDF("doc1","set1","n1"), Seq("doc1"))
        .join(setsH.toDF("doc2","set2","n2"), Seq("doc2"))
        .withColumn("inter", size(array_intersect(col("set1"), col("set2"))).cast("long"))
        .filter(col("inter").cast("double")/(col("n1")+col("n2")-col("inter")) >= 0.4).count())
    // count-based verify restricted to candidates via semi join
    val a = sh.toDF("doc1", "shingle"); val b = sh.toDF("doc2", "shingle")
    time("count-based full (old shape)")(
      a.join(b, Seq("shingle")).filter(col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("inter")).count())
    spark.stop()
  }
}
