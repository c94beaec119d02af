package ptx

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Entry-point B (SURVEY §3.2): the SQL string path must produce the same
  * results as the DataFrame path, and PtxExtensions must expose the custom
  * function to pure-SQL sessions.
  */
class SqlEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spark.sql pricing summary equals the DataFrame formulation") {
    Tables.lineitem(spark, TestSpark.SF).createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  (2 * sum(cast(round(l_quantity * 100) as bigint)) * 10000
        |   + count(1)) div (2 * count(1)) AS avg_qty_e6,
        |  (2 * sum(cast(round(l_extendedprice * 100) as bigint)) * 10000
        |   + count(1)) div (2 * count(1)) AS avg_price_e6,
        |  (2 * sum(cast(round(l_discount * 100) as bigint)) * 10000
        |   + count(1)) div (2 * count(1)) AS avg_disc_e6,
        |  count(*) AS count_order
        |FROM lineitem_v
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect().map(_.toString).toSeq
    val df = QueryRegistry.all("agg_pricing_summary")(spark, TestSpark.SF)
      .collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("spark.sql q13 distribution equals the DataFrame formulation (r5)") {
    Tables.customer(spark, TestSpark.SF).createOrReplaceTempView("customer_v")
    Tables.orders(spark, TestSpark.SF).createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer_v LEFT JOIN orders_v
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
      .collect().map(_.toString).toSeq
    val df = QueryRegistry.all("q13_cust_distribution")(spark, TestSpark.SF)
      .collect().map(_.toString).toSeq
    assert(sql == df)
  }

  test("PtxExtensions injects cosine_sim into a fresh SQL-only session") {
    val old = spark // ensure the shared context exists
    // getOrCreate returns the existing default session (without extensions),
    // so detach it first; the new session reuses the same SparkContext.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new PtxExtensions)
        .getOrCreate()
      val v = s2.sql(
        "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(2 AS FLOAT), CAST(4 AS FLOAT)))").collect()(0).getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      // gram_hashes is injected too (r11): usable from pure SQL with no
      // operator call first, both widths
      val g5 = s2.sql(
        "SELECT size(gram_hashes(array('a','b','c','d','e','f')))")
        .collect()(0).getInt(0)
      assert(g5 == 2)
      val g3 = s2.sql(
        "SELECT size(gram_hashes(array('a','b','c','d'), 3))")
        .collect()(0).getInt(0)
      assert(g3 == 2)
      // might_contain is injected too (r11): the full Bloom pair from
      // pure SQL — build with Spark's registered bloom_filter_agg, probe
      // with the injected might_contain; an inserted value must hit
      val bloomHits = s2.sql(
        """WITH b AS (SELECT bloom_filter_agg(x, 10L, 1024L) AS bf
          |           FROM (SELECT CAST(id AS LONG) AS x FROM range(5)))
          |SELECT might_contain((SELECT bf FROM b), CAST(3 AS LONG)),
          |       might_contain((SELECT bf FROM b), CAST(424242 AS LONG))
          |""".stripMargin).collect()(0)
      assert(bloomHits.getBoolean(0), "inserted value must hit the filter")
      // (424242 is a non-member: true only under an fp — 1024 bits over
      // 5 items makes that ~impossible, and determinism makes it stable)
      assert(!bloomHits.getBoolean(1), "non-member unexpectedly hit")
      // the operators' register() recognizes the injected binding: no-op,
      // no clobber, no conflict error
      ptx.functions.TextGrams.register(s2)
      ptx.functions.VectorOps.register(s2)
      ptx.functions.Blooms.register(s2)
      assert(s2.sql("SELECT size(gram_hashes(array('x','y','z','w','v')))")
        .collect()(0).getInt(0) == 1)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("seeded fuzz: 40 random filter+agg queries agree between DataFrame and SQL paths") {
    // a mini differential harness over the two entry points: every
    // generated query is built ONCE as a DataFrame expression tree and
    // ONCE as a SQL string; the parser/analyzer and the DSL must meet at
    // identical results. Seeded, so failures reproduce.
    import org.apache.spark.sql.functions._
    Tables.lineitem(spark, TestSpark.SF).createOrReplaceTempView("li_fuzz")
    val li = spark.table("li_fuzz")
    val rnd = new scala.util.Random(42)
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strCols = Seq("l_returnflag", "l_linestatus")
    val ranges = Map("l_quantity" -> (1.0, 50.0), "l_extendedprice" -> (900.0, 105000.0),
      "l_discount" -> (0.0, 0.1), "l_tax" -> (0.0, 0.08))
    val strVals = Map("l_returnflag" -> Seq("A", "N", "R"),
      "l_linestatus" -> Seq("F", "O"))
    val ops = Seq("<", "<=", ">", ">=", "=", "<>")
    def predicate(): (String, org.apache.spark.sql.Column) = {
      if (rnd.nextBoolean()) {
        val c = numCols(rnd.nextInt(numCols.length))
        val (lo, hi) = ranges(c)
        val v = BigDecimal(lo + rnd.nextDouble() * (hi - lo))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        val op = ops(rnd.nextInt(ops.length))
        val colc = col(c)
        val dslc = op match {
          case "<" => colc < v;   case "<=" => colc <= v
          case ">" => colc > v;   case ">=" => colc >= v
          case "=" => colc === v; case "<>" => colc =!= v
        }
        (s"$c $op $v", dslc)
      } else {
        val c = strCols(rnd.nextInt(strCols.length))
        val v = strVals(c)(rnd.nextInt(strVals(c).length))
        val eq = rnd.nextBoolean()
        (s"$c ${if (eq) "=" else "<>"} '$v'",
          if (eq) col(c) === v else col(c) =!= v)
      }
    }
    (1 to 40).foreach { i =>
      val preds = Seq.fill(1 + rnd.nextInt(3))(predicate())
      val conj = rnd.nextBoolean()
      val sqlPred = preds.map(_._1).mkString(if (conj) " AND " else " OR ")
      val dslPred = preds.map(_._2).reduce((a, b) => if (conj) a && b else a || b)
      val gcols = Seq("l_returnflag", "l_linestatus").take(1 + rnd.nextInt(2))
      val aggCol = numCols(rnd.nextInt(numCols.length))
      val (aggSql, aggDsl) = rnd.nextInt(5) match {
        case 0 => (s"round(sum($aggCol), 6)", round(sum(col(aggCol)), 6))
        case 1 => (s"round(avg($aggCol), 6)", round(avg(col(aggCol)), 6))
        case 2 => (s"min($aggCol)", min(col(aggCol)))
        case 3 => (s"max($aggCol)", max(col(aggCol)))
        case _ => ("count(*)", count(lit(1)))
      }
      val sqlRes = spark.sql(
        s"""SELECT ${gcols.mkString(", ")}, $aggSql AS m
           |FROM li_fuzz WHERE $sqlPred
           |GROUP BY ${gcols.mkString(", ")}
           |ORDER BY ${gcols.mkString(", ")}""".stripMargin)
        .collect().map(_.toString).toSeq
      val dfRes = li.filter(dslPred)
        .groupBy(gcols.map(col): _*)
        .agg(aggDsl.as("m"))
        .orderBy(gcols.map(col): _*)
        .collect().map(_.toString).toSeq
      assert(sqlRes == dfRes,
        s"fuzz #$i diverged\n  WHERE $sqlPred GROUP BY ${gcols.mkString(",")} AGG $aggSql" +
          s"\n  sql=${sqlRes.take(3)}\n  df=${dfRes.take(3)}")
    }
  }

  test("seeded fuzz: 24 random join queries agree between DataFrame and SQL paths (r6)") {
    // widens the differential grammar to the join operator class
    // (VERDICT r5 §5): random join type (inner/left), random filters on
    // each side — the right-side filter goes through a subquery in SQL and
    // a pre-join filter in the DSL, the forms a user actually writes.
    import org.apache.spark.sql.functions._
    Tables.lineitem(spark, TestSpark.SF).createOrReplaceTempView("li_fuzz")
    Tables.orders(spark, TestSpark.SF).createOrReplaceTempView("ord_fuzz")
    val li = spark.table("li_fuzz")
    val ord = spark.table("ord_fuzz")
    val rnd = new scala.util.Random(4242)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    (1 to 24).foreach { i =>
      val qty = 1 + rnd.nextInt(50)
      val price = BigDecimal(1000.0 + rnd.nextDouble() * 400000.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val prio = prios(rnd.nextInt(prios.length))
      val left = rnd.nextBoolean()
      val joinSql = if (left) "LEFT JOIN" else "JOIN"
      val sqlRes = spark.sql(
        s"""SELECT l_returnflag,
           |  round(sum(l_quantity), 6) AS sq,
           |  round(sum(o_totalprice), 2) AS sp,
           |  count(*) AS n
           |FROM li_fuzz $joinSql
           |  (SELECT * FROM ord_fuzz
           |   WHERE o_totalprice < $price AND o_orderpriority <> '$prio') o
           |  ON l_orderkey = o_orderkey
           |WHERE l_quantity >= $qty
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
        .collect().map(_.toString).toSeq
      val o2 = ord.filter(col("o_totalprice") < price &&
        col("o_orderpriority") =!= prio)
      val dfRes = li.filter(col("l_quantity") >= qty)
        .join(o2, col("l_orderkey") === col("o_orderkey"),
          if (left) "left_outer" else "inner")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 6).as("sq"),
          round(sum(col("o_totalprice")), 2).as("sp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
        .collect().map(_.toString).toSeq
      assert(sqlRes == dfRes,
        s"join fuzz #$i diverged ($joinSql qty>=$qty price<$price prio<>$prio)" +
          s"\n  sql=${sqlRes.take(3)}\n  df=${dfRes.take(3)}")
    }
  }

  test("seeded fuzz: 24 random window queries agree between DataFrame and SQL paths (r6)") {
    // widens the differential grammar to the window operator class
    // (VERDICT r5 §5). Only tie-deterministic functions (rank/dense_rank/
    // RANGE-frame sum) — fixture (l_orderkey, l_linenumber) is NOT unique,
    // so row_number over a non-total order would be a flaky comparison,
    // not a real divergence. Row multisets are compared after a driver-side
    // sort, so no total ORDER BY is required in the queries themselves.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    Tables.lineitem(spark, TestSpark.SF).createOrReplaceTempView("li_fuzz")
    val li = spark.table("li_fuzz")
    val rnd = new scala.util.Random(777)
    val parts = Seq("l_returnflag", "l_linestatus")
    val orders = Seq("l_quantity", "l_extendedprice", "l_discount")
    (1 to 24).foreach { i =>
      val p = parts(rnd.nextInt(parts.length))
      val o = orders(rnd.nextInt(orders.length))
      val qty = 1 + rnd.nextInt(45)
      val w = Window.partitionBy(col(p)).orderBy(col(o))
      // SQL text and DSL column built per function: round() wraps OUTSIDE
      // the OVER clause (a window spec attaches to the aggregate itself)
      val (fnSql, dslCol) = rnd.nextInt(3) match {
        case 0 => (s"rank() OVER (PARTITION BY $p ORDER BY $o)",
          rank().over(w))
        case 1 => (s"dense_rank() OVER (PARTITION BY $p ORDER BY $o)",
          dense_rank().over(w))
        case _ => (s"round(sum(l_tax) OVER (PARTITION BY $p ORDER BY $o), 6)",
          round(sum(col("l_tax")).over(w), 6))
      }
      val sqlRes = spark.sql(
        s"""SELECT l_orderkey, l_linenumber, $p, $o, $fnSql AS w
           |FROM li_fuzz WHERE l_quantity > $qty""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val dfRes = li.filter(col("l_quantity") > qty)
        .select(col("l_orderkey"), col("l_linenumber"), col(p), col(o),
          dslCol.as("w"))
        .collect().map(_.toString).sorted.toSeq
      assert(sqlRes == dfRes,
        s"window fuzz #$i diverged ($fnSql over $p/$o qty>$qty)" +
          s"\n  sql=${sqlRes.take(3)}\n  df=${dfRes.take(3)}")
    }
  }
}
