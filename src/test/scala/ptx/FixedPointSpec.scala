package ptx

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.LongType

/** Regression tests for the decimal-safe e6 fixed-point discipline (q8 rule,
  * landed round 9 after round-7 ADVICE): every `(2·sum(e2)·10⁴ + n) div (2n)`
  * micro-mean sums its e2 operand as DECIMAL(38,0), because the BIGINT
  * product overflows near 8.7e7 lineitem-scale rows and Spark 4's ANSI mode
  * turns that overflow into a job ABORT — far below the 100 TB design point.
  *
  * The tests pin (a) the operator semantics `div` relies on — decimal
  * operands accepted, LongType result, truncation toward zero — and (b) the
  * overflow regime itself, symbolically: literal e2 sums big enough that the
  * old BIGINT formulation cannot represent the `·2·10⁴` product.
  */
class FixedPointSpec extends AnyFunSuite {

  test("div on DECIMAL(38,0) operands returns BIGINT with the bigint quotient") {
    val s = TestSpark.spark
    val df = s.sql("SELECT (2 * cast(7 as decimal(38,0)) * 10000 + 3) div (2 * 3) as q")
    assert(df.schema("q").dataType == LongType)
    assert(df.collect()(0).getLong(0) == (2L * 7 * 10000 + 3) / (2 * 3))
  }

  test("decimal e6 mean survives sums whose BIGINT product would overflow") {
    val s = TestSpark.spark
    // the actual cluster regime: 2e8 rows of a 46,000.00 price (e2 =
    // 4.6e6) → sum(e2) = 9.2e14, and the old BIGINT formulation's
    // 2·sum·10⁴ = 1.84e19 exceeds Long.MaxValue ≈ 9.22e18, which ANSI
    // mode turns into a job abort. The decimal path must instead return
    // the exact half-up mean — which trivially equals e2·10⁴ here, so
    // the expected value needs no big-number reconstruction.
    val n = 200000000L
    val e2 = 4600000L
    s.range(n).selectExpr(s"$e2 AS v")
      .createOrReplaceTempView("fixed_point_overflow_probe")
    val q = s.sql(
      """SELECT (2 * sum(cast(v as decimal(38,0))) * 10000 + count(1))
        |       div (2 * count(1)) AS mean_e6
        |FROM fixed_point_overflow_probe""".stripMargin)
    assert(q.schema("mean_e6").dataType == LongType)
    assert(BigInt(2) * (BigInt(e2) * n) * 10000 > BigInt(Long.MaxValue),
      "test must exercise the BIGINT-overflow regime")
    assert(q.collect()(0).getLong(0) == e2 * 10000L)
  }

  test("count-guarded mean returns NULL on zero-count input instead of ANSI abort") {
    val s = TestSpark.spark
    import s.implicits._
    // the dq_profile / q22 shape: all-NULL (or empty-after-filter) column →
    // nn = 0 → unguarded `div (2*nn)` is an ANSI div-by-zero abort
    val df = Seq[Option[java.lang.Double]](None, None).toDF("x")
    df.createOrReplaceTempView("fixed_point_null_probe")
    val r = s.sql(
      """SELECT CASE WHEN count(x) > 0 THEN
        |         (2 * sum(cast(round(x * 100) as decimal(38,0))) * 10000
        |          + count(x)) div (2 * count(x)) END AS mean_e6
        |FROM fixed_point_null_probe""".stripMargin).collect()(0)
    assert(r.isNullAt(0))
  }

  test("half-up identity (2N+D) div (2D) = round-half-up(N/D), both sign branches (seeded sweep)") {
    // the bedrock identity ~40 declared queries stand on, swept over 10k
    // seeded pairs incl. the .5-boundary and near-overflow regimes;
    // negative numerators go through negate-divide-negate (the zipf/
    // intercept discipline) because truncating division only agrees
    // across engines on NON-negative operands. Seeded generator, not the
    // scalatest-scalacheck bridge (house rule, LlmOpsSpec:8).
    val rnd = new scala.util.Random(20260814L)
    def halfUpNonNeg(n: BigInt, d: BigInt): BigInt = (2 * n + d) / (2 * d)
    var boundaryHits = 0
    for (_ <- 1 to 10000) {
      val d = BigInt(rnd.nextLong(Long.MaxValue / 4) + 1)
      val base = BigInt(rnd.nextLong(Long.MaxValue / 4))
      // force exact .5 boundaries on a third of the sweep — the only
      // inputs where half-up and truncation genuinely part ways
      val n0 = if (rnd.nextInt(3) == 0 && d % 2 == 0) base / d * d + d / 2 else base
      val n = if (rnd.nextBoolean()) n0 else -n0
      if ((2 * n.abs) % (2 * d) == d) boundaryHits += 1
      val expected = BigInt(new java.math.BigDecimal(n.bigInteger)
        .divide(new java.math.BigDecimal(d.bigInteger), 0,
          java.math.RoundingMode.HALF_UP).toBigInteger)
      val got = if (n >= 0) halfUpNonNeg(n, d) else -halfUpNonNeg(-n, d)
      assert(got == expected, s"N=$n D=$d got=$got expected=$expected")
    }
    assert(boundaryHits > 500, s"sweep must exercise .5 boundaries ($boundaryHits)")
  }
}
