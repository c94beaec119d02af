package ptx

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import ptx.functions.Aggregators

/** Library function surface: typed Aggregator and SQL-registered expression. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nearest_cell kernel: equals the HOF argmax it replaced; lower label wins ties (r16)") {
    ptx.functions.VectorOps.register(spark)
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, TestSpark.SF)
      .select(col("vec_id"), col("embedding"))
    val cent = e.orderBy(col("vec_id")).limit(8).collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
    val centDf = spark.createDataFrame(cent.toSeq).toDF("label", "centroid")
    val withCents = e.crossJoin(broadcast(centDf.agg(
      expr("array_sort(collect_list(struct(label, centroid)))").as("cents"))))
    // the pre-r16 HOF formulation, verbatim — the kernel must reproduce
    // it bit-for-bit on every vector of the fixture
    val viaHof = withCents.withColumn("best", expr(
        """array_max(transform(cents,
          |  c -> struct(cosine_sim(embedding, c.centroid) AS s,
          |              -c.label AS nl)))""".stripMargin))
      .select(col("vec_id"), (-col("best.nl")).cast("int").as("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaKernel = withCents
      .select(col("vec_id"), expr("nearest_cell(embedding, cents)").as("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaKernel == viaHof, "nearest_cell diverged from the HOF argmax")
    assert(viaKernel.values.toSet.size > 1, "fixture degenerate: one cell won everything")
    // tie-break: the same centroid under two labels — the LOWER label wins
    val v = cent.head._2
    val tieDf = spark.createDataFrame(Seq((5, v), (2, v))).toDF("label", "centroid")
    val tied = e.limit(3).crossJoin(broadcast(tieDf.agg(
        expr("array_sort(collect_list(struct(label, centroid)))").as("cents"))))
      .select(expr("nearest_cell(embedding, cents)").as("label"))
      .collect().map(_.getInt(0))
    assert(tied.forall(_ == 2), s"tie must break to the lower label, got ${tied.toSeq}")
  }

  test("lsh_sig kernel: equals the per-plane cosine_sim expression forest it replaced (r18)") {
    ptx.functions.VectorOps.register(spark)
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, TestSpark.SF)
      .select(col("vec_id"), col("embedding"))
    // the pre-r18 formulation, verbatim: L×bits IF(cosine_sim(embedding,
    // <plane literal>) > 0, 1<<b, 0) expressions summed per table, planes
    // drawn seed-7 in tabulation order — the kernel must reproduce every
    // signature int bit-for-bit on every vector of the fixture
    val (l, bits) = (4, 6) // small L keeps the forest's plan cost testable
    val rnd = new scala.util.Random(7)
    val planes = Seq.tabulate(l, bits)((_, _) => Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    def bucketExpr(t: Int) = planes(t).zipWithIndex.map { case (p, i) =>
      val planeLit = s"array(${p.map(x => s"CAST($x AS FLOAT)").mkString(",")})"
      expr(s"IF(cosine_sim(embedding, $planeLit) > 0, ${1 << i}, 0)")
    }.reduce(_ + _)
    val viaForest = e.select(col("vec_id"),
        array((0 until l).map(bucketExpr): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaKernel = e.select(col("vec_id"),
        expr(s"lsh_sig(embedding, $l, $bits)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaKernel == viaForest, "lsh_sig diverged from the cosine_sim expression forest")
    // fixture sanity: signatures must actually spread over buckets
    assert(viaKernel.values.flatten.toSet.size > 4,
      "fixture degenerate: all signatures identical")
  }

  test("nearest_cell kernel: NaN cosines follow the HOF's double total order (r17, ADVICE r16)") {
    // a zero-norm embedding or centroid makes the cosine 0/0 = NaN;
    // Spark's array_max orders NaN GREATEST, so the HOF picks that cell
    // — the kernel's old `s > bestS` skipped it (false for NaN), and an
    // all-NaN row escaped with the Int.MaxValue initializer as a label
    ptx.functions.VectorOps.register(spark)
    val dim = 4
    val zero = Seq.fill(dim)(0f)
    val unitX = 1f +: Seq.fill(dim - 1)(0f)
    val unitY = 0f +: 1f +: Seq.fill(dim - 2)(0f)
    def run(probe: Seq[Float], cents: Seq[(Int, Seq[Float])]): (Int, Int) = {
      val cdf = spark.createDataFrame(cents).toDF("label", "centroid")
      val row = spark.createDataFrame(Seq(Tuple1(probe))).toDF("embedding")
        .crossJoin(broadcast(cdf.agg(
          expr("array_sort(collect_list(struct(label, centroid)))").as("cents"))))
        .select(
          expr("nearest_cell(embedding, cents)").as("kernel"),
          expr("""(-array_max(transform(cents,
                 |  c -> struct(cosine_sim(embedding, c.centroid) AS s,
                 |              -c.label AS nl))).nl)""".stripMargin)
            .cast("int").as("hof"))
        .head()
      (row.getInt(0), row.getInt(1))
    }
    // one NaN cell among finite ones: NaN is greatest → that cell wins
    val (k1, h1) = run(unitX, Seq((7, unitY), (3, zero), (1, unitX)))
    assert(k1 == h1 && k1 == 3, s"NaN cell must win as greatest, got kernel=$k1 hof=$h1")
    // all-NaN (zero-norm probe): ties break to the LOWEST label — and
    // the initializer sentinel must never escape
    val (k2, h2) = run(zero, Seq((9, unitY), (4, unitX)))
    assert(k2 == h2 && k2 == 4, s"all-NaN row must yield the lowest label, got kernel=$k2 hof=$h2")
    // zero-norm probe against zero AND finite centroids: every cosine is
    // NaN (the probe's own norm zeroes the denominator) → lowest label
    val (k3, h3) = run(zero, Seq((8, zero), (5, zero), (2, unitX)))
    assert(k3 == h3 && k3 == 2, s"NaN tie must break low, got kernel=$k3 hof=$h3")
    // finite probe, NaN cell vs a BETTER-label finite cell: NaN still
    // outranks the finite sim even when the finite cell's label is lower
    val (k4, h4) = run(unitX, Seq((1, unitX), (6, zero)))
    assert(k4 == h4 && k4 == 6, s"NaN must outrank finite sims, got kernel=$k4 hof=$h4")
  }

  test("adaptiveK fails loudly past Int range instead of wrapping (r17, ADVICE r16)") {
    val f = ptx.sources.VectorIndex.adaptiveK _
    // 5e11 vectors at the default cell budget: k ≈ 1.95e9, still an Int
    assert(f(500L * 1000 * 1000 * 1000, 256, 8) == 1953125000)
    // the ADVICE's ~5.5e11 point: k ≈ 2.15e9 crosses Int.MaxValue —
    // must fail loudly, not wrap negative into limit(k)/nprobe sizing
    val ex = intercept[IllegalArgumentException] {
      f(550L * 1000 * 1000 * 1000, 256, 8)
    }
    assert(ex.getMessage.contains("exceeds Int range"))
  }

  test("weighted_mean aggregator: hand-computed groups, merge across partitions") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 3.0, 3.0),           // (1*1+3*3)/4 = 2.5
      ("b", 10.0, 0.5), ("b", 20.0, 0.5), ("b", 0.0, 0.0) // 15.0
    ).toDF("k", "x", "w").repartition(4)
    val got = df.groupBy($"k")
      .agg(Aggregators.weighted_mean($"x", $"w").as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 2.5)
    assert(got("b") == 15.0)
  }

  test("weighted_mean with zero total weight yields NaN") {
    val got = Seq(("a", 1.0, 0.0)).toDF("k", "x", "w")
      .groupBy($"k").agg(Aggregators.weighted_mean($"x", $"w").as("wm"))
      .collect()(0).getDouble(1)
    assert(got.isNaN)
  }

  test("TopK aggregator equals sort-based top-k on 50 seeded random datasets") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(8)
      // duplicate scores force the id tiebreak; ids unique
      val rows = (0 until n).map(i => (rnd.nextInt(5).toDouble, i.toLong))
      val expected = rows.sortBy { case (s, id) => (-s, id) }.take(k).toList
      val agg = new ptx.functions.Aggregators.TopK(k)
      // random partition split exercises merge()
      val parts = rows.grouped(1 + rnd.nextInt(7)).toSeq
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected, s"trial $trial: n=$n k=$k")
    }
  }

  test("TopK aggregator: NaN and tie-heavy inputs under random partition splits") {
    // NaN must rank as GREATEST (SQL ORDER BY score DESC in both engines);
    // heavy score duplication forces the id tiebreak through reduce AND merge.
    val rnd = new scala.util.Random(97)
    def refOrder(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    (1 to 50).foreach { trial =>
      val n = 1 + rnd.nextInt(80)
      val k = 1 + rnd.nextInt(10)
      val rows = (0 until n).map { i =>
        val s = rnd.nextInt(4) match {
          case 0 => Double.NaN
          case 1 => 1.0                     // massed tie
          case _ => rnd.nextInt(3).toDouble // more ties
        }
        (s, i.toLong)
      }
      val expected = rows.sortWith(refOrder).take(k).toList
      val agg = new ptx.functions.Aggregators.TopK(k)
      val parts = rows.grouped(1 + rnd.nextInt(9)).toSeq
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      // == on NaN is false; compare via the same total order
      assert(got.length == expected.length &&
        got.zip(expected).forall { case (a, b) =>
          java.lang.Double.compare(a._1, b._1) == 0 && a._2 == b._2 },
        s"trial $trial: n=$n k=$k got=$got want=$expected")
    }
  }

  test("cosine_sim is registered for SQL and matches the kernel") {
    ptx.functions.VectorOps.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(0 AS FLOAT), CAST(1 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(got) < 1e-12)
    val same = spark.sql(
      "SELECT cosine_sim(array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(same - 1.0) < 1e-12)
  }

  test("gram_hashes: window identity, position sensitivity, short rows, SQL twin (r10)") {
    ptx.functions.TextGrams.register(spark)
    // identical 5-token windows hash equal ACROSS docs; different windows
    // differ; order matters (position sensitivity)
    val rows = Seq(
      (1L, "a b c d e f"),          // grams: [a..e], [b..f]
      (2L, "x a b c d e"),          // gram 2 = [a..e] — must equal doc 1's first
      (3L, "e d c b a z"),          // reversed tokens — must differ
      (4L, "a b c d")               // 4 tokens → no grams
    ).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr("gram_hashes(w)")).as(Seq("i0", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).length == 2 && byDoc(2L).length == 2 && byDoc(3L).length == 2)
    assert(!byDoc.contains(4L), "a 4-token row must emit no grams")
    val d1first = byDoc(1L).find(_._2 == 0).get._3
    val d2second = byDoc(2L).find(_._2 == 1).get._3
    assert(d1first == d2second, "identical grams must share the key across docs")
    val d3 = byDoc(3L).map(_._3).toSet
    assert(!d3.contains(d1first), "reversed token order must change the key")
    assert(byDoc(1L).map(_._3).distinct.length == 2, "shifted windows must differ")
    // the kernel must agree with its variadic-builtin construction:
    // xxhash64 of the five per-token xxhash64 values, chained in order
    val twin = spark.sql(
      """SELECT xxhash64(xxhash64('a'), xxhash64('b'), xxhash64('c'),
        |                xxhash64('d'), xxhash64('e'))""".stripMargin)
      .collect()(0).getLong(0)
    assert(d1first == twin, "GramHashes must equal the chained xxhash64 builtin")
  }

  test("gram_hashes keys partition identically to string grams on 200 seeded random docs") {
    ptx.functions.TextGrams.register(spark)
    // equivalence property the dedup/span families rely on: two gram
    // occurrences share a kernel KEY iff their joined-string grams are
    // equal (collisions aside — none at this scale). Checked per width
    // (3 = shingles, 5 = spans) by comparing the string-gram stream's
    // per-gram occurrence counts against the kernel stream's per-key
    // counts: equal partitioning ⇒ identical count multisets AND
    // identical distinct counts. Seeded small vocab forces heavy gram
    // repetition; doc lengths 0..12 cover the under-width edge.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "aa", "bb")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(13))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    for (width <- Seq(3, 5)) {
      val stringStream = df.select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(w) >= $width THEN
           |  transform(sequence(1, size(w) - ${width - 1}),
           |    i -> array_join(slice(w, i, $width), ' '))
           |ELSE array() END""".stripMargin)).as(Seq("pos", "g")))
      val kernelStream = df.select(col("doc_id"),
        posexplode(expr(s"gram_hashes(w, $width)")).as(Seq("pos", "h")))
      val both = stringStream.join(kernelStream, Seq("doc_id", "pos"))
      assert(both.count() == stringStream.count() && both.count() > 0,
        s"width $width: occurrence streams misaligned")
      // bijection: every string gram maps to exactly one key, and every
      // key back to exactly one string gram
      assert(both.groupBy(col("g"))
        .agg(countDistinct(col("h")).as("nh")).filter(col("nh") =!= 1).isEmpty,
        s"width $width: a string gram maps to multiple kernel keys")
      assert(both.groupBy(col("h"))
        .agg(countDistinct(col("g")).as("ng")).filter(col("ng") =!= 1).isEmpty,
        s"width $width: distinct string grams collide on one kernel key")
    }
  }

  test("SimHash aggregator equals the 64-column sum(when) formulation") {
    val rnd = new scala.util.Random(11)
    val hashes = Seq.fill(200)(rnd.nextLong())
    // reference: per-bit ±1 votes, bit set when total positive
    var expected = 0L
    for (i <- 0 until 64) {
      val vote = hashes.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) expected |= 1L << i
    }
    val agg = ptx.functions.Aggregators.SimHash
    // random partition split exercises merge()
    for (trial <- 1 to 5) {
      val parts = hashes.grouped(1 + rnd.nextInt(37)).toSeq
      val bufs = parts.map(_.foldLeft(agg.zero) { (b, h) => agg.reduce(b.clone(), h) })
      val merged = bufs.foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      assert(agg.finish(merged) == expected, s"trial $trial")
    }
    // end-to-end through the udaf against real data
    import spark.implicits._
    val df = hashes.map(("d1", _)).toDF("doc_id", "h")
    val got = df.groupBy(col("doc_id"))
      .agg(ptx.functions.Aggregators.simhash(col("h")).as("sig"))
      .collect()(0).getLong(1)
    assert(got == expected)
  }

  test("sorted_intersect_count equals size(array_intersect) on 200 random sorted arrays") {
    ptx.functions.VectorOps.register(spark)
    val rnd = new scala.util.Random(41)
    // kernel-level check incl. duplicates and empties
    (1 to 200).foreach { trial =>
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      val expected = (a.toSet intersect b.toSet).size.toLong
      val got = ptx.functions.SortedIntersectCount.count(a, b)
      assert(got == expected, s"trial $trial: $got vs $expected for ${a.toSeq}/${b.toSeq}")
    }
    // end-to-end through codegen against the built-in
    val df = Seq((Seq(1L, 2L, 2L, 5L, 9L), Seq(2L, 5L, 5L, 7L))).toDF("a", "b")
    val row = df.select(
      expr("sorted_intersect_count(a, b)").as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()(0)
    assert(row.getLong(0) == row.getLong(1) && row.getLong(0) == 2L)
  }

  test("gram_hashes rejects non-array<string> input at analysis time (r11)") {
    ptx.functions.TextGrams.register(spark)
    // Dataset creation analyzes the plan, so the failure surfaces on select
    // — not as a runtime ClassCastException mid-job (ADVICE r10)
    val exInt = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Array(1, 2, 3))).toDF("id", "xs")
        .select(expr("gram_hashes(xs)"))
    }
    assert(exInt.getMessage.contains("array<string>"), exInt.getMessage)
    val exStr = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, "a b c")).toDF("id", "t").select(expr("gram_hashes(t)"))
    }
    assert(exStr.getMessage.contains("array<string>"), exStr.getMessage)
    // the valid shape still analyzes and runs
    val ok = Seq((1L, "a b c d e f")).toDF("id", "t")
      .select(col("id"), split(col("t"), " ").as("w"))
      .select(size(expr("gram_hashes(w)")).as("n")).collect()(0).getInt(0)
    assert(ok == 2)
  }

  test("byte_entropy_e6: reference recompute on 200 seeded payloads, edges, analysis-time typing (r11)") {
    ptx.functions.ByteEntropyFn.register(spark)
    // independent reference: per-byte counts → the oracle's exact term
    // expression, summed as longs — the kernel must agree bit-for-bit
    def ref(bytes: Array[Byte]): Long = {
      if (bytes.isEmpty) return 0L
      val n = bytes.length
      bytes.groupBy(identity).values.map(_.length)
        .filter(c => c > 0 && c < n)
        .map { c =>
          val p = c.toDouble / n
          math.round(-p * math.log(p) * 1e6)
        }.sum
    }
    val rnd = new scala.util.Random(7)
    val payloads = (0 until 200).map { i =>
      val n = rnd.nextInt(300)
      // mix of regimes: uniform-random (high), ascii-ish (mid), runs (low)
      val b = new Array[Byte](n)
      i % 3 match {
        case 0 => rnd.nextBytes(b)
        case 1 => (0 until n).foreach(j => b(j) = (97 + rnd.nextInt(26)).toByte)
        case 2 => (0 until n).foreach(j => b(j) = (j / 50).toByte)
      }
      (i.toLong, b)
    }
    val got = payloads.toDF("id", "p")
      .select(col("id"), expr("byte_entropy_e6(p)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.foreach { case (id, b) =>
      assert(got(id) == ref(b), s"payload $id: ${got(id)} != ${ref(b)}")
    }
    // edges THROUGH THE KERNEL (not just the reference): empty and
    // single-valued payloads are exactly 0; a uniform-256 payload hits
    // exactly ln(256) e6-snapped per term
    val edges = Seq((1L, Array.emptyByteArray), (2L, Array.fill[Byte](40)(7)))
      .toDF("id", "p").select(col("id"), expr("byte_entropy_e6(p)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edges == Map(1L -> 0L, 2L -> 0L), s"kernel edge cases: $edges")
    val uniform = Array.tabulate[Byte](256)(_.toByte)
    val gotU = Seq((1L, uniform)).toDF("id", "p")
      .select(expr("byte_entropy_e6(p)")).collect()(0).getLong(0)
    assert(gotU == 256L * math.round((1.0 / 256) * math.log(256.0) * 1e6),
      s"uniform payload entropy $gotU")
    // non-binary input fails at ANALYSIS time with a clear message
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, "abc")).toDF("id", "t").select(expr("byte_entropy_e6(t)"))
    }
    assert(ex.getMessage.contains("binary"), ex.getMessage)
  }

  test("kernel registration is guarded: idempotent re-register, loud foreign-binding conflict (r11)") {
    // fresh session state so the shared test session's registry is untouched
    val s2 = spark.newSession()
    // repeated register no-ops (previously clobbered via createOrReplace)
    ptx.functions.TextGrams.register(s2)
    ptx.functions.TextGrams.register(s2)
    assert(s2.sql("SELECT size(gram_hashes(array('a','b','c','d','e','f')))")
      .collect()(0).getInt(0) == 2)
    // a session that bound the name to something ELSE must fail loudly:
    // silently clobbering loses the user's function, silently reusing it
    // would give wrong operator results
    val s3 = spark.newSession()
    s3.udf.register("gram_hashes", (xs: Seq[String]) => xs.length)
    val ex = intercept[IllegalStateException] {
      ptx.functions.TextGrams.register(s3)
    }
    assert(ex.getMessage.contains("gram_hashes"), ex.getMessage)
    val s4 = spark.newSession()
    s4.udf.register("cosine_sim", (a: Double, b: Double) => a * b)
    val ex2 = intercept[IllegalStateException] {
      ptx.functions.VectorOps.register(s4)
    }
    assert(ex2.getMessage.contains("cosine_sim"), ex2.getMessage)
  }

  test("cosine_sim rejects mismatched vector dimensions instead of truncating") {
    val ex = intercept[IllegalArgumentException] {
      ptx.functions.CosineSim.cosine(Array(1f, 2f, 3f), Array(1f, 2f))
    }
    assert(ex.getMessage.contains("length mismatch"))
  }

  test("explode of an array-returning expression acts as the generator surface") {
    val rows = Tables.documents(spark, TestSpark.SF)
      .select(explode(split(col("text"), " ")).as("w"))
      .limit(5).collect()
    assert(rows.length == 5 && rows.forall(_.getString(0).nonEmpty))
  }
}
