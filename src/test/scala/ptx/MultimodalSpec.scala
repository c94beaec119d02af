package ptx

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import ptx.functions.MediaDecode

/** G14 multimodal coverage (referenced by Multimodal.scala and SURVEY §2 G14):
  * the real BMP decoder (r17) is asserted at the kernel level against
  * hand-computed pixel statistics AND end-to-end through the mapPartitions
  * path.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Hand-build a 24 bpp bottom-up BMP byte-for-byte (independent of
    * toBmp, so the decoder is tested against the FORMAT, not against the
    * sibling encoder). Pixels given top-down as (r, g, b) rows. */
  private def handBmp(pixels: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val stride = (w * 3 + 3) / 4 * 4
    val data = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(data).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- pixels.reverse) { // bottom-up storage
      for ((r, g, bl) <- row) b.put(bl.toByte).put(g.toByte).put(r.toByte)
      (0 until stride - w * 3).foreach(_ => b.put(0: Byte))
    }
    b.array()
  }

  test("decodeFeatures: hand-computed pixel stats on a hand-built 2x2 BMP (r17)") {
    // 2x2 image, top-down rows: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    // w=2 → stride 8 (2 pad bytes/row): the decoder must skip padding
    val bmp = handBmp(Seq(
      Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (255, 255, 255))))
    val f = MediaDecode.decodeFeatures(bmp)
    assert(f.length == MediaDecode.FeatureDim)
    assert(f(0) == 2.0 && f(1) == 2.0)                    // w, h from the header
    assert(f(2) == (0 + 0 + 255 + 255) / 4.0)             // mean B
    assert(f(3) == (0 + 255 + 0 + 255) / 4.0)             // mean G
    assert(f(4) == (255 + 0 + 0 + 255) / 4.0)             // mean R
    // luma per pixel: red 76.245, green 149.685, blue 29.07, white 255
    val lumas = Seq(0.299 * 255, 0.587 * 255, 0.114 * 255, 255.0)
    val lm = lumas.sum / 4
    assert(math.abs(f(5) - lm) < 1e-9)
    val lv = lumas.map(x => (x - lm) * (x - lm)).sum / 4
    assert(math.abs(f(6) - math.sqrt(lv)) < 1e-9)
    assert(f(7) == 2.0 / 4.0) // green (149.7) and white (255) clear luma >= 128
  }

  test("decodeFeatures: top-down row order (negative height) yields the same stats (r17)") {
    val bu = handBmp(Seq(Seq((10, 20, 30), (40, 50, 60)), Seq((70, 80, 90), (1, 2, 3))))
    // flip to top-down: negate height, rows stored first-to-last
    val td = bu.clone()
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    // re-lay rows in top-down order: swap the two stored rows
    val stride = 8
    val r0 = td.slice(54, 54 + stride); val r1 = td.slice(54 + stride, 54 + 2 * stride)
    System.arraycopy(r1, 0, td, 54, stride); System.arraycopy(r0, 0, td, 54 + stride, stride)
    val a = MediaDecode.decodeFeatures(bu); val b = MediaDecode.decodeFeatures(td)
    assert(a.toSeq.drop(2) == b.toSeq.drop(2), "row order must not change pixel stats")
    assert(b(1) == 2.0, "height feature reports magnitude")
  }

  test("decodeFeatures rejects malformed payloads loudly (r17)") {
    // wrong magic
    val bad = handBmp(Seq(Seq((1, 2, 3)))); bad(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](MediaDecode.decodeFeatures(bad))
      .getMessage.contains("not a BMP"))
    // truncated pixel array
    val short = handBmp(Seq(Seq((1, 2, 3), (4, 5, 6)), Seq((7, 8, 9), (10, 11, 12))))
    assert(intercept[IllegalArgumentException](
      MediaDecode.decodeFeatures(short.take(58))).getMessage.contains("truncated"))
    // unsupported flavor (8 bpp)
    val pal = handBmp(Seq(Seq((1, 2, 3))))
    java.nio.ByteBuffer.wrap(pal).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    assert(intercept[IllegalArgumentException](MediaDecode.decodeFeatures(pal))
      .getMessage.contains("unsupported"))
    // pixel-array offset pointing INTO the headers (r18, ADVICE r17):
    // without the guard the walk would silently read header bytes as
    // pixels — plausible-but-wrong features, the exact failure the
    // parser's loud-rejection contract exists to prevent
    val into = handBmp(Seq(Seq((1, 2, 3))))
    java.nio.ByteBuffer.wrap(into).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10, 12)
    assert(intercept[IllegalArgumentException](MediaDecode.decodeFeatures(into))
      .getMessage.contains("offset"))
    // crafted w×h whose Int stride·h product overflows into a small
    // positive number: must fail the (Long) truncation check, not walk
    // out of bounds with an ArrayIndexOutOfBoundsException
    val huge = handBmp(Seq(Seq((1, 2, 3))))
    java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 1 << 20).putInt(22, 1 << 12)
    assert(intercept[IllegalArgumentException](MediaDecode.decodeFeatures(huge))
      .getMessage.contains("truncated"))
  }

  test("toBmp round trip: encoded corpus bytes decode to the raw bytes' channel means (r17)") {
    // 12 raw bytes = 4 pixels exactly (no zero padding): 2x2 image
    val raw = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val f = MediaDecode.features(raw)
    assert(f(0) == 2.0 && f(1) == 2.0)
    // toBmp maps raw bytes 3p/3p+1/3p+2 to B/G/R
    assert(f(2) == (10 + 40 + 70 + 100) / 4.0) // mean B
    assert(f(3) == (20 + 50 + 80 + 110) / 4.0) // mean G
    assert(f(4) == (30 + 60 + 90 + 120) / 4.0) // mean R
    // a 13th byte forces a 5th pixel zero-padded and a 3-wide image
    val f2 = MediaDecode.features(raw :+ (5: Byte))
    assert(f2(0) == 3.0 && f2(1) == 2.0)
    // and the produced file is parseable by the hand-rolled header reader:
    // magic + declared size match
    val bmp = MediaDecode.toBmp(raw)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    assert(java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getInt(2) == bmp.length)
  }

  test("mm_decode_features: query output equals an in-JVM decode of the same text") {
    val rows = QueryRegistry.all("mm_decode_features")(spark, TestSpark.SF)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val texts = Tables.documents(spark, TestSpark.SF)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == texts.keySet, "every document must be decoded")
    // same rounding as Spark's round(): BigDecimal.valueOf (Double.toString
    // form), scale 6, HALF_UP
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    texts.foreach { case (id, text) =>
      val f = MediaDecode.features(text.getBytes("UTF-8"))
      val normSq = r6(f.map(x => x * x).sum)
      val f0 = r6(f(0))
      assert(rows(id) == ((normSq, f0)), s"doc $id: got ${rows(id)}, want ($normSq, $f0)")
    }
  }

  test("mm_decode_features: decode runs in the scan stage, before any shuffle") {
    val plan = QueryRegistry.all("mm_decode_features")(spark, TestSpark.SF)
      .queryExecution.executedPlan.toString()
    val mapIdx = plan.linesIterator.indexWhere(_.contains("MapPartitions"))
    assert(mapIdx >= 0, s"no MapPartitions in plan:\n$plan")
    // payload bytes must not cross an exchange: every Exchange sits ABOVE
    // (printed before) the MapPartitions node in the plan tree
    val exchangeBelow = plan.linesIterator.drop(mapIdx + 1).exists(_.contains("Exchange"))
    assert(!exchangeBelow, s"decode happens after a shuffle:\n$plan")
  }
}
