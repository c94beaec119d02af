package ptx.functions

/** STUB media decoder (builder prompt: media codecs are not available in
  * this environment). `features` stands in for an image/audio decode +
  * feature-extraction kernel; it is deterministic so tests and reruns are
  * stable. The Spark-side contract it exercises is real: bytes in →
  * fixed-width Array[Double] out, executed partition-wise with no state.
  *
  * A production build would replace the body with a real codec (e.g. JNI
  * to an image library) without touching any call site.
  */
object MediaDecode {
  val FeatureDim = 8

  /** Deterministic fake features: byte-value histogram moments over 8
    * equal-width buckets, normalized by payload length. */
  def features(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    if (bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) * FeatureDim / 256) += 1.0
      i += 1
    }
    var j = 0
    while (j < FeatureDim) { hist(j) /= bytes.length; j += 1 }
    hist
  }
}
