package graft.functions

/** A REAL tiny-format image codec: binary PPM (P6), the simplest
  * widely-specified raster format (magic "P6", ASCII header with
  * '#' comments, then maxval-scaled raw RGB triplets — the Netpbm
  * spec). This de-stubs the multimodal decode step without external
  * libraries: the parser handles the full header grammar (arbitrary
  * whitespace, comments anywhere between tokens, maxval 1..255) and
  * validates the pixel payload length, so it decodes any conforming
  * single-byte-depth P6 file, not just its own output.
  *
  * Scale note: decode is per-row JVM work inside `mapPartitions` —
  * embarrassingly parallel, no shuffle; the same shape a real codec
  * (libjpeg/ffmpeg via JNI or Pandas UDF) plugs into (reference
  * admob-data-pipeline has no media path; this is the training-data
  * extension surface, SURVEY rows 26/36/41).
  */
object PpmCodec {

  /** Decoded image: dimensions + raw RGB bytes (3·w·h, row-major). */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Encode RGB bytes as a conforming P6 file (maxval 255).
    * `rgb.length` must equal 3·w·h. */
  def encodeP6(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"payload ${rgb.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a P6 file. Returns None (never throws) on anything
    * non-conforming: wrong magic, malformed/overflowing header
    * tokens, maxval outside 1..255 (two-byte depth intentionally
    * unsupported), or a short pixel payload. Trailing bytes beyond
    * the pixel area are ignored, matching common reader behavior.
    * Pixels are normalized to maxval 255 (v*255/maxval, the standard
    * linear rescale) so downstream features are depth-independent. */
  def decodeP6(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
    // Netpbm header grammar: tokens separated by whitespace; a '#'
    // starts a comment running to end-of-line, allowed wherever
    // whitespace is.
    def skipWsAndComments(): Boolean = {
      var progressed = false
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) { pos += 1; progressed = true }
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          progressed = true
        } else go = false
      }
      progressed
    }
    def readInt(): Option[Int] = {
      if (!skipWsAndComments()) return None // a separator is REQUIRED
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return None
        pos += 1
        any = true
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval >= 1 && maxval <= 255
      // exactly ONE whitespace byte separates maxval from pixels
      // (the spec); comments are not allowed inside it
      if pos < bytes.length && isWs(bytes(pos))
      n = 3L * w * h
      if n <= Int.MaxValue && bytes.length - (pos + 1) >= n
    } yield {
      val start = pos + 1
      val rgb =
        if (maxval == 255 && bytes.length - start == n)
          java.util.Arrays.copyOfRange(bytes, start, start + n.toInt)
        else {
          val out = new Array[Byte](n.toInt)
          var i = 0
          while (i < out.length) {
            val v = bytes(start + i) & 0xff
            out(i) = (if (maxval == 255) v else v * 255 / maxval).toByte
            i += 1
          }
          out
        }
      Image(w, h, rgb)
    }
  }

  /** The decoded-image feature vector (8 floats, the fixed contract
    * the stub used): per-channel means and population stddevs
    * (R,G,B), mean luma (ITU-R BT.601 weights), aspect ratio w/h.
    * Accumulated in Double, emitted as Float — deterministic: one
    * fixed left-to-right pass, no parallel reduction. */
  def features(img: Image): Array[Float] = {
    val n = img.width * img.height
    val sum = new Array[Double](3)
    val sumSq = new Array[Double](3)
    var i = 0
    while (i < img.rgb.length) {
      val v = (img.rgb(i) & 0xff).toDouble
      val c = i % 3
      sum(c) += v
      sumSq(c) += v * v
      i += 1
    }
    val mean = Array.tabulate(3)(c => sum(c) / n)
    val std = Array.tabulate(3)(c =>
      math.sqrt(math.max(0.0, sumSq(c) / n - mean(c) * mean(c))))
    val luma = 0.299 * mean(0) + 0.587 * mean(1) + 0.114 * mean(2)
    Array(mean(0).toFloat, mean(1).toFloat, mean(2).toFloat,
      std(0).toFloat, std(1).toFloat, std(2).toFloat,
      luma.toFloat, (img.width.toDouble / img.height).toFloat)
  }
}
