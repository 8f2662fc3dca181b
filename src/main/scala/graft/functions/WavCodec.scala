package graft.functions

/** A REAL tiny-format audio codec: RIFF/WAVE with 16-bit PCM — the
  * simplest widely-specified audio container (RIFF chunk walker,
  * "fmt " + "data" subchunks, little-endian samples). Together with
  * [[PpmCodec]] this de-stubs the multimodal decode step for audio
  * without external libraries: the parser walks the full chunk
  * grammar (unknown chunks like LIST/INFO skipped, odd-size pad
  * bytes honored, truncated files rejected, None-not-throw), so it
  * decodes any conforming PCM16 WAV, not just its own output.
  * Non-PCM codecs (float, ADPCM, extensible) intentionally return
  * None — a real deployment swaps in a full codec; the plumbing and
  * failure contract are what production needs.
  *
  * Scale note: decode is per-row JVM work inside `mapPartitions` —
  * embarrassingly parallel, no shuffle (reference admob-data-pipeline
  * has no media path; this is the training-data extension surface,
  * SURVEY rows 26/36/41/234).
  */
object WavCodec {

  /** Decoded audio: format + interleaved PCM16 samples. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Encode PCM16 samples as a conforming WAV file (PCM fmt 1). */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sampleRate $sampleRate")
    require(channels > 0 && channels <= 8, s"bad channels $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(Ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(Ascii))
    buf.put("fmt ".getBytes(Ascii)).putInt(16)
      .putShort(1.toShort)                        // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)          // byte rate
      .putShort((channels * 2).toShort)           // block align
      .putShort(16.toShort)                       // bits per sample
    buf.put("data".getBytes(Ascii)).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a WAV file. Returns None (never throws) on anything
    * non-conforming: wrong RIFF/WAVE magic, truncated chunks, a fmt
    * that is not integer PCM 16-bit, a data payload shorter than its
    * declared size, or data not aligned to whole frames. Chunks other
    * than fmt/data are skipped (LIST, fact, cue…), including the RIFF
    * odd-size pad byte. Trailing bytes after the walked chunks are
    * ignored, matching common reader behavior. */
  def decodeWav(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, Ascii)
    }
    if (tag4() != "RIFF") return None
    buf.getInt // declared RIFF size; per common practice not re-validated
    if (tag4() != "WAVE") return None
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var data: Option[Array[Short]] = None
    while ((fmt.isEmpty || data.isEmpty) && buf.remaining() >= 8) {
      val id = tag4()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p0 = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort
          val sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align: not trusted
          val bits = buf.getShort
          if (audioFormat != 1 || bits != 16 ||
            channels <= 0 || sampleRate <= 0) return None
          fmt = Some((sampleRate, channels.toInt))
          // skip extensions + pad; clamp so a truncated file (pad
          // byte absent at EOF) returns None instead of throwing
          buf.position(math.min(buf.limit(), p0 + size + (size & 1)))
        case "data" =>
          if (size % 2 != 0) return None
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = buf.getShort; i += 1 }
          data = Some(s)
          if ((size & 1) == 1 && buf.remaining() > 0) buf.get
        case _ => // skip chunk (clamped: truncated pad must not throw)
          buf.position(math.min(buf.limit(), buf.position() + size + (size & 1)))
      }
    }
    for {
      (rate, ch) <- fmt
      s <- data
      if s.length % ch == 0
    } yield Audio(rate, ch, s)
  }

  /** Deterministic scalar features over decoded PCM: duration (ms,
    * integer floor), peak |amplitude|, RMS on an integer centi-grid
    * (exact int64 Σs² — 2⁶³ holds past 10¹⁰ samples — then ONE
    * correctly-rounded sqrt), and the zero-crossing count (the
    * classic cheap pitch/noisiness proxy). All frames, channels
    * interleaved, matching the common mono analysis convention. */
  def features(a: Audio): (Long, Int, Long, Long) = {
    val n = a.samples.length
    val durationMs = n.toLong * 1000L / (a.sampleRate.toLong * a.channels)
    var peak = 0
    var ssq = 0L
    var zc = 0L
    var i = 0
    while (i < n) {
      val s = a.samples(i).toInt
      val as = math.abs(s)
      if (as > peak) peak = as
      ssq += s.toLong * s
      if (i > 0 && ((a.samples(i - 1) < 0 && s >= 0) ||
        (a.samples(i - 1) >= 0 && s < 0))) zc += 1
      i += 1
    }
    val rmsQ =
      if (n == 0) 0L
      else math.floor(math.sqrt(ssq.toDouble / n) * 100.0 + 0.5).toLong
    (durationMs, peak, rmsQ, zc)
  }

  /** Block-wise Goertzel single-bin DFT power — the classic O(N)
    * tone detector (DTMF/dial-tone/pilot-tone monitoring): for each
    * full `blockSize`-sample block, run the recurrence
    * s[i] = x[i] + (c·s₁ ≫ 14) − s₂ with the FIXED-POINT coefficient
    * c = round(2·cos(2πk/N)·2¹⁴) (StrictMath — bit-identical tables
    * on any JVM, the [[graft.operators.Multimodal]] pHash contract),
    * then block power |X(k)|² ≈ s₁² + s₂² − (c·s₁ ≫ 14)·s₂, clamped
    * at 0 (fixed-point roundoff can graze negative). Returns
    * (nBlocks, tonePower, totalPower) where totalPower = Σx² over the
    * SAME full blocks — the exact broadband energy the tone share is
    * judged against. Bounds: |s| ≤ N·32767·k_growth ≲ 2²⁶ on-bin at
    * N = 256, squares ≤ 2⁵²; the tail partial block is dropped from
    * BOTH powers (symmetric, documented). */
  def goertzel(a: Audio, k: Int, blockSize: Int): (Long, Long, Long) = {
    require(blockSize > 1 && k >= 0 && k <= blockSize / 2,
      s"need 0 <= k <= blockSize/2, got $k/$blockSize")
    val c = Math.round(
      2.0 * StrictMath.cos(2.0 * StrictMath.PI * k / blockSize) * (1 << 14))
    val n = a.samples.length
    val nBlocks = n / blockSize
    var tone = 0L; var total = 0L
    var b = 0
    while (b < nBlocks) {
      var s1 = 0L; var s2 = 0L
      var i = 0
      while (i < blockSize) {
        val x = a.samples(b * blockSize + i).toLong
        val s0 = x + ((c * s1) >> 14) - s2
        s2 = s1; s1 = s0
        total += x * x
        i += 1
      }
      val p = s1 * s1 + s2 * s2 - ((c * s1) >> 14) * s2
      tone += math.max(0L, p)
      b += 1
    }
    (nBlocks.toLong, tone, total)
  }
}
