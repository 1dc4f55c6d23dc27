package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/** REAL media decode with JDK-only codecs — no external libraries: PNG and
  * BMP through `javax.imageio` (both lossless for 8-bit RGB, so decoded
  * pixels are exactly the encoded ones), WAV PCM through a direct RIFF
  * chunk parse. Each decode reads ONLY the payload bytes (format sniffed
  * from the magic number, never from a side channel), and reduces the
  * decoded content to a closed-form checksum — a position-weighted fold
  * over pixels / samples that any bit flip in any pixel changes.
  *
  * The paired [[MediaSynth]] generates payloads from pure arithmetic, so
  * the full decode result (dimensions, channels, sample counts, checksum)
  * is known in closed form WITHOUT decoding — which is what lets the
  * `mm_decode_meta` query carry a DuckDB VALUES oracle over a codec DuckDB
  * does not have: the engine must sniff, decode, and fold every payload
  * back to exactly the generator's arithmetic.
  */
object MediaCodec {

  /** Decoded media facts. Image fields null for audio and vice versa. */
  case class Decoded(
      kind: String,
      width: Option[Int], height: Option[Int], channels: Int,
      nSamples: Option[Int], sampleRate: Option[Int], durationUs: Option[Long],
      checksum: Long)

  /** Sniff + decode a payload; None for formats outside the JDK codecs
    * AND for malformed payloads of a known format (truncated image data,
    * RIFF chunks overrunning the buffer) — a real pipeline routes those
    * rows to a quarantine sink rather than killing the task, so no
    * payload content may ever throw out of here.
    */
  def decode(payload: Array[Byte]): Option[Decoded] =
    try {
      if (payload == null || payload.length < 12) None
      else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' &&
        payload(3) == 'G') decodeImage(payload, "png")
      else if (payload(0) == 'B' && payload(1) == 'M') decodeImage(payload, "bmp")
      else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E') decodeWav(payload)
      else None
    } catch {
      // truncated/corrupt content inside a well-magic'd payload: ImageIO
      // IIOExceptions, chunk walks running off the buffer
      case _: java.io.IOException | _: IndexOutOfBoundsException |
          _: IllegalArgumentException | _: java.nio.BufferUnderflowException => None
    }

  /** Position-weighted RGB fold: Σ (y·w + x + 1) · rgb24(x,y). Weighting
    * by position makes the checksum order-sensitive (a transposed decode
    * cannot collide), while staying exactly computable in closed form —
    * bounded by w·h·2^24·(w·h) ≪ 2^63 at fixture sizes.
    */
  private def decodeImage(payload: Array[Byte], kind: String): Option[Decoded] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var acc = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          acc += (y.toLong * w + x + 1) * (img.getRGB(x, y) & 0xffffff)
          x += 1
        }
        y += 1
      }
      Some(Decoded(kind, Some(w), Some(h), img.getRaster.getNumBands,
        None, None, None, acc))
    }
  }

  /** Nearest-neighbor resize of a decoded PNG/BMP payload to (ow, oh),
    * reduced to the same position-weighted RGB fold as [[decode]] — the
    * image feature-extract stage (thumbnail / fixed-input-size prep) with
    * the JDK codec in front. src(x·w/ow, y·h/oh) indexing keeps every
    * output pixel an exact copy of one input pixel, so the resized
    * checksum stays closed-form computable from the generator arithmetic.
    * None for non-image payloads.
    */
  def resizedChecksum(payload: Array[Byte], ow: Int, oh: Int): Option[Decoded] =
    decode(payload) match {
      case Some(m) if m.kind == "png" || m.kind == "bmp" =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        val (w, h) = (img.getWidth, img.getHeight)
        var acc = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            acc += (y.toLong * ow + x + 1) *
              (img.getRGB(x * w / ow, y * h / oh) & 0xffffff)
            x += 1
          }
          y += 1
        }
        Some(m.copy(width = Some(ow), height = Some(oh), checksum = acc))
      case _ => None
    }

  /** 64-bit average-hash (aHash) perceptual fingerprint of an image
    * payload: nearest-neighbor resample to the 8×8 grid (the same
    * src(x·w/8, y·h/8) index map as [[resizedChecksum]]), per-cell
    * integer luma (r+g+b), bit (y·8+x) set iff 64·luma ≥ Σ lumas — the
    * integer-exact form of "luma ≥ mean", so no division ever rounds a
    * boundary bit differently across engines. None for non-images.
    */
  def aHash(payload: Array[Byte]): Option[Long] = imageFold(payload)(aHashOf)

  /** Decode an image payload and apply a (w, h, rgb) hash fold; None for
    * non-images. The folds themselves ([[aHashOf]]/[[dHashOf]]/[[pHashOf]])
    * are shared with the closed-form generator replays in [[MediaSynth]],
    * so the engine path and the oracle can never drift on the grid/threshold
    * arithmetic — what the oracle still forces the engine to do is really
    * decode the staged bytes back into those pixels.
    */
  private def imageFold(payload: Array[Byte])(
      f: (Int, Int, (Int, Int) => Int) => Long): Option[Long] =
    decode(payload) match {
      case Some(m) if m.kind == "png" || m.kind == "bmp" =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        Some(f(img.getWidth, img.getHeight, (x, y) => img.getRGB(x, y)))
      case _ => None
    }

  private[ops] def aHashOf(w: Int, h: Int, rgb: (Int, Int) => Int): Long = {
    val luma = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val c = rgb(x * w / 8, y * h / 8) & 0xffffff
        val l = ((c >> 16) & 0xff).toLong + ((c >> 8) & 0xff) + (c & 0xff)
        luma(y * 8 + x) = l
        total += l
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (luma(i) * 64 >= total) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** 64-bit difference-hash (dHash) perceptual fingerprint: nearest-
    * neighbor resample to a 9×8 luma grid, bit (y·8+x) set iff
    * luma(x+1, y) > luma(x, y) — the horizontal-gradient hash that
    * separates smooth images aHash collapses (aHash thresholds against
    * the global mean, so any monotone gradient hashes half-and-half;
    * dHash reads the gradient's DIRECTION cell by cell). Same integer
    * arithmetic discipline; None for non-images.
    */
  def dHash(payload: Array[Byte]): Option[Long] = imageFold(payload)(dHashOf)

  private[ops] def dHashOf(w: Int, h: Int, rgb: (Int, Int) => Int): Long = {
    def luma(gx: Int, gy: Int): Long = {
      val c = rgb(gx * w / 9, gy * h / 8) & 0xffffff
      ((c >> 16) & 0xff).toLong + ((c >> 8) & 0xff) + (c & 0xff)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) hash |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit DCT perceptual hash (the REAL pHash): nearest-neighbor
    * resample to a 32×32 luma grid, separable 2-D DCT-II, keep the
    * top-left 8×8 low-frequency block, bit (q·8+p) set iff coefficient
    * F(p,q) exceeds the MEDIAN of the 63 AC coefficients (DC excluded —
    * it only encodes overall brightness). Unlike aHash (global mean) and
    * dHash (local gradient direction), the DCT block reads the image's
    * coarse SPECTRUM, which survives blur/resize/brightness edits.
    *
    * Integer-exact: the cosine basis is fixed-point at 2^20
    * ([[dctBasis]] — rounded once at class init, so every JVM and the
    * closed-form oracle replay share identical basis integers), and the
    * folds are pure Long arithmetic with no overflow (|F| ≤ 765 · 2^40 ·
    * 1024 < 2^63). None for non-images.
    */
  def pHash(payload: Array[Byte]): Option[Long] = imageFold(payload)(pHashOf)

  /** DCT-II basis rows u = 0..7 over x = 0..31, fixed point at 2^20:
    * C(u, x) = round(cos(π·(2x+1)·u / 64) · 2^20).
    */
  private[ops] val dctBasis: Array[Array[Long]] = Array.tabulate(8, 32)((u, x) =>
    Math.round(Math.cos(Math.PI * (2 * x + 1) * u / 64.0) * (1L << 20)))

  private[ops] def pHashOf(w: Int, h: Int, rgb: (Int, Int) => Int): Long = {
    // 32×32 nearest-neighbor luma grid (same src-index map as the other
    // folds, just a denser grid for the transform)
    val luma = Array.tabulate(32, 32) { (y, x) =>
      val c = rgb(x * w / 32, y * h / 32) & 0xffffff
      ((c >> 16) & 0xff).toLong + ((c >> 8) & 0xff) + (c & 0xff)
    }
    // separable DCT: rows first (t(p)(y) = Σ_x luma(y)(x)·C(p,x)), then
    // columns — only the 8 lowest frequencies each way are ever computed
    val t = Array.ofDim[Long](8, 32)
    var p = 0
    while (p < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += luma(y)(x) * dctBasis(p)(x); x += 1 }
        t(p)(y) = s
        y += 1
      }
      p += 1
    }
    val f = new Array[Long](64)
    var q = 0
    while (q < 8) {
      var pp = 0
      while (pp < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += t(pp)(y) * dctBasis(q)(y); y += 1 }
        f(q * 8 + pp) = s
        pp += 1
      }
      q += 1
    }
    // median of the 63 AC coefficients: element 31 of the sorted range —
    // strict > against it balances the bits near 32/32
    val ac = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (f(i) > med) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Audio feature facts: frame count at `window` samples per frame, zero
    * crossings, total energy, loudest-frame energy. */
  case class AudioFeatures(
      kind: String, nFrames: Int, zeroCrossings: Int,
      energy: Long, maxFrameEnergy: Long)

  /** Windowed audio feature extraction over a decoded WAV payload: Σ s²
    * energy (total and per-`window`-sample-frame max) and the
    * zero-crossing count (sign(0) counts as positive — the convention the
    * closed form replays). All integer arithmetic — no float boundary
    * anywhere, so both engines agree bit for bit. None for non-WAV.
    */
  def audioFeatures(payload: Array[Byte], window: Int): Option[AudioFeatures] =
    decode(payload) match {
      case Some(m) if m.kind == "wav" =>
        val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
        // re-walk to the data chunk (decode validated the layout already)
        buf.position(12)
        var dataOff = -1
        var dataLen = 0
        while (dataOff < 0) {
          val tag = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
          val len = buf.getInt()
          if (tag == "data") { dataOff = buf.position(); dataLen = len }
          else buf.position(buf.position() + len)
        }
        val n = dataLen / 2
        var energy = 0L
        var maxFrame = 0L
        var frame = 0L
        var zc = 0
        var prevNonNeg = true
        var i = 0
        while (i < n) {
          val s = buf.getShort(dataOff + 2 * i).toLong
          energy += s * s
          frame += s * s
          if (i > 0 && (s >= 0) != prevNonNeg) zc += 1
          prevNonNeg = s >= 0
          if ((i + 1) % window == 0 || i == n - 1) {
            if (frame > maxFrame) maxFrame = frame
            frame = 0L
          }
          i += 1
        }
        Some(AudioFeatures("wav", (n + window - 1) / window, zc, energy, maxFrame))
      case _ => None
    }

  /** 64-bit AUDIO FINGERPRINT — the audio twin of [[pHash]], from the
    * Haitsma-Kalker family reduced to one sub-fingerprint: full 8-sample
    * frames at hop 2 (75% overlap), frame energy Σ s², bits = the SIGN of
    * consecutive energy deltas starting at the ANCHOR (the first frame of
    * maximum energy), MSB-first, 0-padded past the last frame. Why each
    * piece: the overlap makes a time shift that is a multiple of the hop
    * land content frames exactly on the original grid (a 4-sample silence
    * prepend adds two low-energy partials and re-indexes everything else
    * by 2); the peak anchor cancels that re-indexing, so a shifted
    * re-upload fingerprints IDENTICALLY; and sign-of-delta survives any
    * monotone amplitude mapping, so requantization flips only near-tie
    * bits — a small Hamming distance, which is what the banded verify
    * downstream is for. The anchor is the argmax over frames that still
    * have 64 deltas after them — an unrestricted argmax near the clip end
    * pads most bits to 0, and those degenerate mostly-zero fingerprints
    * collide ACROSS disjoint clips (observed on the first cut: a
    * five-clip false cluster at Hamming ≤ 6). All integer arithmetic,
    * shared verbatim with the MediaSynth closed form.
    */
  private[ops] def audioFpOf(samples: Array[Short]): Long = {
    val n = samples.length
    val nf = if (n < FpWindow) 0 else (n - FpWindow) / FpHop + 1
    if (nf < 2) return 0L
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var i = 0
      while (i < FpWindow) {
        val s = samples(f * FpHop + i).toLong
        acc += s * s
        i += 1
      }
      e(f) = acc
      f += 1
    }
    // last frame eligible as anchor: needs 64 deltas (65 frames) after it
    val hi = math.max(0, nf - 65)
    var anchor = 0
    f = 1
    while (f <= hi) { if (e(f) > e(anchor)) anchor = f; f += 1 }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (anchor + b + 1 < nf && e(anchor + b + 1) > e(anchor + b))
        fp |= 1L << (63 - b)
      b += 1
    }
    fp
  }

  private val FpWindow = 8
  private val FpHop = 2

  /** Fingerprint of a WAV payload via the real decode path; None for
    * non-WAV (the route-by-modality shape) and malformed payloads.
    */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    try {
      decode(payload) match {
        case Some(m) if m.kind == "wav" =>
          val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
          buf.position(12) // decode() validated the chunk layout
          var dataOff = -1
          var dataLen = 0
          while (dataOff < 0) {
            val tag = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
            val len = buf.getInt()
            if (tag == "data") { dataOff = buf.position(); dataLen = len }
            else buf.position(buf.position() + len)
          }
          val n = dataLen / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(dataOff + 2 * i); i += 1 }
          Some(audioFpOf(samples))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Canonical 44-byte-header RIFF/WAVE parse, 16-bit mono PCM: walk the
    * chunk list to `fmt ` and `data` (never assume a fixed layout beyond
    * the RIFF frame), fold samples as Σ (i+1)·sᵢ.
    */
  private def decodeWav(payload: Array[Byte]): Option[Decoded] = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12) // past RIFF size + WAVE
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (buf.remaining() >= 8 && dataOff < 0) {
      val tag = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val len = buf.getInt()
      tag match {
        case "fmt " =>
          val p0 = buf.position()
          buf.getShort() // audio format (1 = PCM)
          channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort() // byte rate, block align
          bits = buf.getShort()
          buf.position(p0 + len)
        case "data" =>
          dataOff = buf.position()
          dataLen = len
        case _ =>
          buf.position(buf.position() + len)
      }
    }
    if (dataOff < 0 || bits != 16 || channels != 1) None
    else {
      val n = dataLen / 2
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += (i + 1L) * buf.getShort(dataOff + 2 * i)
        i += 1
      }
      Some(Decoded("wav", None, None, channels, Some(n), Some(sampleRate),
        Some(n.toLong * 1000000L / sampleRate), acc))
    }
  }
}

/** Deterministic media payload generator + the closed form of what
  * [[MediaCodec.decode]] must recover from each payload. Pixels and
  * samples are pure arithmetic in (media_id, position); PNG/BMP encode
  * through the same `javax.imageio` writers any JDK carries, WAV is a
  * hand-built canonical RIFF frame — every engine and JVM produces
  * byte-identical content for the same id.
  */
object MediaSynth {

  val SampleRate = 8000

  def kindOf(id: Long): String = (id % 3) match {
    case 0 => "png"
    case 1 => "bmp"
    case _ => "wav"
  }

  // image geometry + per-channel pixel arithmetic, distinct per format so
  // a png/bmp routing mixup cannot hash-collide
  private def pngDims(id: Long) = (16 + (id % 8).toInt, 12 + (id % 5).toInt)
  private def bmpDims(id: Long) = (20 + (id % 6).toInt, 10 + (id % 7).toInt)
  private def pngRgb(id: Long, x: Int, y: Int): Int =
    (((x * 3 + y * 5 + id) % 256).toInt << 16) |
      (((x * 7 + y + id * 11) % 256).toInt << 8) |
      ((x + y * 13 + id * 3) % 256).toInt
  private def bmpRgb(id: Long, x: Int, y: Int): Int =
    (((x + y + id) % 256).toInt << 16) |
      (((x * 2 + y * 3 + id * 5) % 256).toInt << 8) |
      ((x * 5 + y * 2 + id * 7) % 256).toInt
  private def wavSamples(id: Long): Array[Short] = {
    val n = 160 + ((id * 7) % 80).toInt
    Array.tabulate(n)(i => (((i.toLong * i + id * 13) % 4001) - 2000).toShort)
  }

  /** The payload for `id` (format by id % 3). */
  def payload(id: Long): Array[Byte] = kindOf(id) match {
    case "wav" => wavBytes(wavSamples(id))
    case kind =>
      val (w, h) = if (kind == "png") pngDims(id) else bmpDims(id)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, if (kind == "png") pngRgb(id, x, y) else bmpRgb(id, x, y))
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      require(ImageIO.write(img, kind, out), s"no JDK $kind writer")
      out.toByteArray
  }

  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(SampleRate).putInt(SampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** What resizedChecksum(payload(id), ow, oh) must return for an image
    * id — the nearest-neighbor index map replayed over the pixel
    * arithmetic. None for WAV ids.
    */
  def expectedResized(id: Long, ow: Int, oh: Int): Option[MediaCodec.Decoded] =
    kindOf(id) match {
      case "wav" => None
      case kind =>
        val (w, h) = if (kind == "png") pngDims(id) else bmpDims(id)
        var acc = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val (sx, sy) = (x * w / ow, y * h / oh)
            acc += (y.toLong * ow + x + 1) *
              (if (kind == "png") pngRgb(id, sx, sy) else bmpRgb(id, sx, sy))
            x += 1
          }
          y += 1
        }
        Some(expected(id).copy(width = Some(ow), height = Some(oh), checksum = acc))
    }

  /** The (w, h, rgb) triple of an image id's generator arithmetic — the
    * no-codec source the closed-form hash replays fold over. None for WAV.
    */
  private def imageOf(id: Long): Option[(Int, Int, (Int, Int) => Int)] =
    kindOf(id) match {
      case "wav" => None
      case "png" =>
        val (w, h) = pngDims(id); Some((w, h, (x, y) => pngRgb(id, x, y)))
      case _ =>
        val (w, h) = bmpDims(id); Some((w, h, (x, y) => bmpRgb(id, x, y)))
    }

  /** What aHash(payload(id)) must return for an image id — the 8×8
    * nearest-neighbor luma grid replayed over the pixel arithmetic, no
    * codec involved (the fold itself is MediaCodec's, shared by
    * construction). None for WAV ids.
    */
  def expectedAHash(id: Long): Option[Long] =
    imageOf(id).map { case (w, h, rgb) => MediaCodec.aHashOf(w, h, rgb) }

  /** What dHash(payload(id)) must return for an image id — the 9×8
    * horizontal-gradient grid replayed over the pixel arithmetic.
    */
  def expectedDHash(id: Long): Option[Long] =
    imageOf(id).map { case (w, h, rgb) => MediaCodec.dHashOf(w, h, rgb) }

  /** What pHash(payload(id)) must return for an image id — the 32×32
    * grid + fixed-point DCT replayed over the pixel arithmetic.
    */
  def expectedPHash(id: Long): Option[Long] =
    imageOf(id).map { case (w, h, rgb) => MediaCodec.pHashOf(w, h, rgb) }

  // ---- TEXTURED image family (hash-scheme audit's second corpus) ----
  // The base fixtures are linear ramps in x, which DEGENERATE dHash (the
  // horizontal gradient direction is globally constant — the r10 audit's
  // own finding), so scheme comparisons on them say nothing about
  // discrimination. These quadratic + cross-term pixels make the local
  // gradient direction vary cell to cell: every scheme has signal, and
  // the audit can measure collision rates where the schemes actually
  // differ. All images (no WAV routing — this corpus exists only to
  // compare image hashes), png/bmp alternating by id parity.

  def texKindOf(id: Long): String = if (id % 2 == 0) "png" else "bmp"
  private def texDims(id: Long) = (24 + (id % 7).toInt, 18 + (id % 5).toInt)
  private def texRgb(id: Long, x: Int, y: Int): Int =
    (((x * x * 3 + y * y * 7 + x * y + id * 13) % 256).toInt << 16) |
      (((x * x + y * y * 5 + x * y * 3 + id * 29) % 256).toInt << 8) |
      ((x * x * 7 + y * y + x * y * 11 + id * 5) % 256).toInt

  /** The textured payload for `id` — real PNG/BMP bytes, content
    * arithmetic in id so staging is identical across JVMs and the
    * closed-form hashes are exact.
    */
  def texturedPayload(id: Long): Array[Byte] = {
    val kind = texKindOf(id)
    val (w, h) = texDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, texRgb(id, x, y))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, kind, out), s"no JDK $kind writer")
    out.toByteArray
  }

  private def texImageOf(id: Long): (Int, Int, (Int, Int) => Int) = {
    val (w, h) = texDims(id)
    (w, h, (x, y) => texRgb(id, x, y))
  }

  /** Closed-form aHash/dHash/pHash of the textured family. */
  def expectedAHashTex(id: Long): Long = {
    val (w, h, rgb) = texImageOf(id); MediaCodec.aHashOf(w, h, rgb)
  }
  def expectedDHashTex(id: Long): Long = {
    val (w, h, rgb) = texImageOf(id); MediaCodec.dHashOf(w, h, rgb)
  }
  def expectedPHashTex(id: Long): Long = {
    val (w, h, rgb) = texImageOf(id); MediaCodec.pHashOf(w, h, rgb)
  }

  /** The audio DEDUP corpus's clip arithmetic — deliberately NOT
    * [[wavSamples]]: there the i² term dominates and every id shares one
    * energy envelope, so sign-of-delta fingerprints of DISJOINT clips
    * collide (the audio twin of the ramp corpus degenerating dHash in
    * mm_hash_scheme_audit — structured content must be audited per
    * corpus). Here the quadratic/linear coefficients depend on id, so
    * each clip has its own envelope shape and disjoint fingerprints land
    * ~32 bits apart.
    */
  private def audioClipSamples(id: Long): Array[Short] = {
    val n = 160 + ((id * 7) % 80).toInt
    val a = 1L + id % 13
    val b = (id * 31) % 101
    Array.tabulate(n)(i =>
      (((i.toLong * i * a + i * b + id * 17) % 4001) - 2000).toShort)
  }

  /** The AUDIO near-dup corpus's planted re-uploads (mm_audio_dedup):
    * every wav id ≡ 2 (mod 30) re-arrives TIME-SHIFTED (4 samples of
    * leading silence — two fingerprint hops, the "trim/pad" edit) under
    * media_id + 1000, and every wav id ≡ 8 (mod 30) re-arrives
    * REQUANTIZED (low bit cleared — the lossy re-encode stand-in) under
    * media_id + 2000. Disjoint base clips stay disjoint. Samples for any
    * corpus id, base or planted:
    */
  def audioDupSamples(mid: Long): Option[Array[Short]] = {
    val base = if (mid >= 2000L) mid - 2000L else if (mid >= 1000L) mid - 1000L else mid
    if (kindOf(base) != "wav") None
    else if (mid >= 2000L) Some(audioClipSamples(base).map(s => (s & ~1).toShort))
    else if (mid >= 1000L) Some(Array.fill[Short](4)(0) ++ audioClipSamples(base))
    else Some(audioClipSamples(base))
  }

  /** The planted-dup id spine of the audio corpus for base ids < n. */
  def audioDupIds(n: Long): Seq[Long] =
    (0L until n).filter(id => kindOf(id) == "wav" && id % 30 == 2).map(_ + 1000L) ++
      (0L until n).filter(id => kindOf(id) == "wav" && id % 30 == 8).map(_ + 2000L)

  /** The payload for an audio-corpus id: wav ids (base or planted
    * re-upload) encode their clip samples; image ids carry the TEXTURED
    * family (the mixed-modality table the hash scan routes by). Textured,
    * not ramp: the gate built over this corpus probes pHash BANDS, and
    * ramp images' correlated low-frequency DCT blocks collide 16-bit
    * bands across DISTINCT ids (measured: 16 image false flags out of 73
    * under the two-band rule) — the same corpus degeneracy
    * mm_hash_scheme_audit documents, dodged the same way.
    */
  def audioCorpusPayload(mid: Long): Array[Byte] =
    audioDupSamples(mid).map(wavBytes).getOrElse(texturedPayload(mid))

  /** The decoded kind of [[audioCorpusPayload]]'s id (planted ids are
    * always wav; image ids follow the textured family's parity rule).
    */
  def audioCorpusKind(mid: Long): String =
    if (mid >= 1000L || kindOf(mid) == "wav") "wav" else texKindOf(mid)

  /** What audioFingerprint(audioCorpusPayload(mid)) must return — the
    * shared fold ([[MediaCodec.audioFpOf]]) over the sample arithmetic,
    * no codec involved. None for image ids.
    */
  def expectedAudioFp(mid: Long): Option[Long] =
    audioDupSamples(mid).map(MediaCodec.audioFpOf)

  /** What audioFeatures(payload(id), window) must return for a WAV id —
    * the same integer folds over the sample arithmetic. None for images.
    */
  def expectedAudio(id: Long, window: Int): Option[MediaCodec.AudioFeatures] =
    kindOf(id) match {
      case "wav" =>
        val s = wavSamples(id)
        val energy = s.iterator.map(v => v.toLong * v).sum
        val maxFrame = s.grouped(window).map(_.iterator.map(v => v.toLong * v).sum).max
        val zc = (1 until s.length).count(i => (s(i) >= 0) != (s(i - 1) >= 0))
        Some(MediaCodec.AudioFeatures(
          "wav", (s.length + window - 1) / window, zc, energy, maxFrame))
      case _ => None
    }

  /** What decode(payload(id)) must return — no codec involved: image
    * checksums replay the pixel arithmetic (PNG and BMP are lossless for
    * 8-bit RGB), audio checksums the sample arithmetic.
    */
  def expected(id: Long): MediaCodec.Decoded = kindOf(id) match {
    case "wav" =>
      val s = wavSamples(id)
      val acc = s.iterator.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum
      MediaCodec.Decoded("wav", None, None, 1, Some(s.length), Some(SampleRate),
        Some(s.length.toLong * 1000000L / SampleRate), acc)
    case kind =>
      val (w, h) = if (kind == "png") pngDims(id) else bmpDims(id)
      var acc = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          acc += (y.toLong * w + x + 1) *
            (if (kind == "png") pngRgb(id, x, y) else bmpRgb(id, x, y))
          x += 1
        }
        y += 1
      }
      MediaCodec.Decoded(kind, Some(w), Some(h), 3, None, None, None, acc)
  }
}
