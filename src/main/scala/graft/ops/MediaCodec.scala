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
  def aHash(payload: Array[Byte]): Option[Long] =
    decode(payload) match {
      case Some(m) if m.kind == "png" || m.kind == "bmp" =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val luma = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val rgb = img.getRGB(x * w / 8, y * h / 8) & 0xffffff
            val l = ((rgb >> 16) & 0xff).toLong + ((rgb >> 8) & 0xff) + (rgb & 0xff)
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
        Some(hash)
      case _ => None
    }

  /** 64-bit difference-hash (dHash) perceptual fingerprint: nearest-
    * neighbor resample to a 9×8 luma grid, bit (y·8+x) set iff
    * luma(x+1, y) > luma(x, y) — the horizontal-gradient hash that
    * separates smooth images aHash collapses (aHash thresholds against
    * the global mean, so any monotone gradient hashes half-and-half;
    * dHash reads the gradient's DIRECTION cell by cell). Same integer
    * arithmetic discipline; None for non-images.
    */
  def dHash(payload: Array[Byte]): Option[Long] =
    decode(payload) match {
      case Some(m) if m.kind == "png" || m.kind == "bmp" =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        val (w, h) = (img.getWidth, img.getHeight)
        def luma(gx: Int, gy: Int): Long = {
          val rgb = img.getRGB(gx * w / 9, gy * h / 8) & 0xffffff
          ((rgb >> 16) & 0xff).toLong + ((rgb >> 8) & 0xff) + (rgb & 0xff)
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
        Some(hash)
      case _ => None
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

  /** What aHash(payload(id)) must return for an image id — the 8×8
    * nearest-neighbor luma grid replayed over the pixel arithmetic, no
    * codec involved. None for WAV ids.
    */
  def expectedAHash(id: Long): Option[Long] = kindOf(id) match {
    case "wav" => None
    case kind =>
      val (w, h) = if (kind == "png") pngDims(id) else bmpDims(id)
      val luma = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val rgb = (if (kind == "png") pngRgb(id, x * w / 8, y * h / 8)
                     else bmpRgb(id, x * w / 8, y * h / 8)) & 0xffffff
          val l = ((rgb >> 16) & 0xff).toLong + ((rgb >> 8) & 0xff) + (rgb & 0xff)
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
      Some(hash)
  }

  /** What dHash(payload(id)) must return for an image id — the 9×8
    * horizontal-gradient grid replayed over the pixel arithmetic.
    */
  def expectedDHash(id: Long): Option[Long] = kindOf(id) match {
    case "wav" => None
    case kind =>
      val (w, h) = if (kind == "png") pngDims(id) else bmpDims(id)
      def luma(gx: Int, gy: Int): Long = {
        val rgb = (if (kind == "png") pngRgb(id, gx * w / 9, gy * h / 8)
                   else bmpRgb(id, gx * w / 9, gy * h / 8)) & 0xffffff
        ((rgb >> 16) & 0xff).toLong + ((rgb >> 8) & 0xff) + (rgb & 0xff)
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
      Some(hash)
  }

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
