package graft

import org.apache.spark.sql.functions._

import graft.ops.{MediaCodec, MediaSynth, Multimodal}

/** Binary media transport, the REAL JDK-codec decode (PNG/BMP/WAV), and
  * the remaining pseudo-decode stub for non-JDK formats.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withMediaMeta attaches typed metadata per row, batched per partition") {
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "媒体数据"))
      .toDF("id", "payload")
      .select(col("id"), col("payload").cast("binary").as("media"))
      .repartition(2)
    val out = Multimodal.withMediaMeta(df, "media").cache()
    assert(out.schema("meta").dataType === Multimodal.mediaMetaType)
    val r = out.filter(col("id") === 1).select("meta.*").head()
    assert(r.getAs[Int]("n_bytes") === 11)
    assert(r.getAs[String]("sha256") ===
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    // stub dimensions are deterministic and in the documented ranges
    val (w, h, f) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(r.getAs[Int]("width") === w && w >= 640 && w < 1920)
    assert(r.getAs[Int]("height") === h && h >= 360 && h < 1080)
    assert(r.getAs[Int]("n_frames") === f && f >= 1)
    // empty payload is fine
    assert(out.filter(col("id") === 2).select("meta.n_bytes").head().getInt(0) === 0)
  }

  test("frame sampling stub") {
    assert(Multimodal.sampleFrameIndexes(10, 3) === Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndexes(1, 5) === Seq(0))
  }

  test("real decode round-trips every fixture format to its closed form") {
    (0L until 30L).foreach { id =>
      val got = MediaCodec.decode(MediaSynth.payload(id))
      assert(got === Some(MediaSynth.expected(id)), s"id $id")
    }
    // one of each format actually appeared
    val kinds = (0L until 3L).map(id => MediaCodec.decode(MediaSynth.payload(id)).get.kind)
    assert(kinds.toSet === Set("png", "bmp", "wav"))
  }

  test("decode sniffs the magic number, never a side channel") {
    // a WAV payload handed to the decoder where a PNG id would sit still
    // decodes as WAV — routing is from bytes alone
    val wav = MediaSynth.payload(2L) // id 2 → wav
    assert(MediaCodec.decode(wav).get.kind === "wav")
    // unknown magic → None, not an exception (quarantine, don't kill tasks)
    assert(MediaCodec.decode("not a media file at all".getBytes("UTF-8")) === None)
    assert(MediaCodec.decode(null) === None)
    assert(MediaCodec.decode(Array[Byte](1, 2, 3)) === None)
    // a RIFF frame that is not 16-bit mono PCM is rejected, not mis-folded
    val mangled = wav.clone()
    mangled(22) = 2 // channels = 2 in the fmt chunk
    assert(MediaCodec.decode(mangled) === None)
  }

  test("nearest-neighbor resize matches the closed form and routes by modality") {
    (0L until 30L).foreach { id =>
      val got = MediaCodec.resizedChecksum(MediaSynth.payload(id), 12, 8)
      assert(got === MediaSynth.expectedResized(id, 12, 8), s"id $id")
    }
    // wav ids produce no image row; a true downsample (not identity)
    assert(MediaCodec.resizedChecksum(MediaSynth.payload(2L), 12, 8) === None)
    val full = MediaCodec.decode(MediaSynth.payload(0L)).get
    val small = MediaCodec.resizedChecksum(MediaSynth.payload(0L), 12, 8).get
    assert(small.width === Some(12) && small.height === Some(8))
    assert(small.checksum !== full.checksum)
  }

  test("audio features match the closed form: energy, frames, zero crossings") {
    (0L until 30L).foreach { id =>
      val got = MediaCodec.audioFeatures(MediaSynth.payload(id), 80)
      assert(got === MediaSynth.expectedAudio(id, 80), s"id $id")
    }
    assert(MediaCodec.audioFeatures(MediaSynth.payload(0L), 80) === None) // png id
    val a = MediaCodec.audioFeatures(MediaSynth.payload(2L), 80).get
    assert(a.nFrames >= 2 && a.energy > 0 && a.maxFrameEnergy <= a.energy)
  }

  test("malformed payloads of a known format quarantine as None, never throw") {
    // well-magic'd but truncated: PNG header with the image data cut off
    val png = MediaSynth.payload(0L)
    assert(MediaCodec.decode(png.take(30)) === None)
    // RIFF frame whose chunk length overruns the buffer
    val wav = MediaSynth.payload(2L)
    val overrun = wav.clone()
    overrun(16) = 0x7f; overrun(17) = 0x7f; overrun(18) = 0x7f; overrun(19) = 0x7f
    assert(MediaCodec.decode(overrun) === None)
    // negative chunk length
    val neg = wav.clone()
    neg(19) = 0xff.toByte
    assert(MediaCodec.decode(neg) === None)
    // data chunk declaring more samples than the payload carries
    val short = wav.clone().take(60)
    assert(MediaCodec.decode(short) === None)
  }

  test("decodedFixtures runs the decode distributed with the declared schema") {
    val df = Multimodal.decodedFixtures(spark, 24, partitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.schema === Multimodal.decodedMetaType)
    val rows = df.collect()
    assert(rows.length === 24)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    (0L until 24L).foreach { id =>
      val m = MediaSynth.expected(id)
      val r = byId(id)
      assert(r.getString(1) === m.kind, s"id $id kind")
      assert(r.getLong(8) === m.checksum, s"id $id checksum")
    }
  }
}
