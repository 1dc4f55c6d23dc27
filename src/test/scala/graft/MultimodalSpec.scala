package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Binary media transport + stubbed decode metadata. */
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
}
