package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watch-folder streaming ingestion on the mzml DSv2 source: each
  * AvailableNow run drains only the files that appeared since the committed
  * offset, and rows match the batch scan of the same files.
  */
class MzmlStreamSpec extends SparkSpec {

  // file sink + shared checkpoint: each drain appends only what the
  // committed offset hasn't seen (memory sink can't recover a checkpoint)
  private def drain(dir: String, ckpt: String, sink: String): Seq[(String, Int)] = {
    val q = spark.readStream
      .format("graft.sources.mzml.MzmlDataSource")
      .option("path", dir)
      .load()
      .select(col("file_name"), col("spectrum_index"))
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
  }

  test("AvailableNow drains new files only; rows equal the batch scan") {
    val dir = Files.createTempDirectory("mzml-watch")
    val ckpt = Files.createTempDirectory("mzml-ckpt").toString
    val sink = Files.createTempDirectory("mzml-sink").toString
    MzmlFixtures.standard(dir, "run1.mzML")

    val batch1 = spark.read.format("graft.sources.mzml.MzmlDataSource")
      .option("path", s"$dir/run1.mzML").load()
      .select(col("file_name"), col("spectrum_index")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(batch1.nonEmpty)

    val got1 = drain(dir.toString, ckpt, sink)
    assert(got1.sorted === batch1.sorted)

    // same checkpoint, no new files → nothing appended
    assert(drain(dir.toString, ckpt, sink).sorted === batch1.sorted)

    // drop a new run into the folder: exactly its spectra are appended
    MzmlFixtures.standard(dir, "run2.mzML")
    val got3 = drain(dir.toString, ckpt, sink)
    val appended = got3.diff(got1)
    assert(appended.nonEmpty)
    assert(appended.map(_._1).toSet === Set("run2.mzML"))
    assert(appended.size === batch1.size) // same fixture content
  }
}
