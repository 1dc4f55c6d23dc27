package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Single-file CSV/TSV sinks matching the reference's one-file-per-output
  * contract (e.g. `{design-stem}_msstats_in.csv`, diann2msstats.py:128-130).
  *
  * Implementation: coalesce(1) into a temp dir, move the part file to the
  * target name. Deliberately a small-output convenience — large outputs
  * (ms_info at 100 TB) use the normal partitioned parquet writer instead.
  */
object SingleFileSink {

  def csv(df: DataFrame, target: String, sep: String = ","): Unit = {
    val tmp = Files.createTempDirectory("graft-csv-")
    val tmpOut = tmp.resolve("out").toString
    df.coalesce(1).write
      .option("header", true)
      .option("sep", sep)
      .option("emptyValue", "")
      .csv(tmpOut)
    val part = Files.list(Paths.get(tmpOut)).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmpOut"))
    Files.move(part, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    // best-effort temp cleanup
    Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
  }
}
