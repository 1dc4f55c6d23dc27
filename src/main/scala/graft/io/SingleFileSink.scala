package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Single-file sinks matching the reference's one-file-per-output contract
  * (e.g. `{design-stem}_msstats_in.csv`, diann2msstats.py:128-130; single
  * gzip parquet, mzml_statistics.py:292-294).
  *
  * Implementation: coalesce(1) into a temp dir, move the part file to the
  * target name, temp dir removed in a finally (a failed write doesn't leak
  * it). Deliberately a small-output convenience — large outputs (ms_info at
  * 100 TB) use the normal partitioned writers instead.
  */
object SingleFileSink {

  /** Run `write` into a temp dir, move its single part file to `target`. */
  private def single(target: String, suffix: String)(write: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft-single-")
    try {
      val tmpOut = tmp.resolve("out").toString
      write(tmpOut)
      val listing = Files.list(Paths.get(tmpOut))
      val part =
        try listing.iterator().asScala.find(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(suffix))
          .getOrElse(throw new IllegalStateException(s"no part file under $tmpOut"))
        finally listing.close()
      Files.move(part, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    } finally deleteRecursively(tmp)
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  def csv(df: DataFrame, target: String, sep: String = ","): Unit =
    single(target, suffix = "") { out =>
      df.coalesce(1).write
        .option("header", true)
        .option("sep", sep)
        .option("emptyValue", "")
        .csv(out)
    }

  def parquetGzip(df: DataFrame, target: String): Unit =
    single(target, suffix = ".parquet") { out =>
      df.coalesce(1).write.option("compression", "gzip").parquet(out)
    }
}
