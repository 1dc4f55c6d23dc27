package graft.cli

import org.apache.spark.sql.SparkSession

import graft.ops.{DiannCfg, DiannToMsstats, FeatureDetect, MzmlStats, PsmConvert, SampleExtract, SdrfValidator}

/** CLI mirroring the reference's six commands (quantmsutilsc.py:17-27), same
  * flags and exit-code conventions. Commands land here as their ops land:
  * diann2msstats / openms2sample / checksamplesheet now; mzmlstats /
  * psmconvert / dianncfg as M3-M6 arrive.
  */
object Main {

  private def session(): SparkSession = {
    val s = graft.Sessions.local(graft.Sessions.cpusOr(
      math.max(2, Runtime.getRuntime.availableProcessors()).toString))
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** `--flag value` and bare `--flag` parsing. */
  private def parseArgs(args: Seq[String]): (Map[String, String], Set[String]) = {
    var opts = Map.empty[String, String]
    var flags = Set.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          opts += a.drop(2) -> args(i + 1); i += 2
        } else { flags += a.drop(2); i += 1 }
      } else i += 1
    }
    (opts, flags)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "Usage: graft.cli.Main <diann2msstats|mzmlstats|psmconvert|openms2sample|checksamplesheet> [options]")
      sys.exit(2)
    }
    val (opts, flags) = parseArgs(args.tail.toSeq)
    val spark = session()
    try {
      args.head match {
        case "diann2msstats" =>
          val out = DiannToMsstats.run(spark,
            reportPath = opts("report"),
            designPath = opts("exp_design"),
            qvalueThreshold = opts("qvalue_threshold").toDouble,
            outDir = opts.getOrElse("out_dir", "."))
          println(out)

        case "mzmlstats" =>
          // --ms_paths a,b,c = the multi-run cluster path (partitioned
          // datasets); --ms_path = the reference's one-file contract
          opts.get("ms_paths") match {
            case Some(paths) =>
              MzmlStats.runMany(spark, paths.split(",").toSeq,
                opts.getOrElse("out_dir", "."),
                ms2File = flags.contains("ms2_file")).foreach(println)
            case None =>
              MzmlStats.run(spark,
                msPath = opts("ms_path"),
                ms2File = flags.contains("ms2_file"),
                outDir = opts.get("out_dir")).foreach(println)
              if (flags.contains("feature_detection"))
                println(FeatureDetect.run(spark, opts("ms_path"), opts.get("out_dir")))
          }

        case "dianncfg" =>
          println(DiannCfg.run(
            enzyme = opts.get("enzyme"),
            fixMod = opts.get("fix_mod"),
            varMod = opts.get("var_mod"),
            outDir = opts.getOrElse("out_dir", ".")))

        case "psmconvert" =>
          println(PsmConvert.run(spark,
            idxmlPath = opts("idxml"),
            ms2Path = opts.get("ms2_file"),
            exportDecoyPsm = flags.contains("export_decoy_psm"),
            outputFile = opts.get("output_file")))

        case "openms2sample" =>
          println(SampleExtract.run(spark, opts("expdesign"),
            outDir = opts.getOrElse("out_dir", ".")))

        case "checksamplesheet" =>
          if (!flags.contains("minimal"))
            System.err.println(
              "note: full template validation is out of scope; running minimal checks")
          val errors = SdrfValidator.validateMinimal(spark, opts("exp_design"))
          errors.foreach(println)
          if (errors.nonEmpty) { spark.stop(); sys.exit(1) }

        case other =>
          System.err.println(s"Unknown command: $other")
          spark.stop(); sys.exit(2)
      }
    } finally spark.stop()
  }
}
