package graft.cli

import org.apache.spark.sql.SparkSession

import graft.ops.{DiannCfg, DiannToMsstats, FeatureDetect, MzmlStats, PsmConvert, SampleExtract, SdrfValidator}

/** CLI mirroring the reference's six commands (quantmsutilsc.py:17-27), same
  * flags and exit-code conventions. `dispatch` does all the work and returns
  * the process exit code so tests can drive every command in-process against
  * a shared session; `main` owns the session lifecycle and the actual
  * sys.exit.
  */
object Main {

  private def session(): SparkSession = {
    val s = graft.Sessions.local(graft.Sessions.cpusOr(
      math.max(2, Runtime.getRuntime.availableProcessors()).toString))
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** `--flag value` and bare `--flag` parsing. */
  private[cli] def parseArgs(args: Seq[String]): (Map[String, String], Set[String]) = {
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

  private val commands = Set(
    "diann2msstats", "mzmlstats", "psmconvert",
    "openms2sample", "checksamplesheet", "dianncfg")

  private def usage(): Int = {
    System.err.println(
      "Usage: graft.cli.Main <" + commands.toSeq.sorted.mkString("|") + "> [options]")
    2
  }

  /** A missing required option — usage error, exit 2. Raised only by
    * [[required]] so a genuine NoSuchElementException from inside an op
    * (empty iterator, Option.get) propagates instead of being mislabeled.
    */
  private final case class UsageError(option: String)
    extends RuntimeException(s"--$option")

  private def required(opts: Map[String, String], key: String): String =
    opts.getOrElse(key, throw UsageError(key))

  /** Run one command; returns the exit code (0 ok, 1 validation/runtime
    * errors such as an unresolvable input path, 2 usage — including a
    * missing required option). Does NOT stop the session or call sys.exit —
    * that is main's job, so tests can call this directly.
    */
  def dispatch(spark: SparkSession, args: Array[String]): Int = {
    if (args.isEmpty) return usage()
    val (opts, flags) = parseArgs(args.tail.toSeq)
    try dispatchParsed(spark, args.head, opts, flags)
    catch {
      case UsageError(opt) =>
        System.err.println(s"Missing required option ($opt)")
        usage()
      case e: java.io.FileNotFoundException =>
        // resolve_ms_path contract (mzml_statistics.py:448): no unique
        // input file is a runtime error, not a usage error
        System.err.println(e.getMessage)
        1
    }
  }

  private def dispatchParsed(
      spark: SparkSession, command: String,
      opts: Map[String, String], flags: Set[String]): Int = {
    command match {
      case "diann2msstats" =>
        val out = DiannToMsstats.run(spark,
          reportPath = required(opts, "report"),
          designPath = required(opts, "exp_design"),
          qvalueThreshold = required(opts, "qvalue_threshold").toDouble,
          outDir = opts.getOrElse("out_dir", "."))
        println(out)
        0

      case "mzmlstats" =>
        // --ms_paths a,b,c = the multi-run cluster path (partitioned
        // datasets); --ms_path = the reference's one-file contract
        opts.get("ms_paths") match {
          case Some(paths) =>
            MzmlStats.runMany(spark,
              paths.split(",").toSeq.map(MzmlStats.resolveMsPath(spark, _)),
              opts.getOrElse("out_dir", "."),
              ms2File = flags.contains("ms2_file")).foreach(println)
          case None =>
            // S9 stem-glob resolution (mzml_statistics.py:412-448)
            val msPath = MzmlStats.resolveMsPath(spark, required(opts, "ms_path"))
            MzmlStats.run(spark,
              msPath = msPath,
              ms2File = flags.contains("ms2_file"),
              outDir = opts.get("out_dir")).foreach(println)
            if (flags.contains("feature_detection"))
              println(FeatureDetect.run(spark, msPath, opts.get("out_dir")))
        }
        0

      case "dianncfg" =>
        println(DiannCfg.run(
          enzyme = opts.get("enzyme"),
          fixMod = opts.get("fix_mod"),
          varMod = opts.get("var_mod"),
          outDir = opts.getOrElse("out_dir", ".")))
        0

      case "psmconvert" =>
        println(PsmConvert.run(spark,
          idxmlPath = required(opts, "idxml"),
          ms2Path = opts.get("ms2_file"),
          exportDecoyPsm = flags.contains("export_decoy_psm"),
          outputFile = opts.get("output_file")))
        0

      case "openms2sample" =>
        println(SampleExtract.run(spark, required(opts, "expdesign"),
          outDir = opts.getOrElse("out_dir", ".")))
        0

      case "checksamplesheet" =>
        val design = required(opts, "exp_design")
        val errors =
          if (flags.contains("minimal")) SdrfValidator.validateMinimal(spark, design)
          else {
            // template structural validation; ontology (OLS) checks are a
            // documented divergence — no term service in a zero-egress job
            System.err.println(
              "note: ontology term validation is skipped (no OLS service); " +
                "validating template structure")
            SdrfValidator.validateTemplate(spark, design,
              opts.getOrElse("template", "ms-proteomics"))
          }
        errors.foreach(println)
        if (errors.nonEmpty) 1 else 0

      case other =>
        System.err.println(s"Unknown command: $other")
        usage()
    }
  }

  def main(args: Array[String]): Unit = {
    // usage errors exit before any Spark startup cost
    if (args.isEmpty || !commands(args.head)) {
      if (args.nonEmpty) System.err.println(s"Unknown command: ${args.head}")
      sys.exit(usage())
    }
    val spark = session()
    val code = try dispatch(spark, args) finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
