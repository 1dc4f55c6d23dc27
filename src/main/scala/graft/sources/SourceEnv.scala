package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the custom file sources.
  *
  * Readers must NOT build a bare `new Configuration()`: that drops every
  * `spark.hadoop.*` session setting (S3 credentials, fs tuning), so paths
  * that work for built-in sources would fail here. The session's Hadoop
  * conf is flattened to a plain Map on the driver (serializable into the
  * reader factory) and rebuilt executor-side.
  */
object SourceEnv {

  /** Driver-side: the session Hadoop conf as a serializable map. */
  def hadoopConfMap(): Map[String, String] = {
    val c = SparkSession.active.sessionState.newHadoopConf()
    val b = Map.newBuilder[String, String]
    val it = c.iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  /** Executor-side: rebuild a Configuration from the flattened map. */
  def toConf(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Expand directory paths to their contained files with the given
    * (lower-cased) extension; file paths pass through. Driver-side.
    */
  def expand(paths: Seq[String], ext: String, conf: Configuration): Seq[String] =
    paths.flatMap { r =>
      val p = new Path(r)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .filter(_.isFile)
          .map(_.getPath.toString)
          .filter(_.toLowerCase.endsWith(ext))
      else Seq(p.toString)
    }.distinct.sorted

  /** Minimal JSON string-array codec with real escaping — offsets and
    * Spark's multi-path `paths` option must round-trip paths containing
    * quotes or commas.
    */
  def encodeStrings(ss: Seq[String]): String =
    ss.map(s => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\"").mkString("[", ",", "]")

  def decodeStrings(json: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cur: StringBuilder = null
    var esc = false
    var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (cur == null) { if (c == '"') cur = new StringBuilder }
      else if (esc) { cur.append(c); esc = false }
      else if (c == '\\') esc = true
      else if (c == '"') { out += cur.toString; cur = null }
      else cur.append(c)
      i += 1
    }
    out.result()
  }
}
