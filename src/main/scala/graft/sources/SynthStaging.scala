package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Cross-JVM-safe staging for deterministic synthetic corpora (mzML, idXML).
  *
  * The corpus is written into a process-unique temp dir and atomically
  * renamed into a parameter-keyed target, so two concurrent JVMs sharing
  * java.io.tmpdir can never interleave writes or scan half-written files —
  * whichever rename lands first wins, the loser discards its copy (content
  * is deterministic, so both copies are byte-identical anyway). A dir staged
  * by this protocol is only ever observable complete (the rename is atomic),
  * so the remnant delete below can only ever hit a legacy/crashed leftover —
  * never a complete dir a concurrent JVM just finished and is scanning.
  */
object SynthStaging {

  /** Stage (once) the named files under a `key`-derived tmpdir, returning
    * their absolute paths in `names` order. `write(dir, name)` must produce
    * the same bytes for the same name on every call (pure arithmetic, no
    * RNG) — that is what makes the lose-the-race path safe.
    */
  def staged(key: String, names: Seq[String])(write: (Path, String) => Unit): Seq[String] =
    synchronized {
      import scala.jdk.CollectionConverters._
      def deleteTree(p: Path): Unit = {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
      val dir = Paths.get(sys.props("java.io.tmpdir"), key)
      def complete: Boolean = names.forall(n => Files.exists(dir.resolve(n)))
      if (!complete) {
        val tmp = Files.createTempDirectory(
          Paths.get(sys.props("java.io.tmpdir")), s"${key}_stage_")
        names.foreach(n => write(tmp, n))
        if (complete) deleteTree(tmp) // another JVM finished while we built
        else {
          if (Files.isDirectory(dir)) deleteTree(dir) // incomplete remnant
          try Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileAlreadyExistsException |
                _: java.nio.file.DirectoryNotEmptyException |
                _: java.nio.file.AccessDeniedException =>
              // another JVM won the race with identical content — drop ours
              deleteTree(tmp)
          }
        }
      }
      names.map(n => dir.resolve(n).toString)
    }
}
