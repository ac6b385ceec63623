package graft.util

/** Shared exit-time cleanup for temp roots staged under /tmp.
  *
  * One static shutdown hook draining a queue of registered roots: a driver
  * looping the oracle gate + bench passes creates hundreds of temp roots
  * (replay stages, jsonl round-trip dirs), and a hook Thread PER ROOT would
  * accrete without bound in the JVM's shutdown registry. Deletion is
  * deferred to exit (not eager) because the returned DataFrames lazily
  * re-read the staged files until the caller's final action. */
object TempRoots {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      var p = roots.poll()
      while (p != null) { rm(p.toFile); p = roots.poll() }
    }))
  }

  /** Create a temp directory registered for exit-time deletion. */
  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }
}
