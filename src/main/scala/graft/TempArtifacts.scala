package graft

/** JVM-lifetime registry of on-disk artifact directories the operators
  * write under java.io.tmpdir (q105's ANN index, q108's dedup index).
  * Dirs are keyed per Spark applicationId by their creators — two
  * concurrent JVMs never clobber each other — and this hook removes
  * them at JVM exit so repeated harness runs don't accumulate
  * abandoned indexes (r4 ADVICE).
  */
object TempArtifacts {
  private val dirs = scala.collection.mutable.LinkedHashSet.empty[java.io.File]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      synchronized { dirs.foreach(rm); dirs.clear() }))

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(rm)
    }
    f.delete()
  }

  /** Register an artifact dir for removal at JVM exit (idempotent). */
  def register(d: java.io.File): Unit = synchronized {
    hookInstalled
    dirs += d
  }
}
