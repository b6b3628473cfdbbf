package graft

/** Process-scoped root for the library's scratch/fixture directories
  * (reflection warehouses, snapshot stores, standing dedup/Bloom state built
  * by the registry fixtures). Everything lives under ONE temp root that a
  * JVM shutdown hook deletes, so repeated harness runs don't accumulate
  * orphaned parquet in /tmp (advisor r7 on q92's fixtures). Within a
  * process the dirs are stable — the registry's per-(session, corpus)
  * fixture caches depend on that.
  *
  * Production state (DedupStream stateDir, Decontaminate filter stores the
  * CALLER sites) is intentionally not routed through here: standing state
  * must outlive the process. This is for scratch only.
  */
object TempDirs {

  private lazy val root: java.nio.file.Path = {
    // Short fixed prefix + pid, NOT createTempDirectory's long random
    // suffix: these paths appear inside physical-plan scan locations, which
    // the plan printer truncates — a long root would cut the markers the
    // substitution require()s look for.
    val d = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(d)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d.toFile)))
    d
  }

  /** A fresh directory under the self-cleaning root. */
  def newDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toFile.getAbsolutePath

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
