package org.apache.spark.sql.graft.store

/** Spill-directory lifecycle shared by both stores' overflow tiers.
  *
  * `File.deleteOnExit` cannot remove a non-empty directory, and spill
  * files are created AFTER registration — so each store registers a
  * shutdown hook that sweeps whatever is still live at exit (in-flight
  * deletes stay eager on release/drop paths).
  */
private[store] object SpillSweep {

  /** A fresh temp directory whose contents are swept by a JVM shutdown
    * hook. If the JVM is already shutting down when the (lazy) first
    * spill happens, the hook cannot register — the files then outlive
    * this run like any temp file, which is the pre-existing worst case.
    */
  def registeredTempDir(prefix: String, threadName: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    try {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          val files = java.nio.file.Files.list(d)
          try files.forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally files.close()
          java.nio.file.Files.deleteIfExists(d)
        } catch { case _: Throwable => () }
      }, threadName))
    } catch { case _: IllegalStateException => () /* already shutting down */ }
    d
  }
}
