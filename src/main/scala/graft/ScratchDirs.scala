package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Self-cleaning temp directories for scenario warehouses, stream
  * checkpoints, and test fixtures. Thousands of scenario runs used to
  * strand `graft-wh-*` directories in /tmp (~6,500 dirs/round); every
  * dir created here is recursively deleted by one JVM shutdown hook,
  * so Verify/Bench/test JVMs leave /tmp as they found it. Deletion at
  * exit (not at scenario end) keeps the contract lazy-safe: a returned
  * DataFrame may still read the warehouse until the driver dumps it.
  */
object ScratchDirs {
  private val dirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try deleteRecursively(d)
      catch { case _: Throwable => () } // best-effort; /tmp is disposable
    }
  }, "graft-scratch-cleanup"))

  /** Create a fresh temp directory (like Files.createTempDirectory)
    * registered for recursive deletion at JVM exit. */
  def create(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
