package graft.util

import java.nio.file.{Files, Path}

/** Temp-dir factory with JVM-exit cleanup. Queries and benches stage
  * streaming sources, checkpoints and scratch sinks under /tmp;
  * without cleanup, repeated bench/test invocations accumulate
  * thousands of orphaned directories. Every dir created here is
  * best-effort recursively deleted in a single shutdown hook (by
  * which point all streaming queries have been stopped).
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val installHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { p =>
        try deleteRecursively(p.toFile)
        catch { case _: Throwable => () } // best-effort
      }
    }, "graft-tempdir-cleanup"))
  }

  def create(prefix: String): Path = {
    installHook
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }
}
