package graft

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.ConcurrentLinkedQueue

/** Tracked scratch directories, deleted on JVM exit.
  *
  * All harness scratch (materialized frames, stream replay dirs,
  * checkpoints, sinks) goes through here so it is actually reclaimed:
  * `java.io.tmpdir` defaults to RAM-backed /dev/shm in this build, and
  * undeleted scratch would otherwise accumulate across runs until tmpfs
  * fills — a leak straight out of usable memory. */
object TempDirs {

  private val created = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
      catch { case _: Exception => () }
    }
  }, "graft-tempdir-cleanup"))

  /** Create a tracked temp directory; returns its absolute path. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toFile.getAbsolutePath
  }
}
