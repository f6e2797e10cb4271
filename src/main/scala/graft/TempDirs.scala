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
    val leftover = new java.util.ArrayList[Path]()
    created.forEach { p =>
      // best-effort but not blind: other shutdown hooks (Spark's checkpoint
      // flush) may still be writing; anything that survives is reported so
      // a reintroduced leak is visible, and the walk stream is closed so
      // the hook can't exhaust handles across many dirs
      try {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
        finally walk.close()
      } catch { case _: Exception => () }
      if (Files.exists(p)) leftover.add(p)
    }
    if (!leftover.isEmpty)
      System.err.println(s"[graft] ${leftover.size} scratch dirs not reclaimed: " +
        s"${leftover.toString.take(500)}")
  }, "graft-tempdir-cleanup"))

  /** Create a tracked temp directory; returns its absolute path. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toFile.getAbsolutePath
  }

  /** Eagerly reclaim a tracked dir whose contents are no longer referenced
    * by any live plan (iterative builders drop superseded rounds here so
    * scratch residency stays O(2 rounds), not O(all rounds)). Safe to call
    * before JVM exit: the shutdown hook tolerates already-deleted paths. */
  def delete(dir: String): Unit = {
    try {
      val walk = Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
      finally walk.close()
    } catch { case _: Exception => () }
  }
}
