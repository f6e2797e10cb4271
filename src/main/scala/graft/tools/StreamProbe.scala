package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch cost probe for the streaming harness:
  * `runMain graft.tools.StreamProbe <sfDir> <querySubstr>[,substr...]`.
  *
  * Runs each matching SparkEntry query twice (cold + warm) with a
  * StreamingQueryListener attached and prints, per streaming query
  * execution, the per-batch duration breakdown Spark reports
  * (`triggerExecution` total plus addBatch / queryPlanning / walCommit /
  * commitOffsets / getBatch / latestOffset) — the evidence that says
  * whether harness time is plan execution (addBatch) or per-batch fixed
  * machinery (planning + offset-log commits), which is what decides
  * whether to cut batches or cut per-batch cost.
  *
  * When the query carries engine state (q45c's transformWithState), the
  * per-batch stateOperators row is printed too (rows total/updated, state
  * memory); after EVERY run the probe also reports the on-disk bytes of
  * the query's scratch state — the caller-managed `seen_v*` delta log for
  * q45b, the checkpoint's `state/` store for q45c — by scanning
  * java.io.tmpdir for the newest `graft_<qprefix>_state_*` /
  * `graft_<qprefix>_chk_*` dirs (TempDirs keeps them until JVM exit).
  * Together these are the VERDICT r15 #4 numbers: state-write bytes and
  * wall per micro-batch, for the two state designs side by side. */
object StreamProbe {

  private def dirBytes(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) return 0L
    val walk = java.nio.file.Files.walk(p)
    try walk.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum
    finally walk.close()
  }

  /** Newest tmpdir entries matching a glob prefix, by mtime. */
  private def newestScratch(prefix: String): Option[java.nio.file.Path] = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val ds = java.nio.file.Files.newDirectoryStream(tmp, prefix + "*")
    try {
      import scala.jdk.CollectionConverters._
      ds.asScala.toSeq
        .sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .lastOption
    } finally ds.close()
  }
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StreamProbe <sfDir> <querySubstr>")
    val Array(dir, pat) = args
    val pats = pat.split(",").toSeq
    val spark = graft.GraftSession.get()
    val batches = new ArrayBuffer[(String, Long, Map[String, Long], Long, String)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val p = e.progress
        val st = p.stateOperators.map(so =>
          s"rowsTotal=${so.numRowsTotal} rowsUpdated=${so.numRowsUpdated} " +
            s"stateMemB=${so.memoryUsedBytes}").mkString("; ")
        batches.synchronized {
          batches += ((p.name, p.batchId,
            p.durationMs.asScala.view.mapValues(_.toLong).toMap, p.numInputRows, st))
          ()
        }
      }
    })
    val names = graft.SparkEntry.queries.keys.toSeq
      .filter(n => pats.exists(n.contains)).sorted
    for (name <- names; pass <- Seq("cold", "warm")) {
      batches.synchronized(batches.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; settle briefly before reading
      Thread.sleep(300)
      val rows = batches.synchronized(batches.toVector)
      println(f"== $name [$pass] wall=$wall%.2fs batches=${rows.size}")
      val keys = Seq("triggerExecution", "addBatch", "queryPlanning",
        "walCommit", "commitOffsets", "getBatch", "latestOffset")
      for ((_, id, d, nIn, st) <- rows.sortBy(_._2))
        println(s"   batch=$id rows=$nIn " +
          keys.map(k => s"$k=${d.getOrElse(k, 0L)}").mkString(" ") +
          (if (st.nonEmpty) s" | state: $st" else ""))
      val tot = keys.map(k => k -> rows.map(_._3.getOrElse(k, 0L)).sum).toMap
      println("   TOTAL " + keys.map(k => s"$k=${tot(k)}").mkString(" ") +
        f" outside=${wall - tot("triggerExecution") / 1000.0}%.2fs")
      // on-disk state-write bytes for the two q45 state designs: the
      // delta-log dirs (q45b — per-version rows+bytes via seenDeltaStats)
      // or the checkpoint's engine state store (q45c)
      val qprefix = name.takeWhile(_ != '_')
      newestScratch(s"graft_${qprefix}_state_").foreach { sr =>
        println(s"   stateRoot=$sr bytes=${dirBytes(sr)}")
        graft.queries.CurationPipeline
          .seenDeltaStats(spark, sr.toFile.getAbsolutePath)
          .foreach { case (v, r, b) => println(s"   seen_v$v rows=$r bytes=$b") }
      }
      newestScratch(s"graft_${qprefix}_chk_").foreach { ck =>
        val st = ck.resolve("state")
        if (java.nio.file.Files.exists(st))
          println(s"   chkStateDir=$st bytes=${dirBytes(st)}")
      }
    }
    spark.stop()
  }
}
