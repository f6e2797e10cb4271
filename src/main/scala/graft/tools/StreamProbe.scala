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
  * whether to cut batches or cut per-batch cost. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StreamProbe <sfDir> <querySubstr>")
    val Array(dir, pat) = args
    val pats = pat.split(",").toSeq
    val spark = graft.GraftSession.get()
    val batches = new ArrayBuffer[(String, Long, Map[String, Long], Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val p = e.progress
        batches.synchronized {
          batches += ((p.name, p.batchId,
            p.durationMs.asScala.view.mapValues(_.toLong).toMap, p.numInputRows))
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
      for ((_, id, d, nIn) <- rows.sortBy(_._2))
        println(s"   batch=$id rows=$nIn " +
          keys.map(k => s"$k=${d.getOrElse(k, 0L)}").mkString(" "))
      val tot = keys.map(k => k -> rows.map(_._3.getOrElse(k, 0L)).sum).toMap
      println("   TOTAL " + keys.map(k => s"$k=${tot(k)}").mkString(" ") +
        f" outside=${wall - tot("triggerExecution") / 1000.0}%.2fs")
    }
    spark.stop()
  }
}
