package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round diagnostic: run one query a few times and print every
  * Spark JOB's wall time and description, so out-of-task wall (wall ≫ task
  * run time) can be attributed to job-count / planning gaps instead of
  * guessed at. Usage: `runMain graft.tools.JobProbe <sfDir> <queryName> [n]`.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = graft.SparkEntry.queries.keys.find(_ == args(1))
      .orElse(graft.SparkEntry.queries.keys.find(_.startsWith(args(1))))
      .getOrElse(sys.error(s"unknown query ${args(1)}"))
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.get()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, (e.time,
          Option(e.properties).map(_.getProperty("spark.job.description"))
            .flatMap(Option(_)).getOrElse("")))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, d) =>
          System.err.println(f"[jobprobe] job ${e.jobId}%4d ${e.time - t0}%6d ms  $d")
        }
        ()
      }
    })
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      System.err.println(s"[jobprobe] ===== pass $i build =====")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      System.err.println(f"[jobprobe] build took ${(t1 - t0) / 1e6}%.0f ms; executing")
      df.write.format("noop").mode("overwrite").save()
      System.err.println(f"[jobprobe] pass $i total ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(build ${(t1 - t0) / 1e6}%.0f ms)")
    }
    spark.stop()
  }
}
