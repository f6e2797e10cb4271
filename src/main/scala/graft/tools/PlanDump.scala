package graft.tools

import java.nio.file.{Files, Paths}

/** Optimization-round helper: dump `explain("formatted")` for the named
  * queries to one file per query — the before/after plan artifacts the
  * round's judge checks claims against.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]`
  * writes `<outDir>/<shortName>_<suffix>.txt` (shortName = the `qNN[x]`
  * prefix BASELINE.md uses). Streaming queries whose interesting shape only
  * exists in the executed micro-batch (the q19/q20/q21/q29/q45b/q45c
  * families) are RUN and the captured last micro-batch plan is appended.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(',').toSeq
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.GraftSession.get()
    names.foreach { name =>
      val full = graft.SparkEntry.queries.keys.find(_ == name)
        .orElse(graft.SparkEntry.queries.keys.find(_.startsWith(name + "_")))
        .getOrElse(sys.error(s"unknown query $name"))
      val short = full.takeWhile(_ != '_')
      val tag = short // StreamRunner tags match the short prefix
      val df = graft.SparkEntry.queries(full)(spark, sfDir)
      val planned = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // if this query ran a bounded stream, append the executed micro-batch
      // plan (the batch frame above is just the sink read for those)
      val streamPlan = graft.streaming.StreamRunner.lastStreamingPlan(tag)
        .map(p => s"\n-- last executed micro-batch plan --\n$p").getOrElse("")
      Files.writeString(Paths.get(outDir, s"${short}_$suffix.txt"),
        s"-- $full @ $sfDir --\n$planned$streamPlan")
      System.err.println(s"[plandump] wrote ${short}_$suffix.txt")
    }
    spark.stop()
  }
}
