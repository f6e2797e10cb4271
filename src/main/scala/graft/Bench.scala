package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query twice on
  * SPARK_GRAFT_SF_DIR and reports the warm (second-run) time per query —
  * the number that tracks per-query throughput once JIT/codegen is
  * amortized, which is the regime a long-running cluster lives in. The cold
  * (first-run) total is reported alongside for transparency. Prints exactly
  * one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch {
        case t: Throwable =>
          // surfaced in the JSON below: a broken query must not silently
          // shrink the total and masquerade as a faster run
          System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> once(n)).toMap
    val warm = names.map(n => n -> once(n)).toMap
    val qs = names.map(n => s"\"$n\":${warm(n)}").mkString("{", ",", "}")
    val total = warm.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val failed = names.filter(n => cold(n) < 0 || warm(n) < 0)
    val failedJson = failed.map(n => s"\"$n\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""cold_total":$coldTotal,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) System.err.println(
      s"[bench] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} failed; totals EXCLUDE them")
  }
}
