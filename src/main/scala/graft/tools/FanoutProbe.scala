package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch experiment (not part of the library surface): decompose q37's
  * warm cost — which of the six per-column profile aggregations carries
  * the 2.1 s, and is it the distinct, the min/max, or the scan.
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    val ev = graft.sources.Tables.events(spark, dir)
    def time(tag: String, df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag cold=${ts.head}%.2f warm=${ts.tail.min}%.2f")
    }
    time("scan only        ", ev.select(col("event_id")))
    for (c <- Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
      time(f"distinct $c%-9s", ev.agg(countDistinct(col(c))))
    time("all 6 distincts  ", ev.agg(countDistinct(col("event_id")),
      Seq("event_type", "props", "ts", "user_id", "value").map(c => countDistinct(col(c))): _*))
    time("minmax all       ", ev.agg(min(col("event_id")), max(col("event_id")),
      min(col("event_type")), max(col("event_type")), min(col("props")), max(col("props")),
      min(col("ts")), max(col("ts")), min(col("user_id")), max(col("user_id")),
      min(col("value")), max(col("value"))))
    // the full q37 shape: 6 distincts + per-column count/min/max + total
    // count in ONE agg (Expand x7), then the 1-row explode + sort
    time("q37 full         ", graft.SparkEntry.queries("q37_column_profile")(spark, dir))
    // candidate split: distinct-only agg (narrow Expand) x plain agg
    // (no Expand), cross-joined as two 1-row sides
    val cols = Seq("event_id", "event_type", "props", "ts", "user_id", "value")
    val dist = ev.agg(
      countDistinct(col(cols.head)).as(s"nd_${cols.head}"),
      cols.tail.map(c => countDistinct(col(c)).as(s"nd_$c")): _*)
    val plain = ev.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))): _*)
    time("q37 split        ", dist.crossJoin(plain))
    spark.stop()
  }
}
