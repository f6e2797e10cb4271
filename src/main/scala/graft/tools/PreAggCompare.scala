package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures q10's two formulations head-to-head on one corpus —
  * `runMain graft.tools.PreAggCompare <sfDir> [reps]` — so the order-grain
  * pre-aggregation rework (round 9) carries before/after evidence at the
  * scale points, not just at the oracle SF:
  *
  *   - `flat`: the round-8 shape — raw lineitem ⋈ orders SMJ, then
  *     `countDistinct(o_orderkey)` (an Expand doubling the final
  *     aggregate's input).
  *   - `preagg`: the round-9 shape — lineitem pre-aggregated to order
  *     grain before the join; distinct degenerates to count, no Expand.
  *
  * Both run the same noop-sink action the bench uses; each rep prints
  * seconds, the min over reps is the figure. Expect the pre-agg's byte
  * advantage to fade as per-task order keys become mostly unique (map-side
  * combine ratio → 1 at high key cardinality per task) while the
  * Expand-removal advantage persists — this tool is where that claim is
  * checked instead of assumed.
  */
object PreAggCompare {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.get()
    import graft.queries.Det.dsum
    import graft.sources.Tables

    def flat: DataFrame =
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("r_name", "n_name")

    def preagg: DataFrame =
      graft.SparkEntry.queries("q10_region_revenue")(spark, dir)

    def time(name: String, df: => DataFrame): Double = {
      val best = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[preagg-compare] $name rep$r $s%.2f s")
        s
      }.min
      println(f"[preagg-compare] $name BEST $best%.2f s")
      best
    }

    val f = time("flat", flat)
    val p = time("preagg", preagg)
    println(f"""{"metric":"q10_preagg_speedup","dir":"$dir","flat_s":$f%.3f,"preagg_s":$p%.3f,"speedup":${f / p}%.2f}""")
    spark.stop()
  }
}
