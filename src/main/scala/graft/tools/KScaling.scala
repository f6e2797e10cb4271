package graft.tools

/** SemDeDup k-scaling measurement:
  * `runMain graft.tools.KScaling <sfDir> <k>`.
  *
  * Demonstrates the scaling rule the BASELINE ×20 capture documents:
  * within-cluster pairwise work is quadratic in CLUSTER size, so doubling
  * the corpus at fixed k quadruples it — and doubling k alongside restores
  * the cluster size, returning the cost curve to ~linear (k ∝ n is the
  * production setting; Abbas et al. 2023 hold cluster size, not cluster
  * count, constant). Runs the q24h pipeline at the given k twice (cold +
  * warm, warm reported first) against a noop-format sink — the same
  * protocol as [[graft.Bench]] — and prints one JSON line. */
object KScaling {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: KScaling <sfDir> <k>")
    val Array(dir, kStr) = args
    val k = kStr.toInt
    val spark = graft.GraftSession.get()
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.queries.SimilarityQueries.semanticDedupFrame(spark, dir, k)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warm = once()
    spark.stop()
    println(f"""{"metric":"semdedup_k$k","warm":$warm%.3f,"cold":$cold%.3f,"sf":"$dir"}""")
  }
}
