package graft.tools

/** Growth probe for the round-16 incremental-maintenance asks:
  *
  * `runMain graft.tools.IncrProbe chain <sfDir>` — per-NIGHT cost of the
  * q63i/q63j compounding chain: forces night k's snapshot pair with
  * nights 1, 2, 3 in turn; Materialize caching makes call k pay only
  * night k, so the deltas ARE the per-night walls. Flat-in-night-index is
  * the claim under test (every night merges one batch-sized index into a
  * standing snapshot by one range exchange + a batch-proportional LCP
  * delta — nothing accumulates except snapshot size itself, which grows
  * by one batch per night).
  *
  * `runMain graft.tools.IncrProbe ann <sfDir>` — q24p's nightly marginal:
  * wall of the batch encode-and-route frame (what the append writes)
  * beside the from-scratch re-encode of history+batch against the same
  * frozen codebooks (what build-once maintenance would pay per night).
  * Artifacts are warmed first so both timings measure ENCODE work, not
  * codebook training.
  *
  * Output: one JSON line per measurement, `{"probe":..,"step":..,
  * "wall_s":..,"rows":..}` — the bench/growth_r16*.json artifacts.
  */
object IncrProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def line(probe: String, step: String, wall: Double, rows: Long): Unit =
    println(f"""{"probe":"$probe","step":"$step","wall_s":$wall%.2f,"rows":$rows}""")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IncrProbe <chain|ann> <sfDir>")
    val mode = args(0); val dir = args(1)
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "chain" =>
        for (k <- 0 to 3) {
          val ((hk, hl), w) = timed {
            val pair = graft.queries.DedupQueries.saChainUpTo(spark, dir, k)
            // force both sides: the keys frame is a projection of the
            // night's materialized merge, the LCP table materializes in
            // the call itself — counting both pins the night complete
            (pair._1.count(), pair._2.count())
          }
          line("sa_chain", if (k == 0) "base_build" else s"night$k", w, hk + hl)
        }
      case "ann" =>
        // warm the frozen artifacts + standing layout (training excluded
        // from both measurements below)
        val (_, wBuild) = timed(
          graft.queries.SimilarityQueries.q24pMergedCodes(spark, dir).count())
        line("ann_incr", "build_total", wBuild, -1L)
        val (nb, wBatch) = timed(
          graft.queries.SimilarityQueries.q24pBatchEncodeFrame(spark, dir).count())
        line("ann_incr", "nightly_append_encode", wBatch, nb)
        val (nf, wFull) = timed(
          graft.queries.SimilarityQueries.q24pFromScratchCodes(spark, dir).count())
        line("ann_incr", "from_scratch_encode", wFull, nf)
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
