package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** ANN cell-count crossover capture (VERDICT r10 #3):
  * `runMain graft.tools.AnnCellScale <sfDir> <nCells> <probes> [passes]`.
  *
  * The round-10 growth rows showed q24m's cell-partitioned codes layout
  * moving FEWER bytes than flat q24l but costing MORE wall at the demo
  * geometry — 10 coarse cells with 80–90% of them probed, so the pruned
  * scan read almost everything and paid the partitioned-read overhead on
  * top. This tool re-derives the coarse quantizer at a production cell
  * count (k-means at nCells, probes per query — probed fraction ≤ 10% at
  * nCells ≥ 256/probes·queries) and measures the SAME two serving plans
  * ([[graft.queries.SimilarityQueries.ivfpqAtScale]]): flat codes scan +
  * probe filter vs statically partition-pruned scan of codes laid out
  * partitionBy(cell).
  *
  * Protocol mirrors [[graft.Bench]]: all one-time artifacts (codebooks,
  * codes, the partitioned layout, the k-means cells) are built in an
  * UNTIMED warm pass — they are layout jobs, not serving cost — then each
  * variant runs `passes` timed noop-sink passes; reported figure = min of
  * the post-JIT passes. Per-pass scan input bytes and shuffle writes are
  * captured from the listener bus (input bytes are the layout's claim:
  * pruned ≈ probed-fraction × flat). The two variants' results are
  * asserted IDENTICAL before anything is timed — same codebooks, same
  * probe map, only the read path differs.
  */
object AnnCellScale {

  private final class IoListener extends SparkListener {
    val input, shuffleW, tasks = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        tasks.incrementAndGet()
        ()
      }
    }
    def snap(): (Long, Long) = (input.get, shuffleW.get)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: AnnCellScale <sfDir> <nCells> <probes> [passes]")
    val dir = args(0)
    val nCells = args(1).toInt
    val probes = args(2).toInt
    val passes = if (args.length > 3) args(3).toInt else 3
    val spark = graft.GraftSession.get()
    val listener = new IoListener
    spark.sparkContext.addSparkListener(listener)
    val (flat, pruned) =
      graft.queries.SimilarityQueries.ivfpqAtScale(spark, dir, nCells, probes)
    // correctness pin first (also builds every shared artifact untimed):
    // identical top-k from both read paths, or the capture is meaningless
    // Identity pin on (qid, rank, vec_id) — NOT the float cos column. The
    // admitted ids are already order-deterministic (TopKByScore sorts by
    // (-score, vec_id), so a dotv tie at the shortlist boundary resolves
    // identically in both plans), but comparing the doubles bitwise would
    // couple the pin to expression-tree evaluation order; the id triple is
    // the layout claim, the scores are checked within 1e-9 (ADVICE r11)
    val a = flat.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val b = pruned.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    require(a.nonEmpty, "empty result — nothing was measured")
    require(a.length == b.length, s"flat and partitioned row counts differ (${a.length} vs ${b.length})")
    require(a.map(t => (t._1, t._2, t._3)).toSeq == b.map(t => (t._1, t._2, t._3)).toSeq,
      "flat and partitioned admitted different (qid, rank, vec_id) triples")
    val maxCosDelta = a.zip(b).map { case (x, y) => math.abs(x._4 - y._4) }.max
    require(maxCosDelta <= 1e-9, f"cos diverges between read paths: $maxCosDelta%.2e")
    def timed(df: DataFrame): (Double, Long, Long) = {
      Thread.sleep(200) // let trailing listener events drain
      val (i0, s0) = listener.snap()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (i1, s1) = listener.snap()
      (sec, i1 - i0, s1 - s0)
    }
    def run(tag: String, df: DataFrame): (Double, Long, Long) = {
      val all = (1 to passes).map(_ => timed(df))
      val best = all.drop(1).minBy(_._1) // post-JIT min, Bench's rule
      System.err.println(s"[annscale] $tag passes=" +
        all.map(p => f"${p._1}%.2fs/${p._2 / 1e6}%.1fMB").mkString(" "))
      best
    }
    val (fSec, fIn, fSh) = run("flat", flat)
    val (pSec, pIn, pSh) = run("pruned", pruned)
    spark.stop()
    println(
      f"""{"metric":"ann_cell_crossover","ncells":$nCells,"probes":$probes,""" +
        f""""flat_s":$fSec%.3f,"flat_input_mb":${fIn / 1e6}%.2f,"flat_shuffle_mb":${fSh / 1e6}%.2f,""" +
        f""""pruned_s":$pSec%.3f,"pruned_input_mb":${pIn / 1e6}%.2f,"pruned_shuffle_mb":${pSh / 1e6}%.2f,""" +
        f""""sf":"$dir"}""")
  }
}
