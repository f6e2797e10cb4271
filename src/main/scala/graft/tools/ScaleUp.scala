package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N× corpus from a driver testdata dir for scale-stress
  * benchmarking: `runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>`.
  *
  * The point is THROUGHPUT runs beyond the largest provided SF (the
  * verdict's "would the linear-vs-quadratic claims hold at 10×?"), so the
  * replicas must not be byte-copies: exact duplication would multiply every
  * dedup/LSH bucket's depth by N and turn bucketed-linear pipelines into
  * accidental quadratics that measure the DUPLICATION, not the data size.
  * Each replica k therefore gets:
  *   - fresh keys (id offsets per replica) so key cardinalities scale;
  *   - perturbed document text (replica-keyed consonant rotation via
  *     `translate` — length, whitespace, token shape preserved, so text
  *     statistics stay realistic while shingles/MinHash signatures decouple
  *     across replicas);
  *   - perturbed embeddings (small deterministic per-(vec,dim,replica)
  *     offset that changes DIRECTION — a pure rescale would leave cosine
  *     geometry identical and every replica a perfect near-dup);
  *   - lineitem/orders key offsets applied consistently so joins survive.
  * Dimension tables are copied as-is: at any real scale the dims stay
  * small relative to facts — that asymmetry is the thing being preserved.
  */
object ScaleUp {

  private val Big = Seq("events", "documents", "embeddings", "lineitem", "orders")

  def main(args: Array[String]): Unit = {
    // optional 4th arg: comma-separated subset of the big tables to scale
    // (the rest are byte-copied) — a single-table stress corpus (e.g. the
    // ×100 embeddings dir for the ANN crossover capture) should not pay
    // for 10M scaled event rows it never reads
    require(args.length >= 3,
      "usage: ScaleUp <srcDir> <dstDir> <factor> [tables] [novelPct]")
    val src = args(0); val dst = args(1)
    val factor = args(2).toInt
    // an EXPLICIT 4th arg must parse to known names — "" splits to Seq("")
    // and fails the require below rather than silently meaning "all"
    val scaleOnly: Seq[String] =
      if (args.length > 3) args(3).split(",").toSeq else Big
    // optional 5th arg (VERDICT r15 #8): percentage (0..100) of replica
    // embedding VECTORS rewritten to a decorrelated hash-random direction
    // instead of the ±0.05 offset. The offset perturbation keeps every
    // replica above the 0.45 cosine near-dup bar BY CONSTRUCTION, so q67's
    // growth rows on offset-only corpora measure the k² true-near-dup
    // candidate mass of the replication itself, not routing cost; with a
    // novel fraction, that share of batch vectors is genuinely below the
    // bar and the monitor's growth row measures what it measures in
    // production — band-routing over a drifting batch.
    val novelPct = if (args.length > 4) args(4).toInt else 0
    require(novelPct >= 0 && novelPct <= 100,
      s"novelPct must be 0..100, got $novelPct")
    // fail loudly on a typo or a non-Big name: a silently-unscaled corpus
    // labeled as a scaled dir would poison every downstream growth capture
    // (ADVICE r11)
    require(scaleOnly.nonEmpty && scaleOnly.forall(Big.contains),
      s"unknown table(s) ${scaleOnly.filterNot(Big.contains).mkString(",")} — " +
        s"scalable tables are ${Big.mkString(",")}")
    require(factor >= 1 && factor <= 100, s"factor must be 1..100, got $factor")
    val spark = graft.GraftSession.get()
    Files.createDirectories(Paths.get(dst))
    for (t <- graft.sources.Tables.names if !Big.contains(t) || !scaleOnly.contains(t))
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$dst/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    for (t <- Big if scaleOnly.contains(t)) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val reps = (0 until factor).map(k => replica(t, base, k, novelPct))
      reps.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t ×$factor")
    }
    spark.stop()
  }

  /** Replica k of table `t`; k = 0 is the identity. `novelPct` applies to
    * embeddings replicas only — that percentage of vectors per replica is
    * rewritten to a decorrelated hash-random direction (below any cosine
    * near-dup bar) instead of offset-perturbed. */
  private[graft] def replica(t: String, df: DataFrame, k: Int,
                             novelPct: Int = 0): DataFrame = {
    if (k == 0) return df
    val kc = lit(k.toLong)
    t match {
      case "events" =>
        // new event ids + new users per replica (per-user event density —
        // the thing sessionization/windows key on — stays constant)
        df.withColumn("event_id", col("event_id") + kc * 1000000000000L)
          .withColumn("user_id", col("user_id") + kc * 10000000L)
      case "documents" =>
        // rotate consonants by k mod 20 AND vowels by k div 20: same
        // lengths, same token boundaries, different shingles → replicas are
        // NOT near-dups of each other, so the corpus dup-rate scales instead
        // of deepening. The second (vowel) rotation matters: consonant
        // rotation alone is the IDENTITY at k % 20 == 0, so factors > 20
        // would byte-copy texts across replicas 20 apart — exactly the
        // accidental dup-deepening this perturbation exists to prevent. The
        // pair (k % 20, k / 20) is distinct for every k in 0..99 (factor
        // cap is 100), so no two replicas share a transform.
        val abc = "bcdfghjklmnpqrstvwxz"
        val vow = "aeiou"
        val rc = abc.drop(k % abc.length) + abc.take(k % abc.length)
        val vk = k / abc.length % vow.length
        val rv = vow.drop(vk) + vow.take(vk)
        df.withColumn("doc_id", col("doc_id") + kc * 1000000000L)
          .withColumn("text",
            translate(col("text"),
              abc + abc.toUpperCase + vow + vow.toUpperCase,
              rc + rc.toUpperCase + rv + rv.toUpperCase))
      case "embeddings" =>
        // deterministic per-(vec,dim,replica) offset; changes direction so
        // cosine neighborhoods decouple across replicas. A novelPct share
        // of each replica's vectors (hash-selected, deterministic) instead
        // takes a fully decorrelated hash-random direction in [-0.5, 0.5)
        // per dim — cosine vs ANY offset-perturbed original concentrates
        // near 0, far below the 0.45 near-dup bar, so drift monitors see
        // a genuinely novel batch share (VERDICT r15 #8)
        val novel = pmod(hash(col("vec_id"), kc, lit(7919)), lit(100))
          .lt(lit(novelPct))
        df.withColumn("vec_id", col("vec_id") + kc * 1000000000L)
          .withColumn("embedding",
            when(novel,
              transform(col("embedding"), (_, i) =>
                ((pmod(hash(col("vec_id"), i, kc, lit(104729)), lit(1000))
                  .cast("double") / 1000.0) - 0.5).cast("float")))
            .otherwise(
              transform(col("embedding"), (x, i) =>
                (x + (pmod(hash(col("vec_id"), i, kc), lit(100)).cast("double")
                  / 1000.0 - 0.05).cast("float")).cast("float"))))
      case "lineitem" =>
        df.withColumn("l_orderkey", col("l_orderkey") + kc * 1000000000L)
      case "orders" =>
        df.withColumn("o_orderkey", col("o_orderkey") + kc * 1000000000L)
      case other => sys.error(s"no replica rule for $other")
    }
  }
}
