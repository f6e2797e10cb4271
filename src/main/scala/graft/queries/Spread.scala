package graft.queries

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-gated repartition-after-read for CPU-dense work rooted at an
  * unsplittable scan (optimization guide §2.5, "input skew": one huge
  * unsplittable file → repartition immediately after the read).
  *
  * The driver testdata ships each table as ONE single-row-group parquet
  * file, so every scan plans exactly one task regardless of
  * `maxPartitionBytes` — and a query whose cost is per-row compute
  * (tokenize → explode, regex cascades, JSON parse, vector dot products)
  * runs that compute serially while the other cores idle. The measured
  * signature at sf0.1/32 cores: task_cpu ≈ task_run ≈ wall with ≤ 8 tasks
  * (bench/metrics_r16_head.json — q24c, q18b, q02, q25i2, q22e, q58's scan
  * stage, clsScored's two passes).
  *
  * The repartition is GATED on the frame's actual planned scan parallelism:
  * it fires only when the plan yields fewer than half the session's default
  * parallelism, i.e. the small-local-file case. At production file counts a
  * 100 TB table scans as tens of thousands of splits, the gate never fires,
  * and no corpus-wide shuffle is introduced — so the helper is the identity
  * exactly where a shuffle would be a regression. This keeps the
  * partitioning scale-adaptive (derived from the input, not a constant
  * tuned to either local mode or the cluster).
  *
  * Partitioning is HASH on a caller-named near-unique key (doc_id /
  * event_id / vec_id — hundreds-to-thousands of distinct values per
  * partition, guide §2.5's 20–100× rule), not round-robin: round-robin
  * pays a per-task local sort (`spark.sql.execution.sortBeforeRepartition`)
  * and a deterministic key keeps row placement stable under task retries.
  *
  * A second effect the call sites rely on (guide §2.4): consumers that fan
  * out from the spread frame embed byte-identical Exchange subtrees, so
  * ReuseExchange collapses what used to be N serial re-scans (q22e
  * tokenizes its segment stream once instead of three times; clsScored's
  * unigram and bigram passes share one tokenize) — and downstream
  * aggregations keyed on the spread column reuse the partitioning outright.
  */
object Spread {

  /** `df` hash-repartitioned on `key` to the session default parallelism,
    * iff its planned scan parallelism is below half of it (see object doc).
    * Values are unchanged for any caller whose results don't depend on
    * physical row placement (no monotonically_increasing_id /
    * spark_partition_id / unordered limit downstream). */
  def apply(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planned partition count of the frame as-is: file splits for a scan
    // (this builds the physical plan but runs no job)
    val planned = df.rdd.getNumPartitions
    if (planned * 2 >= target) df
    else df.repartition(target, key)
  }
}
