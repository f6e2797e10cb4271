package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md §0 scale stance): deterministic
  * salting for hot keys. AQE's skew-join splitting handles most cases at
  * runtime; explicit salting remains the tool for (a) aggregations whose
  * partial state is itself the bottleneck on one key, and (b) joins where
  * one key dominates so hard that even split shuffle blocks overwhelm a
  * task. Salts are derived from row content (never `rand()`) so plans stay
  * deterministic and retry-safe — a task retry with `rand()` salting would
  * double-count rows.
  */
object Skew {

  /** Two-stage salted aggregation: count per (key, salt) map-side, then
    * merge per key. The hot key's rows spread over `salts` reducers in
    * stage 1; stage 2 merges `salts` partial rows per key. */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("cnt"))
  }

  /** Salted broadcast-free join for a skewed build side: replicate each
    * small-side row `salts` times (one per salt value), salt the big side
    * deterministically from a unique column, and join on (key, salt). The
    * hot key's rows land on `salts` different reducers instead of one. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      bigUnique: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(bigUnique)), lit(salts)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
