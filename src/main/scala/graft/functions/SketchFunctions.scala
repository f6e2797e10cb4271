package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Sketch-probe primitives. Spark's `BloomFilterMightContain` is the codegen
  * expression its own `InjectRuntimeFilter` rule emits on the probe side of a
  * runtime bloom join (probe = `mightContainLong` over an `XxHash64` of the
  * key, build = `BloomFilterAggregate` putting the same hashes), but it is
  * NOT registered as a user-callable SQL function — so pipelines that build
  * a sketch themselves (q22d's incremental-ingest dedup: sketch the day's
  * batch, prefilter the archive scan) had to fall back to a scalar UDF.
  * Registering the existing expression under `bloom_might_contain` gives
  * those pipelines the native whole-stage-codegen probe with zero custom
  * evaluation code.
  */
object SketchFunctions {

  /** Idempotently register `bloom_might_contain(sketchBytes, xxhash64Value)`
    * in the session's function registry (own name: if a future Spark exposes
    * the builtin as `might_contain`, the two coexist). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("bloom_might_contain")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
        (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1)))
    }
    // the BUILD side of the same pair (VERDICT r13 #4): Spark's
    // `BloomFilterAggregate` — the TypedImperativeAggregate
    // InjectRuntimeFilter emits — builds the sketch DISTRIBUTED (per-task
    // partial filters OR-merged up the agg tree), so no `df.stat
    // .bloomFilter` driver materialization and no multi-GB filter literal
    // baked into task binaries; the expression itself clamps
    // estimatedNumItems/numBits to the runtime-bloom-filter conf caps.
    val idAgg = FunctionIdentifier("bloom_sketch_agg")
    if (!reg.functionExists(idAgg)) {
      reg.registerFunction(
        idAgg,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_sketch_agg"),
        (exprs: Seq[Expression]) => exprs match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, n) => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
          case other => throw new IllegalArgumentException(
            s"bloom_sketch_agg expects 1-3 args, got ${other.size}")
        })
    }
  }

  /** Probe a serialized `org.apache.spark.util.sketch.BloomFilter` (binary
    * literal or scalar subquery) with an `xxhash64(...)` long — the sketch
    * must have been built over the same `xxhash64` hashes (requires
    * [[register]]). */
  def bloomMightContain(sketch: Column, valueHash: Column): Column =
    call_function("bloom_might_contain", sketch, valueHash)

  /** Aggregate a column of `xxhash64(...)` longs into a serialized Bloom
    * filter, built distributed with map-side partials (requires
    * [[register]]). `fpp` sizes the bit array via the standard
    * `-n·ln(p)/ln²2` formula (the sketch library's own sizing); the
    * expression clamps the result to the runtime-bloom-filter conf cap, so
    * a mis-estimated `expected` degrades the false-positive rate — never
    * driver or executor memory. Consume via `.agg(...).scalar()`: the
    * probe side then carries a scalar subquery, not a literal. */
  def bloomSketchAgg(valueHash: Column, expected: Long, fpp: Double): Column = {
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expected, fpp)
    call_function("bloom_sketch_agg", valueHash,
      org.apache.spark.sql.functions.lit(expected),
      org.apache.spark.sql.functions.lit(numBits))
  }
}
