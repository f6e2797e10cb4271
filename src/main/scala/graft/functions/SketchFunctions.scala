package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
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
  }

  /** Probe a serialized `org.apache.spark.util.sketch.BloomFilter` (binary
    * literal) with an `xxhash64(...)` long — the sketch must have been built
    * over the same `xxhash64` hashes (requires [[register]]). */
  def bloomMightContain(sketch: Column, valueHash: Column): Column =
    call_function("bloom_might_contain", sketch, valueHash)
}
