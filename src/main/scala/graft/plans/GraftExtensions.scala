package graft.plans

import graft.functions.{CdcChunkFps, VectorDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension injector: makes the engine's native functions available
  * to any session built with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (the sanctioned public hook — no internal API needed). In-library code
  * paths use [[graft.functions.VecFunctions.register]] instead, which covers
  * sessions the caller already built. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunk_fps"),
      new ExpressionInfo(classOf[CdcChunkFps].getName, "cdc_chunk_fps"),
      (exprs: Seq[Expression]) => CdcChunkFps(exprs.head)))
  }
}
