package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector primitives for the similarity-search operators (SURVEY.md
  * §2.11 X3): a Catalyst `Expression` with whole-stage codegen for the
  * float-vector dot product, and a bounded top-k `Aggregator`.
  *
  * Why an Expression and not a UDF / higher-order functions: the dot product
  * sits in the innermost loop of every similarity query (N·Q evaluations).
  * A Scala UDF pays serialization per call; `zip_with`+`aggregate` evaluate
  * interpreted per element. `VectorDot.doGenCode` emits a plain Java loop
  * over the two `ArrayData` float buffers that the Janino compiler inlines
  * into the surrounding whole-stage-codegen'd operator — no allocation, no
  * virtual calls per element.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  /** Sums in index order, each float widened to double — the same fold the
    * DuckDB oracle runs, so results are bit-identical. Arrays of unequal
    * length dot over the common prefix. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0d
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration + Column API for the vector expressions. */
object VecFunctions {

  /** Idempotently register `vec_dot` in the session's function registry.
    * (Also injectable via `spark.sql.extensions=graft.plans.GraftExtensions`
    * for sessions built outside this library.) */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("vec_dot")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
        (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1)))
    }
  }

  /** Dot product of two array<float> columns (requires [[register]]). */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}

/** Bounded top-k aggregator: keeps the k best (score desc, id asc) pairs.
  *
  * This is the scale-safe top-k-per-group shape: partial aggregation keeps
  * at most k entries per map task, so the shuffle carries k rows per
  * (group × task) instead of the full candidate set — unlike
  * `collect_list`+`slice` (unbounded partial state) or a window function
  * (shuffles every candidate row to the group's reducer). With few groups
  * (e.g. 10 query vectors over 10^9 candidates) that difference is the whole
  * game.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k || ord.lt(x, buf.last)) ((buf :+ x).sorted(ord)).take(k)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
