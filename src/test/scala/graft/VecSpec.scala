package graft

import graft.functions.{TopKByScore, VecFunctions, VectorDot}
import org.apache.spark.sql.functions._

/** VectorDot (interpreted + codegen paths) and the bounded top-k
  * aggregator's reduce/merge algebra. */
class VecSpec extends SparkSpec {
  import spark.implicits._

  private def dotOf(a: Seq[Float], b: Seq[Float]): Double = {
    VecFunctions.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(VecFunctions.vecDot(col("a"), col("b")))
      .as[Double].head()
  }

  test("vec_dot matches an index-ordered double fold") {
    val a = Seq(1.5f, -2.0f, 0.25f)
    val b = Seq(4.0f, 0.5f, 8.0f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(dotOf(a, b) === expected)
  }

  test("vec_dot over unequal lengths uses the common prefix") {
    assert(dotOf(Seq(2f, 3f), Seq(10f, 10f, 99f)) === 50.0)
  }

  test("vec_dot survives both eval paths (codegen on, off)") {
    VecFunctions.register(spark)
    val df = (1 to 100).map(i => (Seq.fill(8)(i.toFloat), Seq.fill(8)(2f))).toDF("a", "b")
    val on = df.select(sum(VecFunctions.vecDot(col("a"), col("b")))).as[Double].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(sum(VecFunctions.vecDot(col("a"), col("b")))).as[Double].head()
      assert(on === off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vec_dot expression is codegen-capable (no CodegenFallback)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[VectorDot]))
  }

  test("TopKByScore keeps k best by (score desc, id asc) across merges") {
    val agg = new TopKByScore(3)
    val items = Seq((0.5, 10L), (0.9, 3L), (0.9, 1L), (0.1, 7L), (0.7, 2L))
    val (left, right) = items.splitAt(2)
    val b1 = left.foldLeft(agg.zero)(agg.reduce)
    val b2 = right.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(agg.merge(b1, b2))
    assert(out === Seq((0.9, 1L), (0.9, 3L), (0.7, 2L)))
  }

  test("TopKByScore partial state never exceeds k") {
    val agg = new TopKByScore(2)
    val buf = (1 to 50).map(i => (i / 100.0, i.toLong)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.size === 2)
    assert(buf === Seq((0.5, 50L), (0.49, 49L)))
  }

  test("end-to-end grouped top-k equals a window-ranked result") {
    VecFunctions.register(spark)
    val topk = udaf(new TopKByScore(3))
    val data = (1 to 40).map(i => ((i % 4).toLong, (i * 37 % 100) / 100.0, i.toLong))
    val df = data.toDF("qid", "cos", "vec_id")
    val viaAgg = df.groupBy($"qid").agg(topk($"cos", $"vec_id").as("top"))
      .select($"qid", posexplode($"top").as(Seq("r", "s")))
      .select($"qid", $"s._2".as("vec_id"))
      .as[(Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val viaWin = df.withColumn("rn",
      row_number().over(Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"rn" <= 3).select($"qid", $"vec_id")
      .as[(Long, Long)].collect().toSet
    assert(viaAgg === viaWin)
  }
}
