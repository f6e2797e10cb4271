package graft

import graft.functions.{MinHashAggregator, TextHash}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The aggregator form must produce the exact signatures the explode +
  * codegen-min formulation (DedupQueries.sigFrame) produces. */
class MinHashAggregatorSpec extends SparkSpec {
  import spark.implicits._
  import TextHash._

  private def hashed = Tables.documents(spark, sf)
    .select(col("doc_id"), tokens(col("text")).as("toks"))
    .select(col("doc_id"), explode(shingles(col("toks"))).as("sh"))
    .select(col("doc_id"), hash32(col("sh")).as("h"))

  test("aggregator signatures equal the explode+min formulation") {
    val mh = udaf(new MinHashAggregator())
    val viaAgg = hashed
      .groupBy($"doc_id")
      .agg(mh($"h").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    val mins = (0 until MinhashK).map(i =>
      min((col("h") * permA(i) + permB(i)) % Mod).as(s"m$i"))
    val viaMin = hashed
      .groupBy($"doc_id")
      .agg(mins.head, mins.tail: _*)
      .select($"doc_id", array((0 until MinhashK).map(i => col(s"m$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(viaAgg.keySet === viaMin.keySet)
    viaAgg.foreach { case (id, sig) => assert(sig === viaMin(id), s"doc $id") }
  }

  test("merge is slot-wise min (partial states combine correctly)") {
    val agg = new MinHashAggregator(4)
    val b1 = Seq(100L, 200L).foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq(300L, 50L).foldLeft(agg.zero)(agg.reduce)
    val all = Seq(100L, 200L, 300L, 50L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b1, b2).toSeq === all.toSeq)
  }
}
