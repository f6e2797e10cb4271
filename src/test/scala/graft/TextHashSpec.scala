package graft

import graft.functions.TextHash._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** TextHash semantics: shingling edge cases, signature determinism, and the
  * MinHash estimate's statistical sanity (SURVEY.md §5.2.4, §7.3.5). */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  private def shinglesOf(text: String): Seq[String] =
    Seq(text).toDF("t").select(shingles(tokens(col("t"))).as("s"))
      .as[Seq[String]].head()

  test("shingles: 3-token windows joined by spaces") {
    assert(shinglesOf("a b c d") === Seq("a b c", "b c d"))
  }

  test("shingles: docs shorter than n collapse to one shorter shingle") {
    assert(shinglesOf("a b") === Seq("a b"))
    assert(shinglesOf("a") === Seq("a"))
  }

  test("hash32 is deterministic and within [0, 2^32)") {
    val h = Seq("tok", "tok", "other").toDF("t").select(hash32(col("t"))).as[Long].collect()
    assert(h(0) === h(1))
    assert(h(0) !== h(2))
    assert(h.forall(x => x >= 0 && x < (1L << 32)))
  }

  test("minhash estimate tracks exact jaccard for similar docs") {
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val b = ((1 to 45).map(i => s"w$i") ++ (1 to 5).map(i => s"x$i")).mkString(" ")
    val df = Seq((a, b)).toDF("a", "b")
      .select(
        array_distinct(hashArray(shingles(tokens(col("a"))))).as("sa"),
        array_distinct(hashArray(shingles(tokens(col("b"))))).as("sb"))
      .select(
        estJaccard(minhashSig(col("sa")), minhashSig(col("sb"))).as("est"),
        jaccard(col("sa"), col("sb")).as("exact"))
      .as[(Double, Double)].head()
    // 16 slots is coarse: just require the estimate to be in the right region
    assert(math.abs(df._1 - df._2) <= 0.35, s"est=${df._1} exact=${df._2}")
  }

  test("identical docs: est jaccard 1.0, all LSH bands collide") {
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val out = Seq((doc, doc)).toDF("a", "b")
      .select(
        minhashSig(array_distinct(hashArray(shingles(tokens(col("a")))))).as("sa"),
        minhashSig(array_distinct(hashArray(shingles(tokens(col("b")))))).as("sb"))
      .select(
        estJaccard(col("sa"), col("sb")).as("est"),
        lshBandKeys(col("sa")).as("ba"),
        lshBandKeys(col("sb")).as("bb"))
      .as[(Double, Seq[Long], Seq[Long])].head()
    assert(out._1 === 1.0)
    assert(out._2 === out._3)
    assert(out._2.length === Bands)
  }

  test("simhash16 stays within 16 bits; near-identical docs land within hamming 2") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val out = Seq((base, near)).toDF("a", "b")
      .select(
        simhash16(hashArray(tokens(col("a")))).as("ha"),
        simhash16(hashArray(tokens(col("b")))).as("hb"))
      .select(col("ha"), col("hb"), hamming(col("ha"), col("hb")).as("d"))
      .as[(Long, Long, Int)].head()
    assert(out._1 >= 0 && out._1 < 65536)
    assert(out._3 <= 2, s"hamming=${out._3}")
  }

  test("fingerprint is order-sensitive") {
    val fp = Seq("a b c", "c b a").toDF("t")
      .select(fingerprint(hashArray(tokens(col("t"))))).as[Long].collect()
    assert(fp(0) !== fp(1))
  }

  test("property: jaccard is 1 for identical token sets, regardless of order") {
    val gen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
    val samples = (0 until 20).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(samples.nonEmpty)
    val df = samples.map(ws => (ws.mkString(" "), ws.reverse.mkString(" ")))
      .toDF("a", "b")
      .select(jaccard(
        array_distinct(hashArray(tokens(col("a")))),
        array_distinct(hashArray(tokens(col("b"))))))
      .as[Double].collect()
    assert(df.forall(_ === 1.0))
  }
}
