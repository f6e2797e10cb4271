package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the tiny-doc contract of the combined signature frame
  * (DedupQueries.sigTokFrame): documents with fewer tokens than the shingle
  * width — including empty/whitespace-only text — still receive a complete
  * signature row (non-empty shingle set, fully-populated minhash slots), so
  * the q23 family's engine/oracle parity cannot diverge on degenerate docs.
  * ADVICE round 2 flagged this edge as unpinned. */
class DedupEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val d = TempDirs.create("graft_tinydocs_")
    Seq(
      (0L, "alpha beta gamma delta", "en", "src0", 22L), // >= shingle width
      (1L, "solo", "en", "src0", 4L),                    // 1 token
      (2L, "two tokens", "en", "src0", 10L),             // 2 tokens < width 3
      (3L, "", "en", "src0", 0L),                        // empty text
      (4L, "   ", "en", "src0", 3L)                      // whitespace only
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows: Map[Long, Row] =
    DedupQueries.sigTokFrame(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("every non-null-text doc gets a signature row") {
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("tiny docs yield exactly one shingle, never an empty shingle set") {
    val nShingles = DedupQueries.sigTokFrame(spark, fixtureDir)
      .select(col("doc_id"), size(col("shash")))
      .as[(Long, Int)].collect().toMap
    assert(nShingles(0L) === 2) // 4 tokens -> 2 three-token shingles
    assert(nShingles(1L) === 1)
    assert(nShingles(2L) === 1)
    // empty + whitespace text both tokenize to [""] -> one shingle of ""
    assert(nShingles(3L) === 1)
    assert(nShingles(4L) === 1)
  }

  test("minhash slots are fully populated for every doc") {
    val nulls = DedupQueries.sigTokFrame(spark, fixtureDir)
      .select(size(filter(col("sig"), _.isNull)).as("n"))
      .as[Int].collect()
    assert(nulls.forall(_ === 0))
  }

  test("empty and whitespace-only text share one identical signature") {
    assert(rows(3L).getAs[scala.collection.Seq[Long]]("sig") ===
      rows(4L).getAs[scala.collection.Seq[Long]]("sig"))
    assert(rows(3L).getAs[Long]("simhash") === rows(4L).getAs[Long]("simhash"))
  }

  private def byName(name: String) =
    DedupQueries.defs.find(_.name == name).get.df

  test("q23g components are a fixpoint refining q23e's one-hop canon") {
    val comp = byName("q23g_connected_components")(spark, sf)
      .select("doc_id", "comp").as[(Long, Long)].collect().toMap
    // every confirmed near-dup pair is in one component (edge consistency —
    // the fixpoint property one-hop canonicalization lacks)
    val pairs = byName("q23b_minhash_lsh_pairs")(spark, sf)
      .select("da", "db").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(comp(a) === comp(b), s"pair ($a,$b) split across components")
    }
    // the component label is the minimum member id
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min === c, s"component $c not labeled by its min member")
    }
    // components only coarsen the one-hop canon: comp(d) <= canon(d) <= doc_id
    val canon = byName("q23e_dup_canon")(spark, sf)
      .select("doc_id", "canon").as[(Long, Long)].collect().toMap
    canon.foreach { case (d, cn) =>
      assert(comp(d) <= cn, s"doc $d: component ${comp(d)} above canon $cn")
    }
  }

  test("streaming near-dup gate never misses a confirmed batch near-dup") {
    // q29c flags on band collision BEFORE the Jaccard confirm, so its
    // flagged set must cover every member of every q23b confirmed pair
    // (banding can over-flag, never under-flag a confirmed neighbor) —
    // the recall contract that makes the gate safe as an ingest filter.
    val flagged = byName("q29c_stream_neardup_gate")(spark, sf)
      .filter("flagged").select("doc_id").as[Long].collect().toSet
    val pairs = byName("q23b_minhash_lsh_pairs")(spark, sf)
      .select("da", "db").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && flagged.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(flagged(a) && flagged(b),
        s"confirmed pair ($a,$b) not fully flagged by the gate")
    }
  }
}
