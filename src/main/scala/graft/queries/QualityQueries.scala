package graft.queries

import graft.functions.TextHash.{hash32, shingles, sqlHash32, sqlShingles, sqlTokens, tokens}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Q25h–Q25j — document-quality and dataset-hygiene operators (SURVEY.md
  * §2.11 X4 extensions): repetition-based quality rules, pattern redaction,
  * and deterministic train/val/test split assignment. The three passes a
  * training-data pipeline runs between raw ingest and tokenization.
  *
  * Scale design: the quality rules are the only query with a shuffle (two,
  * both keyed on doc_id-dominated composites with map-side partial
  * aggregation — the sigTokFrame shape); redaction and split assignment are
  * pure per-row projections that ride the scan at any scale.
  */
object QualityQueries {

  /** Quality-rule thresholds (Gopher-style repetition bounds, scaled to the
    * synthetic corpus's ~30-word vocabulary). Emitted as literals into both
    * the Column and SQL forms. */
  private[queries] val MinMeanWordLen = 3.0
  private[queries] val MaxMeanWordLen = 10.0
  private[queries] val MinTypeTokenRatio = 0.4
  private[queries] val MaxTopBigramFrac = 0.07

  /** Split assignment: hash32("split:" + doc_id) mod 100 → 90/5/5. */
  private[queries] val ValFrom = 90
  private[queries] val TestFrom = 95

  /** q48 feature-hashing buckets (fastText's default is 2M bigram buckets;
    * scaled to the synthetic vocabulary) and the Knuth multiplier that
    * derives the deterministic stand-in weight for bucket b. */
  private[queries] val ClsBuckets = 4096
  private[queries] val ClsA = 2654435761L

  /** q48's per-doc classifier accumulation — (doc_id, n_feats, wsum) —
    * shared with q50's keep-best-per-cluster selection. CTE names are
    * c-prefixed so the text composes into oracles that already bind
    * src/tok/bg (the dedup family's signature CTEs). */
  private[queries] val sqlClsCtes: String =
    s"""csrc AS (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |ctok AS (SELECT doc_id, unnest(toks) AS v FROM csrc),
       |cbg AS (SELECT doc_id, unnest(${sqlShingles("toks", n = 2)}) AS v FROM csrc
       |        WHERE len(toks) >= 2),
       |ch AS (SELECT doc_id, (${sqlHash32("v")}) % $ClsBuckets AS b
       |       FROM (SELECT * FROM ctok UNION ALL SELECT * FROM cbg)),
       |cm AS (SELECT doc_id, COUNT(*) AS n_feats,
       |  CAST(SUM(((b + 1) * $ClsA) % ${graft.functions.TextHash.Mod} % 1001 - 500) AS BIGINT) AS wsum
       |  FROM ch GROUP BY doc_id)""".stripMargin

  /** Spark twin of [[sqlClsCtes]]: feature explode → one doc_id-keyed
    * aggregation with map-side partials. (private[graft]: DedupEdgeSpec
    * re-derives the q50 ranking key from it.) */
  private[graft] def clsScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val src = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val tok = src.select(col("doc_id"), explode(col("toks")).as("v"))
    val bg = src.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(shingles(col("toks"), n = 2)).as("v"))
    tok.unionByName(bg)
      .select(col("doc_id"), (hash32(col("v")) % ClsBuckets).as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum((col("b") + 1) * ClsA % graft.functions.TextHash.Mod % 1001 - 500)
          .as("wsum"))
  }

  val defs: Seq[QueryDef] = Seq(
    // X4+/Q25h — repetition/quality filter rules: per document, mean word
    // length, type-token ratio, and the frequency share of the most-repeated
    // bigram; a doc is kept iff all three sit inside the configured bounds —
    // the Gopher-style heuristic battery that runs before any model-based
    // quality scoring. Shape: one exploded union of token and bigram
    // streams → ONE (doc_id, kind, value) counting aggregation (map-side
    // partials compress the exploded rows before the shuffle) → one per-doc
    // aggregation. Both shuffles are linear in corpus token count — the
    // sigTokFrame recipe, so the pass scales exactly like signature
    // computation does.
    QueryDef(
      "q25h_quality_rules",
      s"""WITH src AS (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
         |tok AS (SELECT doc_id, 0 AS kind, unnest(toks) AS v FROM src),
         |bg AS (SELECT doc_id, 1 AS kind,
         |  unnest(${sqlShingles("toks", n = 2)}) AS v FROM src
         |  WHERE len(toks) >= 2),
         |c AS (SELECT doc_id, kind, v, COUNT(*) AS cnt
         |      FROM (SELECT * FROM tok UNION ALL SELECT * FROM bg)
         |      GROUP BY doc_id, kind, v),
         |m AS (SELECT doc_id,
         |  CAST(SUM(CASE WHEN kind = 0 THEN cnt ELSE 0 END) AS BIGINT) AS n_tok,
         |  SUM(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS n_types,
         |  SUM(CASE WHEN kind = 0 THEN cnt * length(v) ELSE 0 END) AS wlen_sum,
         |  MAX(CASE WHEN kind = 1 THEN cnt END) AS top_bg,
         |  SUM(CASE WHEN kind = 1 THEN cnt ELSE 0 END) AS n_bg
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tok,
         |  round(wlen_sum::DOUBLE / n_tok, 6) AS mean_wlen,
         |  round(n_types::DOUBLE / n_tok, 6) AS ttr,
         |  round(COALESCE(top_bg, 0)::DOUBLE / greatest(n_bg, 1), 6) AS top_bigram_frac,
         |  (wlen_sum::DOUBLE / n_tok BETWEEN $MinMeanWordLen AND $MaxMeanWordLen
         |   AND n_types::DOUBLE / n_tok >= $MinTypeTokenRatio
         |   AND COALESCE(top_bg, 0)::DOUBLE / greatest(n_bg, 1) <= $MaxTopBigramFrac)
         |    AS keep
         |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val tok = src.select(col("doc_id"), lit(0).as("kind"), explode(col("toks")).as("v"))
      // shingles() floors its output at one shingle even for 1-token docs,
      // which would fabricate a "bigram" — the length guard keeps the
      // bigram stream exact (matching the oracle's WHERE len(toks) >= 2)
      val bg = src.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), lit(1).as("kind"),
          explode(shingles(col("toks"), n = 2)).as("v"))
      val m = tok.unionByName(bg)
        .groupBy(col("doc_id"), col("kind"), col("v"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("kind") === 0, col("cnt")).otherwise(0L)).as("n_tok"),
          sum(when(col("kind") === 0, 1L).otherwise(0L)).as("n_types"),
          sum(when(col("kind") === 0, col("cnt") * length(col("v"))).otherwise(0L))
            .as("wlen_sum"),
          max(when(col("kind") === 1, col("cnt"))).as("top_bg"),
          sum(when(col("kind") === 1, col("cnt")).otherwise(0L)).as("n_bg"))
      val meanWlen = col("wlen_sum").cast("double") / col("n_tok")
      val ttr = col("n_types").cast("double") / col("n_tok")
      val topBgFrac =
        coalesce(col("top_bg"), lit(0L)).cast("double") / greatest(col("n_bg"), lit(1L))
      m.select(
          col("doc_id"), col("n_tok"),
          round(meanWlen, 6).as("mean_wlen"),
          round(ttr, 6).as("ttr"),
          round(topBgFrac, 6).as("top_bigram_frac"),
          (meanWlen.between(MinMeanWordLen, MaxMeanWordLen) &&
            ttr >= MinTypeTokenRatio && topBgFrac <= MaxTopBigramFrac).as("keep"))
        .orderBy("doc_id")
    },

    // X4+/Q25i — pattern redaction: replace every digit run in the event
    // payload with a placeholder and count the matches — the shape of a PII
    // scrubbing pass (emails/phones/SSNs are the same machinery with wider
    // regexes). Pure per-row projection: the regex runs inside the scan
    // projection with no shuffle, so the pass is embarrassingly parallel at
    // any scale. Spark's regexp_replace is replace-all by default; DuckDB
    // needs the explicit 'g' flag — a cross-engine semantic the oracle pins.
    QueryDef(
      "q25i_pattern_redaction",
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
        |  len(regexp_extract_all(props, '[0-9]+')) AS n_matches,
        |  len(regexp_extract_all(props, '[0-9]+')) > 0 AS has_match
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("redacted"),
          regexp_count(col("props"), lit("[0-9]+")).cast("long").as("n_matches"),
          (regexp_count(col("props"), lit("[0-9]+")) > 0).as("has_match"))
        .orderBy("event_id")
    },

    // X4+/Q25j — deterministic train/val/test split: bucket =
    // hash32("split:" + doc_id) mod 100, split by fixed cut points (90/5/5).
    // Hash-based assignment is stable across runs, engines, and data
    // re-shuffles (no RNG state, no global sort), keyed on the document's
    // identity — adding documents never reassigns existing ones, which is
    // the property that keeps eval sets frozen as the corpus grows. Rides
    // the scan: no shuffle, no driver participation.
    QueryDef(
      "q25j_split_assign",
      s"""SELECT doc_id,
         |  ${sqlHash32("concat('split:', doc_id)")} % 100 AS bucket,
         |  CASE WHEN ${sqlHash32("concat('split:', doc_id)")} % 100 >= $TestFrom THEN 'test'
         |       WHEN ${sqlHash32("concat('split:', doc_id)")} % 100 >= $ValFrom THEN 'val'
         |       ELSE 'train' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bucket = hash32(concat(lit("split:"), col("doc_id"))) % 100
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          bucket.as("bucket"),
          when(bucket >= TestFrom, "test")
            .when(bucket >= ValFrom, "val")
            .otherwise("train").as("split"))
        .orderBy("doc_id")
    },

    // X4+/Q48 — fastText-style hashed linear quality classifier (the
    // model-based scoring pass that runs AFTER q25h's rule battery — the
    // CCNet / LLaMA-corpus "quality classifier" stage): features are
    // unigrams + bigrams hashed into [[ClsBuckets]] buckets, the score is
    // the mean bucket weight, keep = positive score. Weights here are a
    // deterministic integer hash of the bucket index (a stand-in for
    // trained coefficients — the PLUMBING is the operator: feature
    // hashing, per-doc accumulation, thresholding; swap the weight
    // expression for a broadcast lookup of learned values and nothing
    // else changes). All-integer accumulation (weights in [-500, 500],
    // exact SUM) keeps the score bit-identical across engines — no
    // float-order dependence, no exp(). Shape is the q25h recipe: two
    // codegen'd exploded streams → ONE count/sum aggregation keyed on
    // doc_id with map-side partials; linear at 100 TB, no driver state.
    QueryDef(
      "q48_quality_classifier",
      s"""WITH $sqlClsCtes
         |SELECT doc_id, n_feats,
         |  round(wsum::DOUBLE / (n_feats * 500.0), 6) AS score,
         |  wsum > 0 AS keep
         |FROM cm ORDER BY doc_id""".stripMargin) { (s, dir) =>
      clsScored(s, dir).select(col("doc_id"), col("n_feats"),
          round(col("wsum").cast("double") / (col("n_feats") * 500.0), 6).as("score"),
          (col("wsum") > 0).as("keep"))
        .orderBy("doc_id")
    }
  )
}
