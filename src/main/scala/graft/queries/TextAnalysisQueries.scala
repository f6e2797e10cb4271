package graft.queries

import graft.functions.TextHash.{sqlTokens, tokens}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q25 — text analysis over the `documents` table (SURVEY.md §2.11 X4;
  * BASELINE.json north star): token counting (whitespace + BPE-ish regex),
  * quality scoring, n-gram-heuristic language ID, per-language aggregates,
  * and a corpus token histogram.
  *
  * All per-document metrics are narrow projections riding the scan; the
  * corpus-level queries (per-lang aggregates, token histogram) are single
  * hash aggregations with map-side partial state — the shapes that stay
  * linear at 100 TB. Language-ID marker lists and the quality formula are
  * shared constants between the Column form and the generated DuckDB SQL.
  */
object TextAnalysisQueries {

  /** Marker stopwords per language, used by both the quality score (en) and
    * the language-ID vote. Alphabetical language order is the tie-break. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我", "不", "这"))

  private[queries] val enStops = Markers.toMap.apply("en")

  /** BPE-ish tokenizer: letter runs, digit runs, single punctuation. */
  private val BpePat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Punctuation class for the quality score. */
  private[queries] val PunctPat = "[.,!?;:()\\[\\]{}-]"

  private[queries] def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  private[queries] def sqlMarkerCount(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Argmax over per-language scores with alphabetical tie-break, generated
    * as one CASE chain on both sides (first language whose score is >= all
    * later ones wins, scanning alphabetically). */
  private[queries] def predictLang(scores: Seq[(String, Column)]): Column =
    scores.init
      .zipWithIndex
      .foldRight(lit(scores.last._1)) { case (((lang, s), i), elseCol) =>
        val rest = scores.drop(i + 1).map(_._2)
        when(rest.map(s >= _).reduce(_ && _), lit(lang)).otherwise(elseCol)
      }

  private[queries] def sqlPredictLang(scores: Seq[(String, String)]): String = {
    val cases = scores.init.zipWithIndex.map { case ((lang, s), i) =>
      val cond = scores.drop(i + 1).map { case (_, o) => s"$s >= $o" }.mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  val defs: Seq[QueryDef] = Seq(
    // X4/Q25 — per-doc stats + quality score: whitespace and BPE-ish token
    // counts, stopword/punctuation ratios, composite quality in [0,1].
    QueryDef(
      "q25_text_stats",
      s"""WITH src AS (SELECT doc_id, text, ${sqlTokens("text")} AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(regexp_extract_all(text, '$BpePat')) AS n_tokens_bpe,
         |  length(text) AS n_chars_m,
         |  ${sqlMarkerCount("toks", enStops)} AS n_stop,
         |  length(text) - length(regexp_replace(text, '$PunctPat', '', 'g')) AS n_punct
         |  FROM src)
         |SELECT doc_id, n_tokens, n_tokens_bpe, n_chars_m,
         |  round(n_stop::DOUBLE / n_tokens, 6) AS stop_ratio,
         |  round(n_punct::DOUBLE / n_chars_m, 6) AS punct_ratio,
         |  round(0.5 * least(1.0, n_tokens / 100.0)
         |      + 0.3 * (n_stop::DOUBLE / n_tokens)
         |      + 0.2 * (1.0 - n_punct::DOUBLE / n_chars_m), 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = tokens(col("text"))
      val m = Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePat), lit(0))).cast("long").as("n_tokens_bpe"),
        length(col("text")).cast("long").as("n_chars_m"),
        markerCount(toks, enStops).cast("long").as("n_stop"),
        (length(col("text")) - length(regexp_replace(col("text"), PunctPat, "")))
          .cast("long").as("n_punct"))
      m.select(
        col("doc_id"), col("n_tokens"), col("n_tokens_bpe"), col("n_chars_m"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("stop_ratio"),
        round(col("n_punct").cast("double") / col("n_chars_m"), 6).as("punct_ratio"),
        round(
          lit(0.5) * least(lit(1.0), col("n_tokens") / 100.0)
            + lit(0.3) * (col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.2) * (lit(1.0) - col("n_punct").cast("double") / col("n_chars_m")),
          6).as("quality"))
        .orderBy("doc_id")
    },

    // X4/Q25b — language ID: per-language marker votes, argmax with
    // alphabetical tie-break, compared against the labeled lang.
    QueryDef(
      "q25b_lang_id",
      s"""WITH src AS (SELECT doc_id, lang, ${sqlTokens("text")} AS toks FROM documents),
         |scored AS (SELECT doc_id, lang,
         |${Markers.map { case (l, ws) => s"  ${sqlMarkerCount("toks", ws)} AS s_$l" }
                   .mkString(",\n")}
         |  FROM src)
         |SELECT doc_id, lang,
         |  ${sqlPredictLang(Markers.map { case (l, _) => l -> s"s_$l" })} AS predicted,
         |  (${sqlPredictLang(Markers.map { case (l, _) => l -> s"s_$l" })} = lang) AS agree
         |FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = tokens(col("text"))
      val scored = Tables.documents(s, dir).select(
        col("doc_id") +: col("lang") +:
          Markers.map { case (l, ws) => markerCount(toks, ws).as(s"s_$l") }: _*)
      val pred = predictLang(Markers.map { case (l, _) => l -> col(s"s_$l") })
      scored.select(
        col("doc_id"), col("lang"),
        pred.as("predicted"),
        (pred === col("lang")).as("agree"))
        .orderBy("doc_id")
    },

    // X4/Q25c — per-language corpus aggregates (exact-decimal means).
    QueryDef(
      "q25c_lang_profile",
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |${Det.sqlAvg("n_chars")} AS avg_chars,
         |${Det.sqlAvg(s"len(${sqlTokens("text")})")} AS avg_tokens,
         |MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
         |FROM documents GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          Det.davg(col("n_chars")).as("avg_chars"),
          Det.davg(size(tokens(col("text"))).cast("long")).as("avg_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang", "source")
    },

    // A7+/Q27 — exact interpolated percentiles per group (Spark `percentile`
    // ≡ DuckDB `quantile_cont`). Exact percentiles sort within each group —
    // fine at test scale, the wrong tool at 100 TB; q27b below is the
    // sketch-based scale path.
    QueryDef(
      "q27_value_percentiles",
      """SELECT event_type,
        |round(quantile_cont(value, 0.5), 6) AS p50,
        |round(quantile_cont(value, 0.95), 6) AS p95,
        |round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type")
    },

    // A7+/Q27b — approx_percentile (t-digest-style sketch): bounded-memory
    // partial state, mergeable across partitions — the 100-TB percentile
    // path. Sketch values are engine-specific, so the cross-engine contract
    // is a tolerance: the output carries the exact percentiles plus boolean
    // `*_ok` flags asserting the sketch landed within 5% (+1e-3 absolute
    // slack) of exact. The oracle recomputes the exact columns and expects
    // every flag TRUE — a drifting sketch flips a flag and fails the hash.
    // Output is all-scalar (an array column would crash the driver's
    // canonicalizer).
    QueryDef(
      "q27b_approx_percentiles",
      """SELECT event_type,
        |round(quantile_cont(value, 0.5), 6) AS exact_p50,
        |round(quantile_cont(value, 0.95), 6) AS exact_p95,
        |round(quantile_cont(value, 0.99), 6) AS exact_p99,
        |TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      def ok(approx: Column, exact: Column): Column =
        abs(approx - exact) <= abs(exact) * 0.05 + 0.001
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("approx_percentile(value, array(0.5, 0.95, 0.99), 1000)").as("ap"),
          expr("percentile(value, 0.5)").as("e50"),
          expr("percentile(value, 0.95)").as("e95"),
          expr("percentile(value, 0.99)").as("e99"))
        .select(
          col("event_type"),
          round(col("e50"), 6).as("exact_p50"),
          round(col("e95"), 6).as("exact_p95"),
          round(col("e99"), 6).as("exact_p99"),
          ok(element_at(col("ap"), 1), col("e50")).as("p50_ok"),
          ok(element_at(col("ap"), 2), col("e95")).as("p95_ok"),
          ok(element_at(col("ap"), 3), col("e99")).as("p99_ok"))
        .orderBy("event_type")
    },

    // X4/Q25d — corpus token histogram, top-20: explode + hash-agg with
    // map-side partials + TakeOrderedAndProject (no global sort).
    QueryDef(
      "q25d_token_topk",
      s"""SELECT t AS token, COUNT(*) AS cnt
         |FROM (SELECT unnest(${sqlTokens("text")}) AS t FROM documents)
         |GROUP BY t ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    }
  )
}
