package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every oracle SQL string in [[SparkEntry.oracleSql]].
  *
  * DuckDB types `SUM(<integer>)` as HUGEINT (INT128) while Spark emits
  * BIGINT; values compare equal but the driver's correctness hash is
  * type-sensitive, so any raw integer SUM that reaches the oracle's output
  * columns hash-mismatches even when every value agrees (the round-3
  * q22c/q25h/q33/q35/q36 failure class). This spec pins the rule: every
  * aliased `SUM(...)` in an oracle query must be guarded by a surrounding
  * `CAST(... AS BIGINT/DOUBLE)` or a `::` cast, unless the alias is a known
  * intermediate CTE column that provably never reaches the final SELECT
  * untouched (listed below with the reason).
  */
class OracleSqlSpec extends AnyFunSuite {

  /** (query, alias) pairs allowed to stay uncast: CTE-internal columns that
    * are only ever consumed inside DOUBLE arithmetic or GROUP BY keys, never
    * emitted raw by the final SELECT. Adding an entry here requires checking
    * the query's final output columns by hand.
    */
  private val knownIntermediate: Set[(String, String)] = Set(
    // q20b: sid is the gaps-and-islands session key, GROUP BY only
    ("q20b_session_window", "sid"),
    // q24d: sig is re-sliced into 4-bit band values (`sig // 16^j % 16`)
    ("q24d_lsh_neardup_pairs", "sig"),
    // q60b: same shared sig CTE, same band re-slicing — never emitted
    ("q60b_lsh_decontamination", "sig"),
    // q25h: consumed via ::DOUBLE ratios (ttr, mean_wlen, top_bigram_frac)
    ("q25h_quality_rules", "n_types"),
    ("q25h_quality_rules", "wlen_sum"),
    ("q25h_quality_rules", "n_bg"),
    // q44: q25h's quality CTEs verbatim — the same three sums, consumed
    // only via ::DOUBLE ratios inside the `q` keep-filter, never emitted
    // (the final SELECT outputs packing integers only)
    ("q44_curation_pipeline", "n_types"),
    ("q44_curation_pipeline", "wlen_sum"),
    ("q44_curation_pipeline", "n_bg"),
    // q45/q46: the same prefixed quality blocks (instantiations of ONE
    // builder), same ::DOUBLE-only consumption
    ("q45_incremental_curation", "n_types"),
    ("q45_incremental_curation", "wlen_sum"),
    ("q45_incremental_curation", "n_bg"),
    // q45b: q45's oracle text VERBATIM (stream-batch parity) — same
    // vetted intermediates
    ("q45b_streaming_curation", "n_types"),
    // q66: composes q25h's m-chain verbatim (sqlQualityMCtes) — same
    // vetted intermediates, consumed only inside the rule predicate
    ("q66_classifier_calibration", "n_types"),
    ("q66_classifier_calibration", "wlen_sum"),
    ("q66_classifier_calibration", "n_bg"),
    ("q45b_streaming_curation", "wlen_sum"),
    ("q45b_streaming_curation", "n_bg"),
    // q45c: q45's oracle text VERBATIM (engine-state variant) — same
    // vetted intermediates
    ("q45c_streaming_curation_tws", "n_types"),
    ("q45c_streaming_curation_tws", "wlen_sum"),
    ("q45c_streaming_curation_tws", "n_bg"),
    ("q46_corpus_datacard", "n_types"),
    ("q46_corpus_datacard", "wlen_sum"),
    ("q46_corpus_datacard", "n_bg"),
    // q47: gid is the gaps-and-islands key (window SUM of 0/1 breaks),
    // GROUP BY only in the sp CTE — never emitted
    ("q47_substring_dedup", "gid"),
    // q47b: the shared span tail's same key (GROUP BY doc_id, gid only)
    ("q47b_incremental_substring", "gid"),
    // q63c: q47's oracle SQL VERBATIM (sqlExactSubstrOracle) — same
    // gaps-and-islands key, same GROUP-BY-only consumption
    ("q63c_sa_substring_dedup", "gid"),
    // q63d: the same shared span tail at width SaMinMatch
    ("q63d_sa_substring_minmatch", "gid"),
    // q63f: the same shared span tail at the q63e-recommended width
    ("q63f_recommended_removal", "gid"),
    // q67: the q24d/q60b shared sig CTE — re-sliced into band values,
    // never emitted
    ("q67_embedding_drift", "sig"),
    // q67b: the same shared sig CTE, chained per-night band re-slicing
    ("q67b_chained_embedding_drift", "sig"),
    // q58: same gaps-and-islands key, intra-doc (GROUP BY doc_id, gid only)
    ("q58_repetition_filter", "gid"),
    // q25k: total_tok only feeds the DOUBLE BM25 length norm; score_fp is
    // emitted as `score_fp / 1000000.0` (DOUBLE division) and ORDER BY
    ("q25k_bm25_search", "total_tok"),
    ("q25k_bm25_search", "score_fp"),
    // q24i: each conditional SUM in the ADC chain sees exactly ONE row
    // (a (qid, vec_id) group has one entry per subspace m), so the value
    // is a fixed-order 16-term double chain — deterministic by design,
    // and the same expression order runs on the Spark side.
    ("q24i_pq_topk", "dotv"),
    // q24l: the identical fixed-order ADC chain, over the IVF-routed subset
    ("q24l_ivfpq_topk", "dotv"),
    // q24m: shares q24l's oracle text verbatim (cell-partitioned layout
    // changes I/O, never the statement), so the same vetted chain applies
    ("q24m_ivfpq_partitioned", "dotv"),
    // q24o: q24l's chain with one extra candidate predicate — same vetted
    // fixed-order ADC sum
    ("q24o_filtered_topk", "dotv"),
    // q24p: q24l's chain over the merged (standing ∪ appended) codes —
    // same vetted fixed-order ADC sum, codes just come from two sources
    ("q24p_incremental_ivfpq", "dotv"),
    // q68: the composite's oracle embeds its constituents' vetted texts as
    // subqueries — these are the SAME sums already vetted under q44/q45
    // (n_types/wlen_sum/n_bg: ::DOUBLE-ratio-only quality intermediates,
    // appearing twice — curation history + batch blocks), q47b (gid: the
    // span tail's GROUP BY key), and q67 (sig: re-sliced into band values)
    ("q68_night_report", "n_types"),
    ("q68_night_report", "wlen_sum"),
    ("q68_night_report", "n_bg"),
    ("q68_night_report", "gid"),
    ("q68_night_report", "sig")
    // (q24n's dotv is the same chain plus a trailing parenthesized offset
    // addition — not alias-of-a-raw-SUM shaped, so the lint doesn't match
    // it and no entry is needed)
  )

  private case class RawSum(alias: String, snippet: String)

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s(i).isWhitespace) i += 1
    i
  }

  /** Index just past the ')' matching the '(' at `open`. */
  private def pastBalanced(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    s.length
  }

  /** Aliased `SUM(...) [OVER ...] AS alias` occurrences with neither a
    * surrounding `CAST(` nor a trailing `::` cast.
    */
  private def rawAliasedSums(sql: String): Seq[RawSum] = {
    val up = sql.toUpperCase
    val found = Seq.newBuilder[RawSum]
    var idx = up.indexOf("SUM(")
    while (idx >= 0) {
      val wordChar = idx > 0 && (up(idx - 1).isLetterOrDigit || up(idx - 1) == '_')
      if (!wordChar) {
        val prefix = sql.substring(0, idx).reverse.dropWhile(_.isWhitespace).reverse
        // word-anchored: `CAST(` / `TRY_CAST(` only — a suffix match alone
        // would also accept non-cast wrappers that merely END in "CAST("
        // (e.g. BROADCAST"("), silently passing the lint without a cast
        val castGuarded =
          "(?i)(^|[^A-Za-z0-9_])(TRY_)?CAST\\($".r.findFirstIn(prefix).isDefined
        var end = pastBalanced(sql, idx + 3)
        var j = skipWs(sql, end)
        if (up.startsWith("OVER", j)) { // window form: OVER (...) or OVER w
          j = skipWs(sql, j + 4)
          if (j < sql.length && sql(j) == '(') j = pastBalanced(sql, j)
          else while (j < sql.length && (sql(j).isLetterOrDigit || sql(j) == '_')) j += 1
          end = j
        }
        val after = skipWs(sql, end)
        val colonGuarded = up.startsWith("::", after)
        if (!castGuarded && !colonGuarded && up.startsWith("AS", after) &&
          after + 2 < sql.length && sql(after + 2).isWhitespace) {
          val aliasStart = skipWs(sql, after + 2)
          var k = aliasStart
          while (k < sql.length && (sql(k).isLetterOrDigit || sql(k) == '_')) k += 1
          found += RawSum(
            sql.substring(aliasStart, k),
            sql.substring(idx, math.min(sql.length, end)).replaceAll("\\s+", " "))
        }
      }
      idx = up.indexOf("SUM(", idx + 1)
    }
    found.result()
  }

  test("no oracle SQL aliases an uncast integer SUM outside the allowlist") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      rs <- rawAliasedSums(sql)
      if !knownIntermediate.contains((name, rs.alias))
    } yield s"$name: `${rs.snippet} AS ${rs.alias}` — wrap in CAST(... AS BIGINT) " +
      "or add a vetted knownIntermediate entry"
    assert(offenders.isEmpty, offenders.mkString("\n", "\n", ""))
  }

  test("the allowlist carries no stale entries") {
    val present = (for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      rs <- rawAliasedSums(sql)
    } yield (name, rs.alias)).toSet
    val stale = knownIntermediate -- present
    assert(stale.isEmpty, s"remove fixed/renamed entries: $stale")
  }
}
