package graft.queries

import graft.functions.TextHash.{hash32, sqlHash32, sqlTokens, tokens}
import graft.queries.{TextAnalysisQueries => TA}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q22b/Q25e/Q25f — corpus-curation operators (SURVEY.md §2.11 X1/X4
  * extensions): the composite filters a training-data pipeline actually
  * ships, built from the primitives the individual queries verify.
  *
  * Scale design notes per query below; common to all three: the documents
  * scan stays narrow (only the columns the filter needs), corpus-level
  * statistics (dedup hashes excepted) are tiny aggregates that broadcast
  * back onto the big table, and nothing ever collects to the driver.
  */
object CurationQueries {

  /** q25o packed-sequence length (tokens per training example); matches
    * q25g's shard budget so shard k ≙ sequence k at the same offsets. */
  private[queries] val SeqLen = 2048

  /** q25p chunk geometry: ChunkLen-token windows every ChunkStride tokens
    * (overlap = ChunkLen - ChunkStride). */
  private val ChunkLen = 64
  private val ChunkStride = 48

  /** q25s per-source document cap (docs kept per source, best-first). */
  private val SourceQuota = 10

  /** q53 loader-shard count (production: #loader-workers × a small factor;
    * the permutation salt 'ord:' carries the epoch id in production). */
  private val OrderShards = 32

  /** q62 dynamic-batching knobs: token budget per batch and the loader
    * shard count the per-class running assignment is scoped to (the q53
    * precedent — production scales shards with the cluster). */
  private val BatchBudget = 512L
  private val BatchShards = 32L

  /** Quality score in [0,1] (same formula as q25, shared constants):
    * 0.5·min(1, tokens/100) + 0.3·stopword_ratio + 0.2·(1-punct_ratio). */
  private def qualityCol(text: org.apache.spark.sql.Column,
                         toks: org.apache.spark.sql.Column) = {
    val nTok = size(toks).cast("double")
    val nStop = TA.markerCount(toks, TA.enStops).cast("double")
    val nChars = length(text).cast("double")
    val nPunct = (length(text) - length(regexp_replace(text, TA.PunctPat, ""))).cast("double")
    lit(0.5) * least(lit(1.0), nTok / 100.0) +
      lit(0.3) * (nStop / nTok) +
      lit(0.2) * (lit(1.0) - nPunct / nChars)
  }

  private def sqlQuality(text: String, toks: String): String =
    s"""(0.5 * least(1.0, len($toks) / 100.0)
       | + 0.3 * (${TA.sqlMarkerCount(toks, TA.enStops)}::DOUBLE / len($toks))
       | + 0.2 * (1.0 - (length($text) - length(regexp_replace($text, '${TA.PunctPat}', '', 'g')))::DOUBLE / length($text)))""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // X1+X4/Q22b — the end-to-end curation pass: keep a document iff it is
    // the first copy of its normalized text (exact-dedup rank 1), its
    // quality score clears 0.5, and the n-gram language vote agrees with
    // the labeled language. One window over the text hash (the only
    // shuffle, keyed on the 256-bit hash) + per-row scoring that rides the
    // scan — the linear single-pass shape a 100 TB curation job needs.
    QueryDef(
      "q22b_corpus_curation",
      s"""WITH src AS (SELECT doc_id, lang, text, ${sqlTokens("text")} AS toks FROM documents),
         |m AS (SELECT doc_id, lang,
         |  ROW_NUMBER() OVER (PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) AS dup_rank,
         |  round(${sqlQuality("text", "toks")}, 6) AS quality,
         |  ${TA.sqlPredictLang(TA.Markers.map { case (l, ws) =>
                l -> TA.sqlMarkerCount("toks", ws) })} AS predicted
         |  FROM src)
         |SELECT doc_id, lang, quality, dup_rank
         |FROM m
         |WHERE dup_rank = 1 AND quality >= 0.5 AND predicted = lang
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("toks"))
      val pred = TA.predictLang(
        TA.Markers.map { case (l, ws) => l -> TA.markerCount(col("toks"), ws) })
      src
        .select(
          col("doc_id"), col("lang"),
          row_number().over(
            Window.partitionBy(sha2(lower(trim(col("text"))), 256))
              .orderBy(col("doc_id"))).as("dup_rank"),
          round(qualityCol(col("text"), col("toks")), 6).as("quality"),
          pred.as("predicted"))
        .filter(col("dup_rank") === 1 && col("quality") >= 0.5 &&
          col("predicted") === col("lang"))
        .select(col("doc_id"), col("lang"), col("quality"), col("dup_rank"))
        .orderBy("doc_id")
    },

    // X4+/Q25e — per-document keyword extraction, tf-idf style: term
    // frequency from one explode+agg pass, document frequency as a second
    // (vocabulary-sized) agg over it, idf broadcast back onto the tf rows,
    // top-3 terms per doc by weight. The idf weight is the *rational*
    // (N+1)/(df+1) — not log-idf — because libm `ln` is not guaranteed
    // correctly rounded and could diverge between engines in the tie-break;
    // IEEE multiply/divide are exact-deterministic on both. (Production
    // would use log-idf; the ranking this verifies is the same machinery.)
    // Scale: tf is the only big shuffle (doc_id, token); df/vocab is small
    // → broadcast; per-doc top-3 shuffles on doc_id with bounded output.
    QueryDef(
      "q25e_tfidf_keywords",
      s"""WITH tf AS (
         |  SELECT doc_id, t AS token, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(${sqlTokens("text")}) AS t FROM documents)
         |  GROUP BY doc_id, t),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.token,
         |    round(tf.tf * (n.n_docs + 1) / (df.df + 1.0), 6) AS score,
         |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * (n.n_docs + 1) / (df.df + 1.0) DESC, tf.token) AS rank
         |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
         |SELECT doc_id, rank, token, score
         |FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val weight = col("tf") * (col("n_docs") + 1) / (col("df") + 1.0)
      tf
        .join(broadcast(df), "token")
        .crossJoin(broadcast(nDocs))
        .select(
          col("doc_id"), col("token"),
          round(weight, 6).as("score"),
          row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(weight.desc, col("token"))).as("rank"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("score"))
        .orderBy("doc_id", "rank")
    },

    // X4+/Q25g — token-offset sharding (sequence packing): assign each doc
    // to a training shard by the token offset at which it starts, budget
    // 2048 tokens per shard — how pretraining data is packed into
    // fixed-length sequences, with documents straddling shard boundaries.
    // Packing runs PER LANGUAGE PARTITION (PARTITION BY lang), not
    // globally: a global running sum would serialize on one reducer, while
    // per-partition prefix sums keep every packing stream parallel — at
    // 100 TB the partition key is the shard-group (source, date, ...).
    // n_tok here deliberately counts raw tokens (every doc gets a shard,
    // even a degenerate one); q25o's segment layout filters empty tokens
    // instead, since there a phantom token would shift packed offsets.
    QueryDef(
      "q25g_token_shards",
      s"""WITH t AS (SELECT lang, doc_id, len(${sqlTokens("text")}) AS n_tok FROM documents)
         |SELECT lang, doc_id, n_tok,
         |  CAST(floor((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tok) / 2048.0) AS BIGINT) AS shard
         |FROM t ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
      val offset = sum(col("n_tok")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok")
      t.select(col("lang"), col("doc_id"), col("n_tok"),
          floor(offset / 2048.0).cast("long").as("shard"))
        .orderBy("lang", "doc_id")
    },

    // X4++/Q25o — sequence packing: the layout step after q25g's shard
    // assignment — every document becomes one row PER fixed-length training
    // sequence it touches, with the segment's begin offset inside the doc,
    // its length, and its offset inside the sequence (the attention-mask /
    // position-id boundaries a packed pretraining batch needs). A doc
    // straddling sequence boundaries splits; sequences fill to exactly
    // SeqLen tokens except each partition's last. All integer arithmetic
    // off the same per-partition prefix sums as q25g (one window over the
    // lang-partitioned sort) plus a bounded range-explode (a doc of n
    // tokens emits ceil(n/SeqLen)+1 rows at most) — packing 100 TB is one
    // sort-shuffle per shard-group, and the explode rides it.
    QueryDef(
      "q25o_sequence_packing",
      // n_tok counts NON-EMPTY tokens: the repo-wide tokenizer maps empty/
      // whitespace-only text to [""], which would otherwise occupy a
      // phantom token slot in a packed sequence and shift every later
      // doc's offsets — such docs pack zero tokens and emit no segment
      // (the n_tok > 0 filter)
      s"""WITH t AS (SELECT lang, doc_id,
         |  len(list_filter(${sqlTokens("text")}, x -> x <> '')) AS n_tok
         |  FROM documents),
         |o AS (SELECT lang, doc_id, n_tok,
         |  CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
         |  FROM t),
         |seg AS (SELECT lang, doc_id, n_tok, off,
         |  unnest(generate_series(off // $SeqLen, (off + n_tok - 1) // $SeqLen)) AS seq
         |  FROM o WHERE n_tok > 0)
         |SELECT lang, doc_id, seq,
         |  greatest(seq * $SeqLen - off, 0) AS seg_begin,
         |  least((seq + 1) * $SeqLen, off + n_tok) - greatest(seq * $SeqLen, off) AS seg_len,
         |  greatest(off - seq * $SeqLen, 0) AS offset_in_seq
         |FROM seg ORDER BY lang, seq, doc_id""".stripMargin) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          size(filter(tokens(col("text")), x => x =!= ""))
            .cast("long").as("n_tok"))
      val off = (sum(col("n_tok")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("n_tok")).as("off")
      val L = lit(SeqLen.toLong)
      t.select(col("lang"), col("doc_id"), col("n_tok"), off)
        .filter(col("n_tok") > 0)
        .select(col("lang"), col("doc_id"), col("n_tok"), col("off"),
          explode(sequence(
            expr(s"off div $SeqLen"),
            expr(s"(off + n_tok - 1) div $SeqLen"))).as("seq"))
        .select(
          col("lang"), col("doc_id"), col("seq"),
          greatest(col("seq") * L - col("off"), lit(0L)).as("seg_begin"),
          (least((col("seq") + 1) * L, col("off") + col("n_tok"))
            - greatest(col("seq") * L, col("off"))).as("seg_len"),
          greatest(col("off") - col("seq") * L, lit(0L)).as("offset_in_seq"))
        .orderBy("lang", "seq", "doc_id")
    },

    // X4++/Q25p — overlapping document chunking (RAG / retrieval-index
    // prep): the SPLIT counterpart of q25o's packing (packing concatenates
    // docs into fixed sequences; chunking cuts one doc into fixed-width
    // overlapping windows). Chunk k covers tokens
    // [k·Stride, k·Stride + ChunkLen) ∩ [0, n); the grid STOPS at the
    // first window that reaches the doc's end (k ≤ max(0, ⌈(n-Len)/Stride⌉)
    // = (n-Len+Stride-1) div Stride), so coverage is complete but no
    // emitted window is fully contained in its predecessor — a naive
    // k·Stride < n bound would append a strict-suffix duplicate window
    // whenever (n-1) mod Stride < Len - Stride, and duplicate sub-chunks
    // in a retrieval index are returnable junk. All narrow per-row
    // work (tokenize → bounded range-explode → array slice/join) riding
    // the scan: chunking 100 TB is scan-shaped, no shuffle but the
    // output sort. Emits offsets AND the chunk text, so the output table
    // IS the retrieval corpus (doc_id, chunk_id) → text.
    QueryDef(
      "q25p_doc_chunks",
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(${sqlTokens("text")}, x -> x <> '') AS toks
         |  FROM documents),
         |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
         |k AS (SELECT doc_id, toks, n,
         |  unnest(generate_series(0,
         |    greatest((n - ${ChunkLen - ChunkStride + 1}) // $ChunkStride, 0))) AS k
         |  FROM n)
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         |  CAST(k * $ChunkStride AS BIGINT) AS tok_begin,
         |  CAST(least($ChunkLen, n - k * $ChunkStride) AS BIGINT) AS tok_len,
         |  array_to_string(
         |    toks[k * $ChunkStride + 1 :
         |         k * $ChunkStride + least($ChunkLen, n - k * $ChunkStride)],
         |    ' ') AS chunk_text
         |FROM k ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(tokens(col("text")), x => x =!= "").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .filter(col("n") > 0)
      val S = lit(ChunkStride.toLong)
      val tokLen = least(lit(ChunkLen.toLong), col("n") - col("chunk_id") * S)
      t.select(col("doc_id"), col("toks"), col("n"),
          // Spark `div` truncates toward zero where DuckDB `//` floors, so
          // the short-doc negative case is clamped with greatest both sides
          explode(sequence(lit(0L), greatest(
            expr(s"(n - ${ChunkLen - ChunkStride + 1}) div $ChunkStride"),
            lit(0L)))).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          (col("chunk_id") * S).as("tok_begin"),
          tokLen.as("tok_len"),
          array_join(
            slice(col("toks"),
              (col("chunk_id") * S + 1).cast("int"), tokLen.cast("int")),
            " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },

    // X4+++/Q25q — DSIR-style importance selection (hashed-feature
    // importance resampling, Xie et al. 2023): re-weight the corpus toward
    // a TARGET domain — here lang='en' stands in for "the domain you want
    // more of" — using two hashed bag-of-tokens models built in ONE pass:
    // tokens hash into 512 buckets, each bucket's importance ratio is the
    // smoothed target/source frequency ratio, each doc scores the sum of
    // its tokens' ratios, and selection keeps the top-100 docs by
    // per-token ratio. Everything that decides is integer: the ratio is
    // floored MILLIONTHS of (t+1)(S+512) / ((s+1)(T+512)), computed in
    // DECIMAL(38,0) / HUGEINT so the fixed-order integer products stay
    // EXACT past 2^53 (doubles would be 1-ULP engine-divergent at real
    // 100 TB token counts and could flip a keep decision at the quota
    // boundary) — and per-doc scores are BIGINT sums (order-free), so no
    // keep decision ever branches on float noise (the q25n discipline).
    // Scale: the 512-row ratio table broadcasts; doc scoring rides the
    // same token explode the model build needs (two passes total). The
    // quota is enforced WITHOUT a global-sort window: a distributed top-k
    // (TakeOrderedAndProject — per-partition top-100, k-row driver merge)
    // finds the 100th (score, doc_id) boundary key, which broadcasts back
    // onto the per-doc frame as a threshold compare. doc_id uniqueness
    // makes the composite key a total order, so threshold-vs-rank selection
    // is exactly row_number ≤ 100 — the oracle keeps the rank form.
    QueryDef(
      "q25q_dsir_selection",
      s"""WITH tok AS (SELECT doc_id, lang, ${sqlHash32("w")} % 512 AS b
         |  FROM (SELECT doc_id, lang,
         |    unnest(list_filter(${sqlTokens("text")}, x -> x <> '')) AS w
         |    FROM documents)),
         |m AS (SELECT b, COUNT(*) AS s_cnt,
         |  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS t_cnt
         |  FROM tok GROUP BY b),
         |tot AS (SELECT CAST(SUM(s_cnt) AS BIGINT) AS s_tot,
         |  CAST(SUM(t_cnt) AS BIGINT) AS t_tot FROM m),
         |r AS (SELECT b, CAST((1000000::HUGEINT * (t_cnt + 1) * (s_tot + 512))
         |    // ((s_cnt + 1)::HUGEINT * (t_tot + 512)) AS BIGINT) AS ratio_fp
         |  FROM m CROSS JOIN tot),
         |d AS (SELECT tok.doc_id, tok.lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM(ratio_fp) AS BIGINT) AS score_fp
         |  FROM tok JOIN r USING (b) GROUP BY tok.doc_id, tok.lang)
         |SELECT doc_id, lang, n_tok, score_fp,
         |  (ROW_NUMBER() OVER (ORDER BY score_fp // n_tok DESC, doc_id) <= 100) AS sel
         |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = dsirDocScores(s, dir)
      // top-k boundary: orderBy+limit(100) compiles to TakeOrderedAndProject
      // (no single-partition WindowExec — plan-pinned in PlanSpec); the
      // 1-row max(struct) boundary broadcasts back as a threshold. With
      // fewer than 100 docs the max-struct is the last doc and everything
      // selects, matching rank ≤ 100.
      val bound = d.orderBy(col("negq"), col("doc_id")).limit(100)
        .agg(max(struct(col("negq"), col("doc_id"))).as("bnd"))
      d.crossJoin(broadcast(bound))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("score_fp"),
          (struct(col("negq"), col("doc_id")) <= col("bnd")).as("sel"))
        .orderBy("doc_id")
    },

    // X4+++/Q25qb — DSIR selection with an APPROX-PERCENTILE threshold: the
    // 100 TB quota form. q25q's fixed top-k boundary works when the quota is
    // a COUNT; when it is a FRACTION ("keep the best 10%"), k grows with the
    // corpus and the per-partition top-k merge grows with it — the scale
    // path is a quantile threshold: one `approx_percentile` sketch pass over
    // the per-doc ratio (mergeable, bounded memory), cutoff broadcast back,
    // keep = ratio ≥ cutoff riding the scan. The sketch cutoff is
    // engine-specific, so the contract keeps every decision INPUT exact and
    // hash-verified (doc_id, lang, n_tok, score_fp — the full q25q integer
    // scoring pipeline, shared via the materialized score frame) and makes
    // the selection itself a tolerance flag: `sel_ok` asserts the approx
    // decision equals the exact-quantile decision, excusing only docs whose
    // ratio lies within 5% (+5000 millionths absolute) of the exact cutoff
    // — the sketch's rank-error bound (n/accuracy = n/10000) keeps true
    // disagreements pinned to that boundary band; a drifting sketch flips
    // flags far from it and fails the hash.
    QueryDef(
      "q25qb_dsir_approx_threshold",
      s"""WITH tok AS (SELECT doc_id, lang, ${sqlHash32("w")} % 512 AS b
         |  FROM (SELECT doc_id, lang,
         |    unnest(list_filter(${sqlTokens("text")}, x -> x <> '')) AS w
         |    FROM documents)),
         |m AS (SELECT b, COUNT(*) AS s_cnt,
         |  COUNT(CASE WHEN lang = 'en' THEN 1 END) AS t_cnt
         |  FROM tok GROUP BY b),
         |tot AS (SELECT CAST(SUM(s_cnt) AS BIGINT) AS s_tot,
         |  CAST(SUM(t_cnt) AS BIGINT) AS t_tot FROM m),
         |r AS (SELECT b, CAST((1000000::HUGEINT * (t_cnt + 1) * (s_tot + 512))
         |    // ((s_cnt + 1)::HUGEINT * (t_tot + 512)) AS BIGINT) AS ratio_fp
         |  FROM m CROSS JOIN tot),
         |d AS (SELECT tok.doc_id, tok.lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM(ratio_fp) AS BIGINT) AS score_fp
         |  FROM tok JOIN r USING (b) GROUP BY tok.doc_id, tok.lang)
         |SELECT doc_id, lang, n_tok, score_fp, TRUE AS sel_ok
         |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = dsirDocScores(s, dir)
      val ratio = -col("negq") // = score_fp div n_tok, integer millionths
      val cuts = d.agg(
        expr("approx_percentile(-negq, 0.9, 10000)").as("cut_a"),
        expr("percentile(-negq, 0.9)").as("cut_e"))
      d.crossJoin(broadcast(cuts))
        .select(
          col("doc_id"), col("lang"), col("n_tok"), col("score_fp"),
          ((ratio >= col("cut_a")) === (ratio.cast("double") >= col("cut_e")) ||
            abs(ratio - col("cut_e")) <= abs(col("cut_e")) * 0.05 + 5000.0)
            .as("sel_ok"))
        .orderBy("doc_id")
    },

    // X4+/Q25f — deterministic stratified sampling: cap each language
    // stratum at ~100 docs by keeping a doc iff
    // hash(lang:doc_id) mod 1000 < floor(1000 · min(1, 100/count(lang))).
    // Hash-based sampling is reproducible across runs/engines (no RNG
    // state) and needs no shuffle of the big table: the per-stratum counts
    // are a tiny aggregate broadcast back, and the keep-decision rides the
    // scan. This is the corpus-rebalancing pass (downsample dominant
    // languages) of a training-data pipeline.
    QueryDef(
      "q25f_stratified_sample",
      s"""WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
         |k AS (SELECT doc_id, d.lang, cnt,
         |  ${sqlHash32("concat(d.lang, ':', doc_id)")} % 1000 AS bucket
         |  FROM documents d JOIN c ON d.lang = c.lang)
         |SELECT doc_id, lang, bucket
         |FROM k
         |WHERE bucket < CAST(floor(1000 * least(1.0, 100.0 / cnt)) AS BIGINT)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val bucket = hash32(concat(col("lang"), lit(":"), col("doc_id"))) % 1000
      docs
        .join(broadcast(counts), "lang")
        .select(col("doc_id"), col("lang"), bucket.as("bucket"), col("cnt"))
        .filter(col("bucket") <
          floor(lit(1000) * least(lit(1.0), lit(100.0) / col("cnt"))).cast("long"))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id")
    },

    // X4+/Q25s — per-source quota cap: keep at most SourceQuota docs per
    // source, best-first (n_chars as the quality proxy, doc_id tiebreak) —
    // the "max N pages per domain" guard every web-scale curation run
    // applies so no single domain dominates the mixture. Differs from
    // q25f (stratified RATE sampling: keeps a fraction) in being an
    // absolute per-group top-k. Scale shape: the rank-≤-k filter compiles
    // to a WindowGroupLimit below the source-partitioned exchange
    // (plan-pinned), so each map task forwards at most k rows per source
    // into the shuffle — a mega-domain contributes k rows per task, not
    // its full page count; the window itself then ranks ≤ k × tasks rows
    // per source. Same mechanism q22b pins for rank-1, generalized to the
    // quota.
    QueryDef(
      "q25s_source_quota",
      s"""WITH r AS (SELECT doc_id, source,
         |  ROW_NUMBER() OVER (PARTITION BY source
         |                     ORDER BY n_chars DESC, doc_id) AS rnk
         |  FROM documents)
         |SELECT doc_id, source, rnk FROM r WHERE rnk <= $SourceQuota
         |ORDER BY source, rnk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= SourceQuota)
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy("source", "rnk")
    },

    // X4+/Q25v — temperature-scaled language-mixture sampling weights: the
    // multilingual-pretraining recipe (exponentiate the native token share
    // p_l to α < 1, renormalize) that upsamples low-resource languages.
    // α = 1/2 EXACTLY, so the exponentiation is sqrt — IEEE 754 requires
    // sqrt to be correctly rounded, which makes the weight bit-identical
    // across engines where a libm pow(p, 0.3) would not be. Shapes: one
    // corpus scan feeding a per-language token-count hash aggregate (#langs
    // rows), then all arithmetic happens on that broadcast-sized frame —
    // the two 1-row totals join back by broadcast cross join, and the
    // order-dependent double sum over languages goes through the exact
    // decimal accumulator (Det rationale, at weight precision). At 100 TB
    // this is the whole computation: scan-riding token counts, kilobytes
    // after. `boost` = w/p is the resulting per-language duplication
    // factor a sampler applies (>1 ⇒ upsampled).
    QueryDef(
      "q25v_mixture_weights",
      s"""WITH lt AS (SELECT lang,
         |  CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS n_tok
         |  FROM documents GROUP BY lang),
         |t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tot FROM lt),
         |p AS (SELECT lang, n_tok,
         |  n_tok::DOUBLE / t.tot::DOUBLE AS pn,
         |  sqrt(n_tok::DOUBLE / t.tot::DOUBLE) AS wr FROM lt, t),
         |d AS (SELECT CAST(SUM(CAST(wr AS DECIMAL(28,12))) AS DOUBLE) AS wd
         |  FROM p)
         |SELECT lang, n_tok, round(pn, 6) AS p_native,
         |  round(wr / d.wd, 6) AS w_sample,
         |  round((wr / d.wd) / pn, 6) AS boost
         |FROM p, d ORDER BY lang""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      // the |langs|-row count frame feeds three consumers (shares, the
      // normalizer, the output) — materialize it so the corpus tokenize
      // pass runs ONCE, not once per consumer branch
      val lt = Materialize(s, dir, "q25v_lt")(
        Tables.documents(s, dir)
          .groupBy(col("lang"))
          .agg(sum(size(tokens(col("text"))).cast("long")).as("n_tok")))
      val tot = lt.agg(sum(col("n_tok")).as("tot"))
      val p = lt.crossJoin(broadcast(tot))
        .withColumn("pn", col("n_tok").cast("double") / col("tot").cast("double"))
        .withColumn("wr", sqrt(col("pn")))
      val d = p.agg(sum(col("wr").cast(DecimalType(28, 12))).cast("double").as("wd"))
      p.crossJoin(broadcast(d))
        .select(
          col("lang"), col("n_tok"),
          round(col("pn"), 6).as("p_native"),
          round(col("wr") / col("wd"), 6).as("w_sample"),
          round((col("wr") / col("wd")) / col("pn"), 6).as("boost"))
        .orderBy("lang")
    },

    // X4+/Q53 — deterministic GLOBAL TRAINING-ORDER SHUFFLE + epoch
    // sharding: the last step before serving a corpus to a trainer — a
    // pseudo-random permutation of the docs, materialized as (shard,
    // pos-in-shard) so N loader workers stream disjoint shards in a
    // reproducible order (re-salt 'ord:' with the epoch id for a fresh
    // permutation per epoch). Deliberately NOT a global sort: a total
    // ORDER BY hash at 100 TB is a range-partitioned full-corpus sort
    // whose row_number then needs a partition-offset fix-up; hashing into
    // [[OrderShards]] shards and ranking WITHIN each shard gives the same
    // statistical shuffle as one hash-partitioned exchange + per-shard
    // local sorts (the window keys on the shard id), each shard
    // independently streamable. q25g shards by cumulative token OFFSET
    // (even byte budgets, preserves order); this op is its orthogonal
    // twin — randomizes order, balances by COUNT via the uniform hash.
    QueryDef(
      "q53_training_order",
      s"""WITH o AS (SELECT doc_id,
         |    ${sqlHash32("concat('ord:', doc_id)")} AS ord FROM documents),
         |r AS (SELECT doc_id, ord % $OrderShards AS shard,
         |    ROW_NUMBER() OVER (PARTITION BY ord % $OrderShards
         |                       ORDER BY ord, doc_id) AS pos
         |  FROM o)
         |SELECT doc_id, shard, pos FROM r ORDER BY shard, pos""".stripMargin) {
      (s, dir) =>
        val o = Tables.documents(s, dir)
          .select(col("doc_id"),
            hash32(concat(lit("ord:"), col("doc_id"))).as("ord"))
          .withColumn("shard", col("ord") % OrderShards)
        val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))
        o.withColumn("pos", row_number().over(w))
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("shard", "pos")
    },

    // X4+/Q57 — temperature-scaled mixture sampling, EXECUTED: q25v
    // computes the α = 0.5 rebalanced source weights; this op draws the
    // actual sample — per-source targets ∝ √n_s (up-weights the tail
    // sources exactly as multilingual/multi-source training mixtures do),
    // selection by per-source hash rank so the draw is deterministic,
    // uniform within source, and stable under reruns (re-salt 'mix:' for
    // a fresh draw). Numerics: per-source doc counts are exact; the √
    // weights are single IEEE ops; their normalizer is an exact DECIMAL
    // sum (q25v's trick — float addition order never matters); each
    // target is floor((T × w) / Σw) computed with ONE parenthesization on
    // both engines. Scale shape: the source stat frame is |sources| rows
    // (broadcast), selection is one window ranked within source —
    // hash-partitioned, no global sort; a skew-heavy source is the
    // window's partition and salts like any q28 skew case.
    QueryDef(
      "q57_mixture_sample",
      s"""WITH ns AS (SELECT source, COUNT(*) AS n_docs
         |            FROM documents GROUP BY source),
         |tt AS (SELECT CAST(SUM(n_docs) // 2 AS BIGINT) AS t FROM ns),
         |wsrc AS (SELECT source, n_docs, sqrt(n_docs::DOUBLE) AS wr FROM ns),
         |wd AS (SELECT CAST(SUM(CAST(wr AS DECIMAL(28,12))) AS DOUBLE) AS wsum
         |       FROM wsrc),
         |tgt AS (SELECT source, n_docs,
         |    GREATEST(1, CAST(FLOOR((t::DOUBLE * wr) / wsum) AS BIGINT))
         |      AS src_target
         |  FROM wsrc, tt, wd),
         |rk AS (SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
         |      ${sqlHash32("concat('mix:', doc_id)")}, doc_id) AS rk
         |  FROM documents)
         |SELECT r.doc_id, r.source, r.rk, g.src_target
         |FROM rk r JOIN tgt g ON r.source = g.source
         |WHERE r.rk <= g.src_target
         |ORDER BY r.source, r.rk""".stripMargin) { (s, dir) =>
      val ns = Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val tt = ns.agg((sum(col("n_docs")) / 2).cast("long").as("t"))
      val wsrc = ns.withColumn("wr", sqrt(col("n_docs").cast("double")))
      val wd = wsrc.agg(
        sum(col("wr").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double").as("wsum"))
      val tgt = wsrc.crossJoin(broadcast(tt)).crossJoin(broadcast(wd))
        .select(col("source"),
          greatest(lit(1L),
            floor((col("t").cast("double") * col("wr")) / col("wsum"))
              .cast("long")).as("src_target"))
      val w = Window.partitionBy(col("source"))
        .orderBy(hash32(concat(lit("mix:"), col("doc_id"))), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("rk", row_number().over(w))
        .join(broadcast(tgt), Seq("source"))
        .filter(col("rk") <= col("src_target"))
        .select(col("doc_id"), col("source"), col("rk"), col("src_target"))
        .orderBy("source", "rk")
    },

    // X4+/Q62 — token-budget DYNAMIC BATCHING (length-bucketed padding
    // classes): the batch-shaping pass between q53's order shuffle and the
    // trainer — docs padded to their power-of-two length class and packed
    // into fixed-token-budget batches, the standard recipe for minimizing
    // pad waste without per-batch ragged shapes. Within a class every doc
    // costs exactly `pclass` padded tokens, so batching degenerates to
    // fixed-capacity chunking: capacity = budget div pclass, batch =
    // (rank-1) div capacity — pure integer arithmetic, no running-sum
    // carry. The class is computed WITHOUT floats (Spark's log2 is
    // log(x)/log(2) and lands off-by-ulp at exact powers; DuckDB's is libm
    // log2): 1 << length(bin(n-1)) — both engines render the same binary
    // string, so the class is exact at any length. Ranks are scoped to
    // (pclass, shard) with a hash-derived shard (q53's scoping rule —
    // per-window partitions are corpus/|classes·shards| and the shard
    // count scales with the cluster; no corpus-global window exists).
    // Linear at 100 TB: tokenize rides the scan, one hash exchange on
    // (pclass, shard), per-shard local sorts.
    QueryDef(
      "q62_dynamic_batching",
      s"""WITH n AS (SELECT doc_id, len(${sqlTokens("text")}) AS n_tok
         |           FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |    CASE WHEN n_tok <= 1 THEN 1
         |         ELSE (1::BIGINT << length(bin(n_tok - 1))) END AS pclass,
         |    ${sqlHash32("concat('shard:', doc_id)")} % $BatchShards AS shard
         |  FROM n),
         |r AS (SELECT doc_id, n_tok, pclass, shard,
         |    ROW_NUMBER() OVER (PARTITION BY pclass, shard
         |                       ORDER BY doc_id) AS rk
         |  FROM c)
         |SELECT doc_id, n_tok, pclass, shard,
         |  (rk - 1) // GREATEST(1, $BatchBudget // pclass) AS batch,
         |  pclass - n_tok AS pad_waste,
         |  round(n_tok::DOUBLE / pclass, 6) AS fill
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val n = Tables.documents(s, dir)
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      val c = n.select(col("doc_id"), col("n_tok"),
        when(col("n_tok") <= 1, 1L)
          .otherwise(expr("shiftleft(1L, length(bin(n_tok - 1)))"))
          .as("pclass"),
        (hash32(concat(lit("shard:"), col("doc_id"))) % BatchShards).as("shard"))
      val w = Window.partitionBy(col("pclass"), col("shard")).orderBy(col("doc_id"))
      c.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("n_tok"), col("pclass"), col("shard"),
          expr(s"(rk - 1) div greatest(1L, $BatchBudget div pclass)").as("batch"),
          (col("pclass") - col("n_tok")).as("pad_waste"),
          round(col("n_tok").cast("double") / col("pclass"), 6).as("fill"))
        .orderBy("doc_id")
    },

    // X4++/Q64 — VOCABULARY-DRIFT monitor: tonight's batch (the q47b/q45
    // doc_id % 7 rule) against the STANDING corpus's word-type vocabulary,
    // per source — the drift telemetry that tells a pipeline when its
    // tokenizer (q25t's BPE trains on exactly this vocabulary) and its
    // LM-familiarity filters (q25n) have gone stale: a source whose
    // new-type rate jumps is shifting domain. The third instance of the
    // batch-vs-history incremental pattern: q22d probes standing KEYS,
    // q47b standing WINDOWS, this the standing VOCABULARY. Scale shape:
    // the history vocab is a Heaps-SUBLINEAR materialized table (distinct
    // types grow ~n^0.5-0.8, the q59-measured curve); the batch explodes
    // to per-(source, type) rows BEFORE the vocab join (map-side count
    // partials — occurrences never reach the shuffle), so the join is
    // types-vs-types, AQE-splittable, and marginal cost is
    // batch-proportional. No countDistinct anywhere: the per-type
    // pre-aggregation makes every downstream stat a plain SUM/COUNT —
    // no Expand, one pass.
    QueryDef(
      "q64_vocab_drift",
      s"""WITH hv AS (SELECT DISTINCT unnest(${sqlTokens("text")}) AS v
         |           FROM documents WHERE doc_id % 7 <> 0),
         |bt AS (SELECT source, unnest(${sqlTokens("text")}) AS v
         |       FROM documents WHERE doc_id % 7 = 0),
         |pt AS (SELECT source, v, COUNT(*) AS cnt FROM bt GROUP BY 1, 2),
         |j AS (SELECT pt.source, pt.cnt, hv.v AS hvv
         |      FROM pt LEFT JOIN hv ON pt.v = hv.v)
         |SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tok,
         |  COUNT(*) AS n_types,
         |  CAST(SUM(CASE WHEN hvv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_types,
         |  round(SUM(CASE WHEN hvv IS NULL THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
         |    AS new_type_frac,
         |  round(SUM(CASE WHEN hvv IS NULL THEN cnt ELSE 0 END)::DOUBLE / SUM(cnt), 6)
         |    AS oov_token_frac
         |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // the standing vocabulary is a materialized artifact (rebuilt when
      // the corpus snapshot changes, not per batch) — the table q25t's
      // BPE and q59's growth curve already conceptually share
      val vocab = Materialize(s, dir, "q64_hist_vocab")(
        docs.filter(col("doc_id") % 7 =!= 0)
          .select(explode(tokens(col("text"))).as("v")).distinct())
      // batch side reads the ONE materialized night-batch frame (q68's
      // single-raw-scan rule) instead of re-scanning raw documents
      val pt = CurationPipeline.nightBatch(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("v"))
        .groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
      val isNew = col("known").isNull
      pt.join(vocab.withColumn("known", lit(1)), Seq("v"), "left")
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tok"),
          count(lit(1)).as("n_types"),
          sum(when(isNew, 1L).otherwise(0L)).as("new_types"),
          sum(when(isNew, col("cnt")).otherwise(0L)).as("oov_tokens"))
        .select(col("source"), col("n_tok"), col("n_types"), col("new_types"),
          round(col("new_types").cast("double") / col("n_types"), 6)
            .as("new_type_frac"),
          round(col("oov_tokens").cast("double") / col("n_tok"), 6)
            .as("oov_token_frac"))
        .orderBy("source")
    },

    // X4+++/Q64b — MULTI-NIGHT COMPOUNDING of the vocabulary index (the
    // q63i/q63j chain pattern applied to q64's standing artifact): night k
    // probes batch doc_id % 7 == k against the standing vocabulary, then
    // the probe's OWN new-type rows become the night's state write — a
    // Materialized DELTA table (novel types only, Heaps-sublinear in the
    // batch — the q45b delta-log shape, never a full-vocab rewrite) that
    // IS part of night k+1's standing vocabulary. Both carries are
    // load-bearing: a type introduced by night 0 must read KNOWN in night
    // 1's report (a stale or missing delta inflates new_types and fails
    // the hash). The served report is a pure union of the per-night
    // materialized probe frames — ZERO raw document scans in the final
    // plan (each night's batch was scanned once, at probe build). Oracle
    // recomputes every night from raw documents with history = base +
    // all earlier batches, so chain–rebuild parity holds per night.
    QueryDef("q64b_chained_vocab_drift", sqlChainedVocabOracle) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      var vocab: DataFrame = Materialize(s, dir, "q64b_vocab_v0")(
        docs.filter(col("doc_id") % 7 >= DedupQueries.ChainNights)
          .select(explode(tokens(col("text"))).as("v")).distinct())
      val isNew = col("known").isNull
      (0 until DedupQueries.ChainNights).map { k =>
        // ONE batch scan per night: the probe frame (per-(source, type)
        // counts with the standing-vocab verdict attached) is materialized
        // and serves both the night's report and the delta write
        val probe = Materialize(s, dir, s"q64b_probe_v$k") {
          docs.filter(col("doc_id") % 7 === k)
            .select(col("source"), explode(tokens(col("text"))).as("v"))
            .groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
            .join(vocab.withColumn("known", lit(1)), Seq("v"), "left")
        }
        val delta = Materialize(s, dir, s"q64b_vocab_delta_v${k + 1}")(
          probe.filter(isNew).select(col("v")).distinct())
        vocab = vocab.unionByName(delta)
        probe.groupBy(col("source"))
          .agg(sum(col("cnt")).as("n_tok"),
            count(lit(1)).as("n_types"),
            sum(when(isNew, 1L).otherwise(0L)).as("new_types"),
            sum(when(isNew, col("cnt")).otherwise(0L)).as("oov_tokens"))
          .select(lit(k).as("night"), col("source"), col("n_tok"),
            col("n_types"), col("new_types"),
            round(col("new_types").cast("double") / col("n_types"), 6)
              .as("new_type_frac"),
            round(col("oov_tokens").cast("double") / col("n_tok"), 6)
              .as("oov_token_frac"))
      }.reduce(_.unionByName(_)).orderBy("night", "source")
    }
  )

  /** q64b's oracle: each night's q64 report recomputed FROM RAW documents
    * with history = base (% 7 >= ChainNights) + all earlier batches —
    * the full-rebuild twin of the chained vocabulary state. */
  private def sqlChainedVocabOracle: String = {
    val blocks = (0 until DedupQueries.ChainNights).map { k =>
      s"""hv$k AS (SELECT DISTINCT unnest(${sqlTokens("text")}) AS v
         |  FROM documents
         |  WHERE doc_id % 7 >= ${DedupQueries.ChainNights} OR doc_id % 7 < $k),
         |pt$k AS (SELECT source, v, COUNT(*) AS cnt
         |  FROM (SELECT source, unnest(${sqlTokens("text")}) AS v
         |        FROM documents WHERE doc_id % 7 = $k) GROUP BY 1, 2),
         |r$k AS (SELECT $k AS night, pt$k.source,
         |    CAST(SUM(cnt) AS BIGINT) AS n_tok, COUNT(*) AS n_types,
         |    CAST(SUM(CASE WHEN hv$k.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS new_types,
         |    round(SUM(CASE WHEN hv$k.v IS NULL THEN 1 ELSE 0 END)::DOUBLE
         |      / COUNT(*), 6) AS new_type_frac,
         |    round(SUM(CASE WHEN hv$k.v IS NULL THEN cnt ELSE 0 END)::DOUBLE
         |      / SUM(cnt), 6) AS oov_token_frac
         |  FROM pt$k LEFT JOIN hv$k ON pt$k.v = hv$k.v
         |  GROUP BY pt$k.source)""".stripMargin
    }
    val union = (0 until DedupQueries.ChainNights)
      .map(k => s"SELECT * FROM r$k").mkString(" UNION ALL ")
    s"WITH ${blocks.mkString(",\n")}\n$union ORDER BY night, source"
  }

  /** The DSIR per-doc score frame (doc_id, lang, n_tok, score_fp, negq),
    * shared by q25q (top-k quota) and q25qb (quantile-threshold quota). See
    * q25q's comment for the integer-arithmetic rationale; the Materialize
    * tags make the two queries reuse one physical build per session. */
  private def dsirDocScores(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(filter(tokens(col("text")), x => x =!= "")).as("w"))
      .select(col("doc_id"), col("lang"),
        pmod(hash32(col("w")), lit(512L)).as("b"))
    // materialized: m feeds BOTH the totals and the ratio table, and a
    // twice-referenced subtree is instantiated twice in the physical
    // plan — without this the documents tokenize+hash scan ran 3×
    // (model under r, model under tot, doc scoring), not the 2 passes
    // the design intends
    val m = Materialize(s, dir, "q25q_m")(tok.groupBy(col("b")).agg(
      count(lit(1)).as("s_cnt"),
      count(when(col("lang") === "en", 1)).as("t_cnt")))
    val tot = m.select(sum(col("s_cnt")).cast("long").as("s_tot"),
      sum(col("t_cnt")).cast("long").as("t_tot"))
    // IntegralDivide over DECIMAL(38,0): exact at any real corpus size
    // (1e6·(t+1)·(S+512) fits 38 digits up to ~1e12 target tokens per
    // bucket × 1e13 total — far past 100 TB), result well inside BIGINT
    val r = m.crossJoin(broadcast(tot))
      .select(col("b"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * (t_cnt + 1) * (s_tot + 512))
               | DIV (CAST(s_cnt + 1 AS DECIMAL(38,0)) * (t_tot + 512)) AS BIGINT)"""
          .stripMargin.replace("\n", "")).as("ratio_fp"))
    // materialized: the per-doc score frame (one row per doc) feeds both
    // the boundary top-k and the final projection; without this the
    // documents tokenize+hash scan would run once per consumer
    Materialize(s, dir, "q25q_d")(
      tok.join(broadcast(r), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).cast("long").as("n_tok"),
          sum(col("ratio_fp")).as("score_fp"))
        .withColumn("negq", -expr("score_fp div n_tok")))
  }
}
