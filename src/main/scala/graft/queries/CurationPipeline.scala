package graft.queries

import graft.functions.TextHash.{hash32, shingles, sqlHash32, sqlShingles, sqlTokens, tokens}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q44 — the end-to-end LLM training-data curation DAG (VERDICT r10 #8):
  * the five stages that exist separately as q22 (exact dedup), q22e
  * (span-level boilerplate removal), q25h (quality rules), q25j
  * (train/val/test split) and q25o (sequence packing), composed into the
  * ONE pipeline a user actually runs — raw corpus in, packed training
  * sequences out. Every stage reuses the standalone operator's exact
  * program and constants (imported, not copied), so q44's semantics can
  * never drift from its parts, and the oracle is the same five stages
  * composed as one CTE chain.
  *
  * Plan economy (PlanSpec-pinned): the RAW corpus is scanned exactly ONCE
  * end-to-end. Stage 1's dedup survivor set materializes (`q44_kept`), the
  * span-clean stage reads and re-reads only that materialization (its
  * boilerplate-df aggregation and anti-join branches would otherwise each
  * re-scan the raw corpus), and the curated text materializes again
  * (`q44_curated`) so the quality/split/packing plan — which fans out into
  * token, bigram, and packing branches — touches only a deduped, cleaned,
  * two-column table. At 100 TB these materializations ARE the pipeline's
  * checkpoint tables (every production curation DAG persists stage
  * boundaries for reruns and audits); the alternative — one fused plan —
  * would scan the corpus once per branch, five times or more.
  *
  * Stage semantics under composition: boilerplate document frequency is
  * computed on the DEDUPED corpus (a span repeated only via exact-dup
  * copies is not boilerplate — dedup first is the standard order); quality
  * rules run on the CLEANED text (a doc that is boilerplate-heavy fails
  * type-token or length bounds after removal, which is the intent);
  * packing receives quality-passing TRAIN-split docs only, so sequence
  * offsets are dense within the final training corpus.
  */
object CurationPipeline {

  import DedupQueries.{BoilerplateDf, SpanLen}
  import CurationQueries.SeqLen
  import QualityQueries.{MaxMeanWordLen, MaxTopBigramFrac, MinMeanWordLen, MinTypeTokenRatio, ValFrom}

  /** Stage-1 program (unmaterialized, exposed for PlanSpec's one-raw-scan
    * pin): exact-dedup survivors with their lang and raw text — q22's hash
    * + rank rule, keep = rank 1. */
  private[graft] def keptFrame(s: SparkSession, dir: String): DataFrame = {
    val h = sha2(lower(trim(col("text"))), 256)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        row_number().over(Window.partitionBy(h).orderBy(col("doc_id"))).as("rnk"))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("lang"), col("text"))
  }

  /** Stages 1+2 materialized: (doc_id, lang, ctext) — dedup survivors with
    * span-cleaned text (q22e's program over the kept table; a doc whose
    * every span is boilerplate survives with ctext = '' and dies at the
    * quality gate, same contract as q22e). Exposed for PlanSpec. */
  private[graft] def curatedCorpus(s: SparkSession, dir: String): DataFrame =
    Materialize(s, dir, "q44_curated") {
      val kept = Materialize(s, dir, "q44_kept")(keptFrame(s, dir))
      val src = kept.select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      val segs = src.select(col("doc_id"), col("lang"),
        posexplode(transform(
          sequence(lit(0),
            ceil(size(col("toks")) / lit(SpanLen.toDouble)).cast("int") - 1),
          j => concat_ws(" ", slice(col("toks"), j * SpanLen + 1, lit(SpanLen)))))
          .as(Seq("j", "stext")))
      val h = segs.withColumn("hh", hash32(col("stext")))
      val bp = h.groupBy(col("hh"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= BoilerplateDf)
        .select(col("hh"))
      val keptseg = h.join(broadcast(bp), Seq("hh"), "left_anti")
      val agg = keptseg.groupBy(col("doc_id")).agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("j"), col("stext")))),
          _.getField("stext"))).as("clean_text"))
      h.select(col("doc_id"), col("lang")).distinct()
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("clean_text"), lit("")).as("ctext"))
    }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q44_curation_pipeline",
      s"""WITH d AS (SELECT doc_id, lang, text,
         |    ROW_NUMBER() OVER (PARTITION BY sha256(lower(trim(text)))
         |                       ORDER BY doc_id) AS rnk
         |  FROM documents),
         |k AS (SELECT doc_id, lang, text FROM d WHERE rnk = 1),
         |src AS (SELECT doc_id, lang, ${sqlTokens("text")} AS toks FROM k),
         |segs AS (SELECT doc_id, lang, j,
         |    array_to_string(toks[(j*$SpanLen+1):(j*$SpanLen+$SpanLen)], ' ') AS stext
         |  FROM src, unnest(generate_series(0,
         |    CAST(ceil(len(toks)/$SpanLen.0) AS BIGINT) - 1)) AS g(j)),
         |h AS (SELECT doc_id, lang, j, stext, ${sqlHash32("stext")} AS hh FROM segs),
         |bp AS (SELECT hh FROM (SELECT hh, COUNT(DISTINCT doc_id) AS df
         |                       FROM h GROUP BY 1) WHERE df >= $BoilerplateDf),
         |keptseg AS (SELECT doc_id, j, stext FROM h
         |            WHERE hh NOT IN (SELECT hh FROM bp)),
         |agg AS (SELECT doc_id, string_agg(stext, ' ' ORDER BY j) AS clean_text
         |        FROM keptseg GROUP BY 1),
         |cur AS (SELECT t.doc_id, t.lang, COALESCE(agg.clean_text, '') AS ctext
         |        FROM (SELECT DISTINCT doc_id, lang FROM h) t
         |        LEFT JOIN agg ON t.doc_id = agg.doc_id),
         |ct AS (SELECT doc_id, lang, ${sqlTokens("ctext")} AS toks FROM cur),
         |tok AS (SELECT doc_id, 0 AS kind, unnest(toks) AS v FROM ct),
         |bg AS (SELECT doc_id, 1 AS kind,
         |  unnest(${sqlShingles("toks", n = 2)}) AS v FROM ct
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
         |  FROM c GROUP BY doc_id),
         |q AS (SELECT doc_id FROM m
         |  WHERE wlen_sum::DOUBLE / n_tok BETWEEN $MinMeanWordLen AND $MaxMeanWordLen
         |    AND n_types::DOUBLE / n_tok >= $MinTypeTokenRatio
         |    AND COALESCE(top_bg, 0)::DOUBLE / greatest(n_bg, 1) <= $MaxTopBigramFrac),
         |tr AS (SELECT doc_id FROM q
         |  WHERE ${sqlHash32("concat('split:', doc_id)")} % 100 < $ValFrom),
         |t AS (SELECT ct.lang, ct.doc_id,
         |    len(list_filter(ct.toks, x -> x <> '')) AS n_tok
         |  FROM ct JOIN tr ON ct.doc_id = tr.doc_id),
         |o AS (SELECT lang, doc_id, n_tok,
         |  CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
         |  FROM t),
         |sq AS (SELECT lang, doc_id, n_tok, off,
         |  unnest(generate_series(off // $SeqLen, (off + n_tok - 1) // $SeqLen)) AS seq
         |  FROM o WHERE n_tok > 0)
         |SELECT lang, doc_id, seq,
         |  greatest(seq * $SeqLen - off, 0) AS seg_begin,
         |  least((seq + 1) * $SeqLen, off + n_tok) - greatest(seq * $SeqLen, off) AS seg_len,
         |  greatest(off - seq * $SeqLen, 0) AS offset_in_seq
         |FROM sq ORDER BY lang, seq, doc_id""".stripMargin) { (s, dir) =>
      val ct = curatedCorpus(s, dir)
        .select(col("doc_id"), col("lang"), tokens(col("ctext")).as("toks"))
      // quality gate: q25h's program verbatim, over the CLEANED tokens
      val tok = ct.select(col("doc_id"), lit(0).as("kind"), explode(col("toks")).as("v"))
      val bg = ct.filter(size(col("toks")) >= 2)
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
      val topBgFrac = coalesce(col("top_bg"), lit(0L)).cast("double") /
        greatest(col("n_bg"), lit(1L))
      val qkeep = m.filter(
        meanWlen.between(MinMeanWordLen, MaxMeanWordLen) &&
          ttr >= MinTypeTokenRatio && topBgFrac <= MaxTopBigramFrac)
        .select(col("doc_id"))
      // split gate: q25j's hash rule, train bucket only
      val train = qkeep.filter(
        hash32(concat(lit("split:"), col("doc_id"))) % 100 < ValFrom)
      // packing: q25o's program over the curated train corpus
      val t = ct.join(train, Seq("doc_id"))
        .select(col("lang"), col("doc_id"),
          size(filter(col("toks"), x => x =!= "")).cast("long").as("n_tok"))
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
    }
  )
}
