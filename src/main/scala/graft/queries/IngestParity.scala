package graft.queries

import graft.operators.EcommerceOps
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Q01/Q02 — the reference's two ingest pipelines' transform semantics
  * (SURVEY.md §2.2 P1–P7, §2.1 S4/S5), oracle-checked.
  *
  * The reference's own input file is absent from its checkout
  * (.MISSING_LARGE_BLOBS), so the driver testdata `events` table stands in:
  * each query first *synthesizes* the e-commerce-shaped columns (a dotted
  * 2–4-part category_code, a nullable brand) deterministically from
  * event_id/user_id — identically in the DataFrame and the DuckDB SQL — then
  * applies the parity transforms from [[graft.operators.EcommerceOps]].
  * Everything is a narrow (shuffle-free) plan: at 100 TB these run as one
  * pipelined scan→project pass per partition.
  */
object IngestParity {

  /** Deterministic 2/3/4-part dotted path from ids (no spaces/quotes). */
  private def synthCode: Column = concat(
    lit("cat"), col("user_id") % 5,
    lit(".sub"), col("event_id") % 100,
    when(col("event_id") % 3 >= 1, concat(lit(".prod"), col("event_id") % 50))
      .otherwise(lit("")),
    when(col("event_id") % 3 === 2, concat(lit(".x"), col("event_id") % 20))
      .otherwise(lit("")))

  private def synthBrand: Column =
    when(col("event_id") % 7 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("brand"), col("user_id") % 10))

  private val synthCodeSql =
    """concat('cat', user_id % 5, '.sub', event_id % 100,
      |  CASE WHEN event_id % 3 >= 1 THEN concat('.prod', event_id % 50) ELSE '' END,
      |  CASE WHEN event_id % 3 = 2 THEN concat('.x', event_id % 20) ELSE '' END)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // Q01 — batch-pipeline parity: Python str(dict(zip(attrs, split)))
    // category pack (P6, zip-truncation included), as-executed brand
    // stringification (P1 bug preserved: astype-before-fillna ⇒ 'nan') next
    // to the intended fill, P2 stringify-all.
    QueryDef(
      "q01_batch_transform",
      s"""WITH src AS (
         |  SELECT event_id, $synthCodeSql AS category_code,
         |    CASE WHEN event_id % 7 = 0 THEN NULL
         |         ELSE concat('brand', user_id % 10) END AS brand
         |  FROM events),
         |parts AS (SELECT *, str_split(category_code, '.') AS p FROM src)
         |SELECT event_id, category_code,
         |  CASE len(p)
         |    WHEN 2 THEN concat('{''category'': ''', p[1], ''', ''sub_category'': ''', p[2], '''}')
         |    WHEN 3 THEN concat('{''category'': ''', p[1], ''', ''sub_category'': ''', p[2], ''', ''product'': ''', p[3], '''}')
         |    WHEN 4 THEN concat('{''category'': ''', p[1], ''', ''sub_category'': ''', p[2], ''', ''product'': ''', p[3], ''', ''product_details'': ''', p[4], '''}')
         |  END AS category_dict,
         |  coalesce(CAST(brand AS VARCHAR), 'nan') AS brand_batch,
         |  coalesce(brand, 'Not Specified') AS brand_fixed
         |FROM parts ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("category_code", synthCode)
        .withColumn("brand", synthBrand)
        .select(
          col("event_id"),
          col("category_code"),
          EcommerceOps.pyDictRender(col("category_code")).as("category_dict"),
          EcommerceOps.brandAsExecuted(col("brand")).as("brand_batch"),
          EcommerceOps.fillBrand(col("brand")).as("brand_fixed"))
        .orderBy("event_id")
    },

    // Q02 — streaming-DoFn parity: wire-format timestamp round-trip (P3),
    // hour by string slice (P4), dotted-path → 4 columns with NULL past the
    // end (P5, Python list-append ≡ element_at), float cast (F7).
    QueryDef(
      "q02_stream_transform",
      s"""WITH src AS (
         |  SELECT event_id, value,
         |    concat(strftime(ts, '%Y-%m-%d %H:%M:%S'), ' UTC') AS event_time_string,
         |    $synthCodeSql AS category_code
         |  FROM events),
         |parts AS (SELECT *, str_split(category_code, '.') AS p FROM src)
         |SELECT event_id,
         |  strptime(regexp_replace(event_time_string, ' UTC$$', ''), '%Y-%m-%d %H:%M:%S') AS event_time,
         |  CAST(value AS DOUBLE) AS price,
         |  CAST(substring(event_time_string, 12, 2) AS INTEGER) AS hour,
         |  p[1] AS category, p[2] AS sub_category, p[3] AS product,
         |  p[4] AS product_details
         |FROM parts ORDER BY event_id""".stripMargin) { (s, dir) =>
      // still a narrow pass at scale (Spread is the identity there); on the
      // single-file local testdata it spreads the per-row date-format /
      // regex work off the one scan task (guide §2.5)
      val src = Spread(Tables.events(s, dir), col("event_id"))
        .withColumn("event_time_string",
          concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit(" UTC")))
        .withColumn("category_code", synthCode)
      val cats = EcommerceOps.categoryColumns(col("category_code"))
      src.select(
        Seq(
          col("event_id"),
          EcommerceOps.normalizeEventTime(col("event_time_string")).as("event_time"),
          col("value").cast("double").as("price"),
          EcommerceOps.hourFromString(col("event_time_string")).as("hour")) ++
          cats.map { case (n, c) => c.as(n) }: _*)
        .orderBy("event_id")
    },

    // Q02b — replay wire codec round-trip (S4 encode / S5 decode): fields
    // survive the comma-joined UTF-8 message intact and re-type correctly.
    QueryDef(
      "q02b_message_codec",
      """WITH msg AS (
        |  SELECT event_id, concat(event_id, ',', event_type, ',', user_id) AS m
        |  FROM events)
        |SELECT event_id, length(m) AS msg_len,
        |  CAST(str_split(m, ',')[1] AS BIGINT) AS d_event_id,
        |  str_split(m, ',')[2] AS d_event_type,
        |  CAST(str_split(m, ',')[3] AS BIGINT) AS d_user_id
        |FROM msg ORDER BY event_id""".stripMargin) { (s, dir) =>
      val msg = EcommerceOps.encodeMessage(
        Seq(col("event_id"), col("event_type"), col("user_id")))
      Tables.events(s, dir)
        .withColumn("m", msg)
        .select(
          col("event_id"),
          length(col("m").cast("string")).cast("long").as("msg_len"),
          EcommerceOps.decodeField(col("m"), 1).cast("long").as("d_event_id"),
          EcommerceOps.decodeField(col("m"), 2).as("d_event_type"),
          EcommerceOps.decodeField(col("m"), 3).cast("long").as("d_user_id"))
        .orderBy("event_id")
    },

    // S1+/Q40 — source/sink format breadth: round-trip the documents table
    // through JSON-lines (the interchange format LLM corpora actually ship
    // in) and ORC (the other columnar warehouse format), re-read each with
    // an EXPLICIT schema (schema inference over a 100 TB JSONL lake is a
    // full extra scan — always declare), and verify row counts and
    // per-column equality against the original scan. The engine computes
    // the verification itself (join on doc_id, null-safe column compares);
    // the oracle pins the expectation: all rows back, zero mismatches.
    QueryDef(
      "q40_format_roundtrip",
      """SELECT * FROM (
        |  SELECT 'jsonl' AS fmt, (SELECT COUNT(*) FROM documents) AS n_rows,
        |         CAST(0 AS BIGINT) AS n_mismatch
        |  UNION ALL
        |  SELECT 'orc', (SELECT COUNT(*) FROM documents), CAST(0 AS BIGINT)
        |) ORDER BY fmt""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      def roundTrip(fmt: String): org.apache.spark.sql.DataFrame = {
        val d = graft.TempDirs.create(s"graft_q40_${fmt}_")
        fmt match {
          case "jsonl" => docs.write.mode("overwrite").json(d)
          case "orc"   => docs.write.mode("overwrite").orc(d)
        }
        val back = fmt match {
          case "jsonl" => s.read.schema(docs.schema).json(d)
          case "orc"   => s.read.schema(docs.schema).orc(d)
        }
        val o = docs.select(col("doc_id"), col("lang").as("o_lang"),
          col("n_chars").as("o_n_chars"), col("text").as("o_text"))
        back.join(o, "doc_id")
          .select(when(col("lang") <=> col("o_lang") &&
              col("n_chars") <=> col("o_n_chars") &&
              col("text") <=> col("o_text"), 0L).otherwise(1L).as("bad"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bad")).as("n_mismatch"))
          .select(lit(fmt).as("fmt"), col("n_rows"), col("n_mismatch"))
      }
      roundTrip("jsonl").unionByName(roundTrip("orc")).orderBy("fmt")
    },

    // S1+++/Q40b — schema evolution on the lake: an old-writer batch
    // (doc_id, lang, text) and a new-writer batch that ADDED a column
    // (n_chars) land in ONE dataset dir, as they do when a producer is
    // upgraded mid-stream; `mergeSchema` unions the file footers so
    // old-batch rows surface NULL for the added column and aggregation
    // over the union just works. Scale note: mergeSchema's footer sweep
    // reads every file's footer at plan time — affordable as a one-off
    // schema DISCOVERY step, but a 100 TB production read passes the
    // unified schema explicitly (s.read.schema(evolved).parquet(...)),
    // which skips the sweep entirely; the demo exercises the discovery
    // path. The oracle recomputes the same aggregate from the base table
    // (old/new batch membership is doc_id parity, so "column present"
    // is expressible as a CASE filter).
    QueryDef(
      "q40b_schema_evolution",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS n_evolved,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS chars_evolved
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val d = graft.TempDirs.create("graft_q40b_")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("text"))
        .write.mode("overwrite").parquet(d)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        .write.mode("append").parquet(d)
      s.read.option("mergeSchema", "true").parquet(d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("n_chars")).as("n_evolved"),
          sum(col("n_chars")).as("chars_evolved"))
        .orderBy("lang")
    }
  )
}
