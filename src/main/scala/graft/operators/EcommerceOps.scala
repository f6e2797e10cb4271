package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's ingest/transform operators (SURVEY.md §2.2 P1–P7, §2.1
  * S4/S5) as pure column expressions / `DataFrame => DataFrame` functions.
  *
  * Everything here is built from built-in (whole-stage-codegen'd) expressions
  * — no UDFs — so the transforms stay inside Tungsten at any scale. The two
  * pipeline-level compositions ([[batchTransform]], [[streamTransform]])
  * replace the reference's driver-side pandas chunking
  * (batch_pipeline/write_session_batch.py:133-175) and per-message Beam DoFn
  * (streaming_pipeline/write_session_stream.py:19-59) with single lazy narrow
  * plans: no shuffle, no driver collect, pipelined end-to-end.
  */
object EcommerceOps {

  /** Attribute names for the dotted category path, in reference order
    * (write_session_batch.py:147-148 / write_session_stream.py:37). */
  val categoryAttrs: Seq[String] =
    Seq("category", "sub_category", "product", "product_details")

  // ---------------------------------------------------------------------
  // P6 — Python `str(dict(zip(attrs, code.split('.'))))` rendering
  // (write_session_batch.py:12-22). `zip` truncates to the shorter list; the
  // rendering is CPython's dict repr: `{'k': 'v', 'k2': 'v2'}`.
  //
  // Implementation: zip_with pads the shorter side with NULL, making the
  // pair-expression NULL (concat of anything with NULL is NULL), and
  // concat_ws *skips* NULL array elements — so padding becomes truncation,
  // bit-for-bit matching Python for 0..4 path parts. Pure codegen
  // expressions; values are id-like strings (no quotes/backslashes), so no
  // repr-escaping is needed — documented limitation vs full CPython repr.
  // ---------------------------------------------------------------------
  def pyDictRender(code: Column): Column = {
    val keys = array(categoryAttrs.map(lit): _*)
    val parts = split(code, "\\.")
    val pairs = zip_with(keys, parts, (k, v) =>
      concat(lit("'"), k, lit("': '"), v, lit("'")))
    concat(lit("{"), concat_ws(", ", pairs), lit("}"))
  }

  /** P5 — dotted path → (category, sub_category, product, product_details),
    * missing parts NULL (write_session_stream.py:37-41; Python list-append
    * semantics ≡ 1-based `try_element_at`, which yields NULL past the end —
    * plain `element_at` throws under Spark 4's default ANSI mode). */
  def categoryColumns(code: Column): Seq[(String, Column)] = {
    val parts = split(code, "\\.")
    categoryAttrs.zipWithIndex.map { case (attr, i) =>
      attr -> try_element_at(parts, lit(i + 1))
    }
  }

  /** P3 — timestamp normalize: strip the ` UTC` / `+00:00 UTC` wire suffix
    * and parse as a naive (session-TZ) timestamp
    * (send_session_stream.py:13-17, write_session_stream.py:25-30). */
  def normalizeEventTime(tsString: Column): Column =
    to_timestamp(regexp_replace(tsString, "( \\+00:00)? UTC$", ""),
      "yyyy-MM-dd HH:mm:ss")

  /** P4 — hour as `int(ts_str[11:13])` (write_session_stream.py:34-35);
    * byte-parity with the Python slice rather than `hour()` on a parsed
    * value (identical for well-formed inputs). */
  def hourFromString(tsString: Column): Column =
    substring(tsString, 12, 2).cast("int")

  /** P1 — intended brand null-fill (write_session_batch.py:32-33). */
  def fillBrand(brand: Column): Column =
    coalesce(brand, lit("Not Specified"))

  /** P1-as-executed — the reference stringifies *before* filling
    * (`astype(str)` at write_session_batch.py:29 runs before `fillna` at
    * :32), so pandas NaN is already the string `'nan'` and the fill never
    * fires. Faithful batch semantics, kept for oracle parity. */
  def brandAsExecuted(brand: Column): Column =
    coalesce(brand.cast("string"), lit("nan"))

  /** P2 — cast-all-to-string projection (`astype(str)`,
    * write_session_batch.py:29) with pandas' NaN→'nan' rendering for NULLs. */
  def castAllToString(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit("nan")).as(c)): _*)

  /** P7 — synthetic row id (pandas index → record_id,
    * write_session_batch.py:172-173). Spark's monotonically_increasing_id is
    * unique and increasing *within* a partition but not densely sequential
    * across partitions — the scalable contract (a global dense sequence
    * would serialize the job through one task at 100 TB). */
  def withRecordId(df: DataFrame): DataFrame =
    df.withColumn("record_id", monotonically_increasing_id())

  // ---------------------------------------------------------------------
  // S4/S5 — replay wire codec: row → comma-joined UTF-8 bytes → fields
  // (send_session_stream.py:30-33 / write_session_stream.py:51-59).
  // ---------------------------------------------------------------------

  /** S4 — encode a row as one comma-joined UTF-8 binary message, faithfully:
    * nulls render as the string `NaN` (pandas `to_string`) and *all*
    * whitespace collapses to commas (send_session_stream.py:23-33) — which
    * splits a `yyyy-MM-dd HH:mm:ss UTC` timestamp into three wire fields,
    * exactly like the reference (rejoined at write_session_stream.py:25-28).
    * Values containing spaces therefore cannot round-trip (FIXTURES.md). */
  def encodeMessage(cols: Seq[Column]): Column =
    regexp_replace(
      concat_ws(",", cols.map(c => coalesce(c.cast("string"), lit("NaN"))): _*),
      "\\s+", ",").cast("binary")

  /** S5 — decode a comma-joined message back to string fields (1-based). */
  def decodeField(message: Column, i: Int): Column =
    element_at(split(message.cast("string"), ","), i)

  // ---------------------------------------------------------------------
  // Pipeline compositions over the reference's 9-column event schema
  // (SURVEY.md §1.2: event_time, event_type, product_id, category_id,
  // category_code, brand, price, user_id, user_session).
  // ---------------------------------------------------------------------

  /** The batch pipeline's `transform_data`
    * (write_session_batch.py:25-49) as one narrow plan: stringify-all,
    * (no-op) brand fill, dict-pack category_code, synthetic record_id. */
  def batchTransform(events: DataFrame): DataFrame = {
    val stringified = castAllToString(events)
    withRecordId(
      stringified.withColumn("category_code", pyDictRender(col("category_code"))))
  }

  /** The streaming pipeline's DoFn (write_session_stream.py:19-59) as one
    * narrow plan over decoded string columns: normalized timestamp, float
    * price, hour, four category columns appended. */
  def streamTransform(decoded: DataFrame): DataFrame = {
    val withTs = decoded
      .withColumn("event_time", normalizeEventTime(col("event_time_string")))
      .withColumn("price", col("price").cast("double"))
      .withColumn("hour", hourFromString(col("event_time_string")))
    categoryColumns(col("category_code")).foldLeft(withTs) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
  }
}
