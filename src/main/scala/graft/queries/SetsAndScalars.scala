package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.7 U1–U3) and the scalar-function battery
  * (§2.8 F1–F13) matched against DuckDB.
  */
object SetsAndScalars {

  val defs: Seq[QueryDef] = Seq(
    // U1–U3/Q17 — INTERSECT / EXCEPT / UNION over user sets, labeled.
    QueryDef(
      "q17_set_ops",
      """WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT 'intersect' AS op, user_id FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'except' AS op, user_id FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'union' AS op, user_id FROM (SELECT user_id FROM v UNION SELECT user_id FROM p)
        |ORDER BY op, user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val v = ev.filter(col("event_type") === "view").select("user_id").distinct()
      val p = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      v.intersect(p).select(lit("intersect").as("op"), col("user_id"))
        .unionAll(v.except(p).select(lit("except").as("op"), col("user_id")))
        .unionAll(v.union(p).distinct().select(lit("union").as("op"), col("user_id")))
        .orderBy("op", "user_id")
    },

    // F1–F13/Q18 — scalar battery: string, date/time, math, cast, null
    // handling. Functions chosen so both engines give bit-identical results
    // (no libm-dependent fns like ln/exp; floor/ceil cast to BIGINT because
    // DuckDB keeps them DOUBLE while Spark returns LONG; DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all).
    QueryDef(
      "q18_scalar_battery",
      """SELECT event_id,
        |concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS s_concat,
        |upper(event_type) AS s_upper,
        |substring(event_type, 1, 2) AS s_sub,
        |length(props) AS s_len,
        |regexp_replace(props, '[0-9]+', '#', 'g') AS s_masked,
        |str_split(props, ':')[1] AS s_first,
        |CAST(ts AS DATE) AS d_date,
        |strftime(ts, '%Y-%m-%d %H') AS d_fmt,
        |CAST(EXTRACT(hour FROM ts) AS INTEGER) AS d_hour,
        |CAST(dayofweek(ts) + 1 AS INTEGER) AS d_dow,
        |abs(value - 10.0) AS m_abs,
        |CAST(FLOOR(value) AS BIGINT) AS m_floor,
        |CAST(CEIL(value) AS BIGINT) AS m_ceil,
        |sqrt(abs(value)) AS m_sqrt,
        |user_id % 7 AS m_mod,
        |COALESCE(NULLIF(event_type, 'error'), 'none') AS n_coal,
        |(event_type = 'view') AS b_isview
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          concat_ws("|", col("event_type"), col("user_id").cast("string")).as("s_concat"),
          upper(col("event_type")).as("s_upper"),
          substring(col("event_type"), 1, 2).as("s_sub"),
          length(col("props")).cast("long").as("s_len"),
          regexp_replace(col("props"), "[0-9]+", "#").as("s_masked"),
          element_at(split(col("props"), ":"), 1).as("s_first"),
          to_date(col("ts")).as("d_date"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("d_fmt"),
          hour(col("ts")).as("d_hour"),
          dayofweek(col("ts")).as("d_dow"),
          abs(col("value") - 10.0).as("m_abs"),
          floor(col("value")).as("m_floor"),
          ceil(col("value")).as("m_ceil"),
          sqrt(abs(col("value"))).as("m_sqrt"),
          (col("user_id") % 7).as("m_mod"),
          coalesce(nullif(col("event_type"), lit("error")), lit("none")).as("n_coal"),
          (col("event_type") === "view").as("b_isview"))
        .orderBy("event_id")
    },

    // F12-F13/Q18b — array + JSON battery: JSON path extraction on the
    // `props` column (real parser on both sides, not regexp), and the array
    // surface (sort/contains/position/slice/reverse/size) over tokens.
    QueryDef(
      "q18b_array_json_battery",
      """WITH src AS (
        |  SELECT event_id, props, str_split(event_type, '') AS chars
        |  FROM events)
        |SELECT event_id,
        |json_extract_string(props, '$.k') AS j_str,
        |CAST(json_extract(props, '$.k') AS BIGINT) AS j_int,
        |CAST(json_extract(props, '$.k') AS BIGINT) % 10 = 0 AS j_round,
        |array_to_string(list_sort(chars), '') AS a_sorted,
        |list_contains(chars, 'e') AS a_has_e,
        |CAST(list_position(chars, 'i') AS INTEGER) AS a_pos_i,
        |array_to_string(chars[2:3], '') AS a_slice,
        |array_to_string(list_reverse(chars), '') AS a_rev,
        |len(chars) AS a_len
        |FROM src ORDER BY event_id""".stripMargin) { (s, dir) =>
      // per-row JSON parse + array battery is the cost; spread the
      // single-file scan so it doesn't run on one task (guide §2.5)
      Spread(Tables.events(s, dir), col("event_id"))
        .select(
          col("event_id"), col("props"),
          filter(split(col("event_type"), ""), c => c =!= "").as("chars"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("j_str"),
          get_json_object(col("props"), "$.k").cast("long").as("j_int"),
          (get_json_object(col("props"), "$.k").cast("long") % 10 === 0).as("j_round"),
          concat_ws("", array_sort(col("chars"))).as("a_sorted"),
          array_contains(col("chars"), "e").as("a_has_e"),
          array_position(col("chars"), "i").cast("int").as("a_pos_i"),
          concat_ws("", slice(col("chars"), 2, 2)).as("a_slice"),
          concat_ws("", reverse(col("chars"))).as("a_rev"),
          size(col("chars")).cast("long").as("a_len"))
        .orderBy("event_id")
    }
  )
}
