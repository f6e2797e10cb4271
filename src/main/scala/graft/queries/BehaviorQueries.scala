package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q32–Q35 — user/behavior analytics shapes the reference's warehouse layer
  * serves (conversion-style session and lifecycle questions over the event
  * stream, basket affinity over the order lines): batch sessionization
  * (gaps-and-islands), co-purchase pair mining, CDC-style latest-state
  * compaction, and user-growth accumulation.
  *
  * Scale notes: sessionization windows partition by user — no global sort,
  * every user's stream sessionizes independently (the streaming twin is
  * q20b's session_window); pair mining is a self equi-join on the order key
  * (pairs per order are bounded by basket size, so output is linear in
  * orders at fixed basket width); latest-state uses a max-of-struct
  * aggregate, which compacts map-side BEFORE the shuffle — the shuffle
  * carries one candidate row per (task, user), not the full history the
  * row_number() formulation would move; user growth shuffles once on user
  * (first-seen) then once on day (tiny).
  */
object BehaviorQueries {

  /** Session gap: a new session starts after ≥ 24h of inactivity (sized to
    * the testdata's event density; the operator is gap-parametric). */
  private val GapMicros: Long = 24L * 3600 * 1000000

  val defs: Seq[QueryDef] = Seq(
    // Q32 — market-basket co-purchase pairs: parts appearing in the same
    // order, support ≥ 3 orders. Distinct (order, part) first so multi-line
    // items don't inflate support; the self-join key is the order key.
    QueryDef(
      "q32_copurchase_pairs",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_orders
        |FROM op a JOIN op b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY pa, pb HAVING COUNT(*) >= 3
        |ORDER BY n_orders DESC, pa, pb""".stripMargin) { (s, dir) =>
      val op = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      op.alias("a")
        .join(op.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 3)
        .orderBy(col("n_orders").desc, col("pa"), col("pb"))
    },

    // Q33 — batch sessionization (gaps-and-islands): flag rows whose gap
    // from the previous event exceeds the threshold, running-sum the flags
    // into session ids, then aggregate per session. Two windows + one
    // aggregation, all partitioned by user. Event-id breaks timestamp ties
    // so the session assignment is total.
    QueryDef(
      "q33_sessionize",
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > $GapMicros
         |           OR lag(epoch_us(ts))
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |      THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts, event_id, value,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g)
         |SELECT user_id, sid, COUNT(*) AS n_events,
         |  MIN(ts) AS t_start, MAX(ts) AS t_end, ${Det.sqlSum("value")} AS val_sum
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, sid""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val prev = lag(unix_micros(col("ts")), 1).over(w)
      val g = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("brk",
          when(unix_micros(col("ts")) - prev > GapMicros || prev.isNull, 1L)
            .otherwise(0L))
      g.withColumn("sid",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("t_start"),
          max(col("ts")).as("t_end"),
          Det.dsum(col("value")).as("val_sum"))
        .orderBy("user_id", "sid")
    },

    // Q34 — latest-state compaction (the CDC/upsert-view pattern: one
    // current row per key from an append-only history). max(struct(...))
    // keys the comparison on (ts, event_id) — unique, so the trailing
    // payload fields never decide — and compacts in the partial aggregate:
    // at 100 TB the shuffle moves one candidate per (map task, user), where
    // a row_number() window would shuffle the entire history to sort it.
    QueryDef(
      "q34_latest_state",
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |  event_type AS last_type, value AS last_value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
          .as("last"))
        .select(
          col("user_id"),
          col("last.ts").as("last_ts"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"))
        .orderBy("user_id")
    },

    // Q35 — user growth: first-seen day per user, daily new-user counts,
    // and the cumulative user base. The cumulative window is a global
    // ordered sum — but over at most one row per DAY (the daily aggregate),
    // so the single-reducer stage is a few-hundred-row frame, not the event
    // stream.
    QueryDef(
      "q35_user_growth",
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        |           FROM events GROUP BY user_id),
        |d AS (SELECT first_day AS date, COUNT(*) AS new_users
        |      FROM f GROUP BY first_day)
        |SELECT date, new_users,
        |  SUM(new_users) OVER (ORDER BY date ROWS UNBOUNDED PRECEDING) AS cum_users
        |FROM d ORDER BY date""".stripMargin) { (s, dir) =>
      val d = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"))
        .groupBy(col("first_day").as("date"))
        .agg(count(lit(1)).as("new_users"))
      d.select(col("date"), col("new_users"),
          sum(col("new_users")).over(
            Window.orderBy(col("date"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cum_users"))
        .orderBy("date")
    }
  )
}
