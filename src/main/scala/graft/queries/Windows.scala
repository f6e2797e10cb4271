package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function coverage (SURVEY.md §2.5 W1–W3) — ranking, lag/lead
  * funnel timing, running/frame aggregation. Each is a single shuffle on the
  * partition key; ORDER BY inside a partition carries a unique tie-break
  * (event_id / key) so results are deterministic across engines.
  */
object Windows {

  private val kPat = "\"k\":\\s*(\\d+)"

  val defs: Seq[QueryDef] = Seq(
    // W1/Q14 — top-3 keys per event_type by count (rank within group).
    QueryDef(
      "q14_topk_per_type",
      s"""SELECT event_type, k, cnt, rn FROM (
         |  SELECT event_type, k, cnt,
         |  row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, k) AS rn
         |  FROM (
         |    SELECT event_type, regexp_extract(props, '$kPat', 1) AS k, COUNT(*) AS cnt
         |    FROM events GROUP BY 1, 2))
         |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir)
        .groupBy(col("event_type"), regexp_extract(col("props"), kPat, 1).as("k"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("cnt").desc, col("k"))
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("event_type", "rn")
    },

    // W2/Q15 — lag: per-user previous event time and inter-event gap in
    // seconds (funnel step timing). Gap compares second-truncated instants
    // on both engines (unix_timestamp ≡ DuckDB date_diff('second')).
    QueryDef(
      "q15_event_gaps",
      """SELECT event_id, user_id, ts,
        |lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
        |date_diff('second',
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_s", unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
        .select("event_id", "user_id", "ts", "prev_ts", "gap_s")
        .orderBy("user_id", "event_id")
    },

    // W3/Q16 — running revenue per user (frame aggregation). The running sum
    // uses the exact-decimal path: windowed double addition is
    // order-dependent *within the frame implementation* (DuckDB uses segment
    // trees), decimals are associative and thus engine-independent.
    QueryDef(
      "q16_running_revenue",
      """SELECT event_id, user_id, ts,
        |CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn(
          "running_value",
          sum(col("value").cast(DecimalType(28, 6))).over(w).cast("double"))
        .select("event_id", "user_id", "ts", "running_value")
        .orderBy("user_id", "event_id")
    },

    // W3+/Q16b — value-based (RANGE) frame: trailing 1-hour revenue per
    // user over epoch seconds, plus first/last value and ntile coverage.
    // RANGE frames are peer-inclusive in both engines; the order column is
    // floor-seconds on both sides so peers coincide exactly.
    QueryDef(
      "q16b_range_frame",
      """SELECT event_id, user_id,
        |CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
        |  PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_value,
        |first_value(event_type) OVER w AS first_type,
        |last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
        |CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val wRange = Window
        .partitionBy(col("user_id")).orderBy(col("ts_s"))
        .rangeBetween(-3600, Window.currentRow)
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .withColumn("ts_s", col("ts").cast("long"))
        .withColumn("hour_value",
          sum(col("value").cast(DecimalType(28, 6))).over(wRange).cast("double"))
        .withColumn("first_type", first(col("event_type")).over(wOrd))
        .withColumn("last_type", last(col("event_type")).over(wFull))
        .withColumn("quartile", ntile(4).over(wOrd))
        .select("event_id", "user_id", "hour_value", "first_type", "last_type", "quartile")
        .orderBy("user_id", "event_id")
    },

    // W1+/Q16c — the remaining rank family: dense_rank, percent_rank,
    // cume_dist over each user's events by value. percent_rank and
    // cume_dist are exact rationals of integer rank/count — (r-1)/(n-1)
    // and r'/n evaluate to the identical double in any engine, so they
    // hash-match without a decimal detour. All four share one
    // (user_id)-partitioned sort; ties broken on event_id for
    // cross-engine determinism.
    QueryDef(
      "q16c_rank_battery",
      """SELECT event_id, user_id,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy("user_id", "event_id")
    }
  )
}
