package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The five reference analyses (SURVEY.md §2.3 A1–A5, README.md:56-76 of the
  * reference) re-declared over the testdata `events` table, plus rollup and
  * approx-distinct coverage (A6/A7).
  *
  * All are single hash-aggregate plans: partial (map-side) aggregation then a
  * single shuffle on the grouping key — the minimal-shuffle shape that scales
  * linearly with input on a large cluster. Double sums/means go through the
  * exact-decimal path (see [[Det]]) so results hash-match DuckDB.
  */
object Analytics {
  import Det._

  /** JSON key extraction that both engines share: regexp, not a JSON parser,
    * so the oracle does not depend on DuckDB's JSON extension. */
  private val kPatScala = "\"k\":\\s*(\\d+)"
  private val kPatSql = "\"k\":\\s*(\\d+)"

  /** Dense (hour × event_type) grid with zero-filled gaps, shared by q03b
    * and q03c. One events scan into a materialized tiny aggregate; spine
    * and type dims derive from it (every event lands in the aggregate, so
    * its min/max hour and distinct types equal the raw table's). */
  private def denseHourlyGrid(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val counts = Materialize(s, dir, "q03b_counts")(
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("chr"), col("event_type").as("ct"))
        .agg(count(lit(1)).as("ccnt")))
    val spine = counts
      .agg(min(col("chr")).as("lo"), max(col("chr")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hr"))
    val types = counts.select(col("ct").as("event_type")).distinct()
    spine.crossJoin(broadcast(types))
      .join(broadcast(counts),
        col("chr") === col("hr") && col("ct") === col("event_type"), "left")
      .select(col("hr"), col("event_type"), coalesce(col("ccnt"), lit(0L)).as("cnt"))
  }

  /** DuckDB CTEs producing the identical dense grid (ends with `grid`). */
  private val sqlGridCtes =
    """b AS (SELECT MIN(date_trunc('hour', ts)) AS lo,
      |              MAX(date_trunc('hour', ts)) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
      |types AS (SELECT DISTINCT event_type FROM events),
      |c AS (SELECT date_trunc('hour', ts) AS hr, event_type, COUNT(*) AS cnt
      |      FROM events GROUP BY 1, 2),
      |grid AS (SELECT s.hr, t.event_type, COALESCE(c.cnt, 0) AS cnt
      |         FROM spine s CROSS JOIN types t
      |         LEFT JOIN c ON c.hr = s.hr AND c.event_type = t.event_type)""".stripMargin


  /** q56's anonymity threshold: cells naming fewer distinct users than
    * this are never released individually. */
  private val KAnonK = 5

  val defs: Seq[QueryDef] = Seq(
    // A1/Q03 — daily event counts by type (reference images/daily_events.png).
    QueryDef(
      "q03_daily_counts",
      """SELECT CAST(ts AS DATE) AS date, event_type, COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY date, event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("date"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("date", "event_type")
    },

    // A1+/Q03b — hourly resample with zero-fill: the dense (hour ×
    // event_type) grid a time-series consumer expects, with missing slots
    // as explicit zeros. The big table is scanned ONCE (into the tiny
    // hourly-counts aggregate, materialized because Spark does not CSE
    // across DataFrame branches); the hour spine (min/max → `sequence` →
    // explode, no driver loop) and the type dimension both derive from
    // that aggregate — every event lands in it, so its min/max hour and
    // distinct types equal the raw table's.
    QueryDef(
      "q03b_resample_hours",
      s"""WITH $sqlGridCtes
         |SELECT hr, event_type, cnt FROM grid
         |ORDER BY hr, event_type""".stripMargin) { (s, dir) =>
      denseHourlyGrid(s, dir).orderBy("hr", "event_type")
    },

    // A1+/Q03c — rolling z-score anomaly flags over the dense hourly grid:
    // the ingestion-rate watchdog a data pipeline runs. Mean/variance come
    // from a 24-slot rolling window's integer sum and sum-of-squares —
    // exact in both engines, so the derived doubles (and the |z| > 3 flag)
    // are bit-identical. Zero-filled gaps matter: without the dense grid a
    // silent outage hour would simply be absent instead of flagged.
    QueryDef(
      "q03c_anomaly_hours",
      s"""WITH $sqlGridCtes,
         |w1 AS (SELECT hr, event_type, cnt,
         |    CAST(SUM(cnt) OVER w AS DOUBLE) AS s1,
         |    CAST(SUM(cnt * cnt) OVER w AS DOUBLE) AS s2,
         |    CAST(COUNT(*) OVER w AS DOUBLE) AS n
         |  FROM grid
         |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
         |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
         |w2 AS (SELECT hr, event_type, cnt,
         |    (cnt - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n) + 1e-9) AS z
         |  FROM w1)
         |SELECT hr, event_type, cnt, round(z, 6) AS z, (abs(z) > 3.0) AS is_anomaly
         |FROM w2 ORDER BY event_type, hr""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(-23, Window.currentRow)
      val z = (col("cnt") - col("s1") / col("n")) /
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")) + 1e-9)
      denseHourlyGrid(s, dir)
        .select(col("hr"), col("event_type"), col("cnt"),
          sum(col("cnt")).over(w).cast("double").as("s1"),
          sum(col("cnt") * col("cnt")).over(w).cast("double").as("s2"),
          count(lit(1)).over(w).cast("double").as("n"))
        .select(col("hr"), col("event_type"), col("cnt"),
          round(z, 6).as("z"), (abs(z) > 3.0).as("is_anomaly"))
        .orderBy("event_type", "hr")
    },

    // A1+++/Q03d — gap-fill by last observation carried forward (LOCF):
    // the other standard resample policy besides q03b's zero-fill. Gaps in
    // the dense grid (cnt = 0 ⟺ no events that hour, since the counts agg
    // only emits observed slots) become NULL and are filled with the most
    // recent observed hourly count via `last(_, ignoreNulls)` over an
    // ordered per-type window; hours before the first observation stay
    // NULL. The window runs over the tiny hourly AGGREGATE (24·days rows
    // per type), never the raw events — same scale posture as q03c; the
    // per-type partition is the window's shuffle key.
    QueryDef(
      "q03d_gap_fill_locf",
      s"""WITH $sqlGridCtes
         |SELECT hr, event_type,
         |  last_value(NULLIF(cnt, 0) IGNORE NULLS) OVER (
         |    PARTITION BY event_type ORDER BY hr
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_locf,
         |  cnt > 0 AS observed
         |FROM grid ORDER BY event_type, hr""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      denseHourlyGrid(s, dir)
        .select(col("hr"), col("event_type"),
          last(nullif(col("cnt"), lit(0L)), ignoreNulls = true).over(w)
            .as("cnt_locf"),
          (col("cnt") > 0).as("observed"))
        .orderBy("event_type", "hr")
    },

    // A1++++/Q03e — EWMA smoothing over the dense hourly grid: the
    // time-series denoising pass a monitoring/forecasting consumer runs on
    // resampled counts. True EWMA is an order-dependent recurrence over
    // doubles (not cross-engine reproducible, and a running fold at that);
    // this is the standard truncated form — 8 lags with half-life-1
    // weights 2^-k — which windows over the TINY hourly aggregate and
    // stays in integer arithmetic until one final division: weights are
    // scaled to integers (128, 64, …, 1), the numerator and the
    // availability-normalized denominator are BIGINT sums, so both engines
    // divide the same two integers. Leading rows (fewer than 8 lags
    // available) normalize by the weights actually present.
    QueryDef(
      "q03e_ewma_hourly",
      s"""WITH $sqlGridCtes
         |SELECT hr, event_type, cnt,
         |  (${(0 to 7).map(k => s"COALESCE(lag(cnt, $k) OVER w * ${1L << (7 - k)}, 0)")
               .mkString(" + ")}) /
         |  (${(0 to 7).map(k =>
                s"CASE WHEN lag(cnt, $k) OVER w IS NOT NULL THEN ${1L << (7 - k)} ELSE 0 END")
               .mkString(" + ")}) AS ewma
         |FROM grid
         |WINDOW w AS (PARTITION BY event_type ORDER BY hr)
         |ORDER BY event_type, hr""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      val num = (0 to 7).map(k =>
        coalesce(lag(col("cnt"), k).over(w) * lit(1L << (7 - k)), lit(0L)))
        .reduce(_ + _)
      val den = (0 to 7).map(k =>
        when(lag(col("cnt"), k).over(w).isNotNull, lit(1L << (7 - k))).otherwise(lit(0L)))
        .reduce(_ + _)
      denseHourlyGrid(s, dir)
        .select(col("hr"), col("event_type"), col("cnt"), (num / den).as("ewma"))
        .orderBy("event_type", "hr")
    },

    // A2/Q04 — most visited keys, top-10 (reference
    // images/most_visited_subcategories.png); TakeOrderedAndProject, no
    // global sort. Ties broken on the key for cross-engine determinism.
    QueryDef(
      "q04_top_viewed_keys",
      s"""SELECT regexp_extract(props, '$kPatSql', 1) AS k, COUNT(*) AS cnt
         |FROM events WHERE event_type = 'view'
         |GROUP BY 1 ORDER BY cnt DESC, k LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "view")
        .groupBy(regexp_extract(col("props"), kPatScala, 1).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("k"))
        .limit(10)
    },

    // A3/Q05 — hour × event_type price stats (avg/sum/count).
    QueryDef(
      "q05_hourly_stats",
      s"""SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour, event_type,
         |${sqlAvg("value")} AS avg_value, ${sqlSum("value")} AS sum_value,
         |COUNT(*) AS cnt
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(hour(col("ts")).as("hour"), col("event_type"))
          .agg(
            davg(col("value")).as("avg_value"),
            dsum(col("value")).as("sum_value"),
            count(lit(1)).as("cnt"))
          .orderBy("hour", "event_type")
    },

    // A4/Q06 — conversion volume: events + exact distinct users per type.
    QueryDef(
      "q06_funnel_volume",
      """SELECT event_type, COUNT(*) AS n_events,
        |COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    },

    // A7/Q06b — HLL approximate distinct (the 100-TB path where exact
    // COUNT(DISTINCT) would shuffle every key). Sketch values are
    // engine-specific, so the cross-engine contract is a tolerance: the
    // output carries the exact distinct count plus a boolean flag asserting
    // the HLL estimate landed within 15% of exact (3× the default 5% rsd).
    // The oracle recomputes the exact column and expects TRUE — a drifting
    // sketch flips the flag and fails the hash.
    QueryDef(
      "q06b_approx_distinct",
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(
          col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.15).as("approx_ok"))
        .orderBy("event_type")
    },

    // A7+/Q06c — MERGEABLE sketch rollup: per-(day, type) HLL sketches of
    // user_id, unioned per type with hll_union_agg, then estimated. The
    // point vs q06b is re-aggregation WITHOUT re-scan: at 100 TB the daily
    // sketch table is the materialized rollup input, and any coarser
    // grouping (weekly, global) is a union of kilobyte sketches instead of
    // another pass over the events — the pre-aggregation contract exact
    // COUNT(DISTINCT) can never offer (distinct counts don't add).
    // Cross-engine contract mirrors q06b: exact count + a tolerance flag
    // (sketch bytes are engine-specific), plus the number of daily partials
    // merged, which DuckDB recomputes as COUNT(DISTINCT day).
    QueryDef(
      "q06c_sketch_rollup",
      """SELECT event_type, COUNT(DISTINCT CAST(ts AS DATE)) AS n_partials,
        |COUNT(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val events = Tables.events(s, dir)
      val daily = events
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val rolled = daily
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_partials"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      val exact = events
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      rolled.join(exact, Seq("event_type"))
        .select(
          col("event_type"), col("n_partials"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.15).as("approx_ok"))
        .orderBy("event_type")
    },

    // A5/Q07 — purchase conversion rate per day: distinct purchasers over
    // distinct viewers (conditional distinct aggregation, one shuffle).
    QueryDef(
      "q07_conversion_rate",
      """SELECT CAST(ts AS DATE) AS date,
        |COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS viewers,
        |COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS purchasers,
        |CASE WHEN COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) > 0
        |     THEN COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
        |          / CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS DOUBLE)
        |END AS conversion_rate
        |FROM events GROUP BY 1 ORDER BY date""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("date"))
        .agg(
          countDistinct(when(col("event_type") === "view", col("user_id"))).as("viewers"),
          countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("purchasers"))
        .withColumn(
          "conversion_rate",
          when(col("viewers") > 0, col("purchasers") / col("viewers").cast("double")))
        .orderBy("date")
    },

    // A5+/Q07b — cohort retention: users grouped by first-activity date,
    // counted by day offset of each later active day. The per-user cohort
    // frame is UNBOUNDED (one row per user), so it is NOT broadcast: the
    // join runs on user_id, the same key the cohort aggregation just
    // shuffled on, so the aggregated side's partitioning is reused and only
    // the events side shuffles once — the co-partitioned shape that holds
    // at any user count.
    QueryDef(
      "q07b_cohort_retention",
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort,
        |        CAST(CAST(e.ts AS DATE) - f.cohort AS BIGINT) AS day_offset
        |      FROM events e JOIN f USING (user_id))
        |SELECT cohort, day_offset, COUNT(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val cohorts = ev
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort"))
      ev.join(cohorts, "user_id")
        .select(col("user_id"), col("cohort"),
          datediff(to_date(col("ts")), col("cohort")).cast("long").as("day_offset"))
        .distinct()
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "day_offset")
    },

    // A5+/Q07c — RFM segmentation via broadcast quartile cutoffs: each user
    // buckets by plain comparisons against a 1-row cutoff aggregate — no
    // global ntile window shuffling every user to one reducer. The cutoffs
    // here use EXACT percentile (its merged state is per-distinct-value, so
    // at true 100 TB scale the honest cutoff source is the
    // `approx_percentile` sketch, bounded state, same bucketing shape) —
    // exact is used because the oracle must reproduce the cutoffs
    // bit-for-bit. The per-user frame is materialized once: the cutoff
    // branch and the output branch would otherwise each re-run the events
    // scan + per-user aggregation (no CSE across DataFrame branches).
    // Monetary uses the exact-decimal sum for cross-engine determinism.
    QueryDef(
      "q07c_rfm_segments",
      s"""WITH u AS (SELECT user_id,
         |    MAX(CAST(ts AS DATE)) AS last_day, COUNT(*) AS freq,
         |    ${sqlSum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS monetary
         |  FROM events GROUP BY user_id),
         |g AS (SELECT MAX(last_day) AS maxd,
         |    quantile_cont(freq, 0.25) AS f25, quantile_cont(freq, 0.5) AS f50,
         |    quantile_cont(freq, 0.75) AS f75,
         |    quantile_cont(monetary, 0.25) AS m25, quantile_cont(monetary, 0.5) AS m50,
         |    quantile_cont(monetary, 0.75) AS m75
         |  FROM u)
         |SELECT user_id,
         |  CAST(maxd - last_day AS BIGINT) AS recency_days, freq,
         |  round(monetary, 6) AS monetary,
         |  CAST(1 + (freq > f25)::INT + (freq > f50)::INT + (freq > f75)::INT AS BIGINT) AS f_bucket,
         |  CAST(1 + (monetary > m25)::INT + (monetary > m50)::INT + (monetary > m75)::INT AS BIGINT) AS m_bucket
         |FROM u CROSS JOIN g ORDER BY user_id""".stripMargin) { (s, dir) =>
      val u = Materialize(s, dir, "q07c_u")(
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            max(to_date(col("ts"))).as("last_day"),
            count(lit(1)).as("freq"),
            dsum(when(col("event_type") === "purchase", col("value")).otherwise(0.0))
              .as("monetary")))
      val g = u.agg(
        max(col("last_day")).as("maxd"),
        expr("percentile(freq, 0.25)").as("f25"),
        expr("percentile(freq, 0.5)").as("f50"),
        expr("percentile(freq, 0.75)").as("f75"),
        expr("percentile(monetary, 0.25)").as("m25"),
        expr("percentile(monetary, 0.5)").as("m50"),
        expr("percentile(monetary, 0.75)").as("m75"))
      def bucket(c: Column, c25: Column, c50: Column, c75: Column): Column =
        (lit(1) + (c > c25).cast("int") + (c > c50).cast("int") + (c > c75).cast("int"))
          .cast("long")
      u.crossJoin(broadcast(g))
        .select(
          col("user_id"),
          datediff(col("maxd"), col("last_day")).cast("long").as("recency_days"),
          col("freq"),
          round(col("monetary"), 6).as("monetary"),
          bucket(col("freq"), col("f25"), col("f50"), col("f75")).as("f_bucket"),
          bucket(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_bucket"))
        .orderBy("user_id")
    },

    // A6/Q08 — rollup over (date, event_type): subtotal + grand-total rows.
    QueryDef(
      "q08_rollup_counts",
      """SELECT CAST(ts AS DATE) AS date, event_type, COUNT(*) AS cnt
        |FROM events GROUP BY ROLLUP(date, event_type)
        |ORDER BY date NULLS FIRST, event_type NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .rollup(to_date(col("ts")).as("date"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("date").asc_nulls_first, col("event_type").asc_nulls_first)
    },

    // A6/Q08b — cube over (dow, event_type) with GROUPING() markers: all
    // four grouping combinations in one pass (Expand + single hash agg).
    QueryDef(
      "q08b_cube_counts",
      """SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow, event_type,
        |CAST(GROUPING(CAST(dayofweek(ts) + 1 AS INTEGER)) AS INTEGER) AS g_dow,
        |CAST(GROUPING(event_type) AS INTEGER) AS g_type, COUNT(*) AS cnt
        |FROM events GROUP BY CUBE(dow, event_type)
        |ORDER BY g_dow, g_type, dow NULLS FIRST, event_type NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("dow", dayofweek(col("ts")))
          .cube(col("dow"), col("event_type"))
          .agg(
            grouping(col("dow")).cast("int").as("g_dow"),
            grouping(col("event_type")).cast("int").as("g_type"),
            count(lit(1)).as("cnt"))
          .select(col("dow"), col("event_type"), col("g_dow"), col("g_type"), col("cnt"))
          .orderBy(col("g_dow"), col("g_type"),
            col("dow").asc_nulls_first, col("event_type").asc_nulls_first)
    },

    // Q56 — k-anonymity small-cell suppression (the aggregate-release gate
    // a training-data or analytics export runs before publishing grouped
    // stats): per (event_type, day, hour) cell, release distinct-user and
    // event counts only where the cell covers ≥ K distinct users; all
    // sub-K cells fold into ONE residual row per event_type whose distinct
    // count is re-derived EXACTLY from the raw events of those cells (a
    // sum of per-cell distincts would double-count users spanning cells),
    // and the residual itself is complementarily suppressed (user count
    // masked NULL) if it still covers < K users. Scale shape: one
    // distinct+count aggregation over the cell key; the sub-K cell list is
    // small BY CONSTRUCTION (each names < K users — that is what makes it
    // suppressible) and broadcasts into the residual semi-join, so the
    // second pass touches only suppressed cells' events; no driver state.
    QueryDef(
      "q56_kanon_release",
      s"""WITH ev AS (SELECT event_type,
         |  CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, user_id FROM events),
         |g AS (SELECT event_type, day, hr, COUNT(DISTINCT user_id) AS n_users,
         |             COUNT(*) AS n_events
         |      FROM ev GROUP BY event_type, day, hr),
         |keep AS (SELECT * FROM g WHERE n_users >= $KAnonK),
         |supp AS (SELECT event_type, day, hr FROM g WHERE n_users < $KAnonK),
         |resid AS (SELECT e.event_type, COUNT(DISTINCT e.user_id) AS u,
         |                 COUNT(*) AS n_events
         |  FROM ev e WHERE EXISTS (SELECT 1 FROM supp s
         |    WHERE s.event_type = e.event_type AND s.day = e.day AND s.hr = e.hr)
         |  GROUP BY e.event_type)
         |SELECT event_type, day, hr, n_users, n_events FROM keep
         |UNION ALL
         |SELECT event_type, '__suppressed__' AS day, -1 AS hr,
         |  CASE WHEN u >= $KAnonK THEN u END AS n_users, n_events FROM resid
         |ORDER BY event_type, day, hr""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"),
        to_date(col("ts")).cast("string").as("day"),
        hour(col("ts")).as("hr"), col("user_id"))
      val g = ev.groupBy(col("event_type"), col("day"), col("hr"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
      val keep = g.filter(col("n_users") >= KAnonK)
      val supp = g.filter(col("n_users") < KAnonK)
        .select(col("event_type"), col("day"), col("hr"))
      val resid = ev
        .join(broadcast(supp), Seq("event_type", "day", "hr"), "left_semi")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n_events"))
        .select(col("event_type"), lit("__suppressed__").as("day"),
          lit(-1).as("hr"),
          when(col("u") >= KAnonK, col("u")).otherwise(lit(null).cast("long"))
            .as("n_users"),
          col("n_events"))
      keep.unionByName(resid).orderBy("event_type", "day", "hr")
    }
  )
}
