package graft.queries

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Q28 — the skew-mitigation operators run through the driver's oracle gate
  * (SURVEY.md §0 scale stance; `operators/Skew.scala`): salting changes the
  * physical shuffle layout, never the result, so the oracle is the plain
  * unsalted SQL. `ScaleOpsSpec` separately pins the plan-level properties
  * (deterministic salts, partial-state spread); these queries pin the
  * result equivalence end-to-end against DuckDB.
  */
object ScaleQueries {

  val defs: Seq[QueryDef] = Seq(
    // Salted two-stage aggregation: per-user counts where one hot user
    // would otherwise bottleneck a single reducer's partial state. Stage 1
    // aggregates per (key, salt) across 8 salts, stage 2 merges — the
    // result is the plain GROUP BY.
    QueryDef(
      "q28_salted_user_topk",
      """SELECT user_id, COUNT(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin) { (s, dir) =>
      Skew.saltedCount(Tables.events(s, dir), col("user_id"), salts = 8)
        .select(col("key").as("user_id"), col("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(20)
    },

    // Salted replicate-join: the dimension is replicated once per salt and
    // the fact side salts deterministically from its unique id, spreading a
    // hot key over 8 reducers. Result equals the plain equi-join.
    QueryDef(
      "q28b_salted_join_counts",
      """SELECT n_name, COUNT(*) AS cnt
        |FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      val big = Tables.events(s, dir).withColumn("nk", col("user_id") % 25)
      Skew.saltedJoin(big, Tables.nation(s, dir),
          bigKey = "nk", smallKey = "n_nationkey", bigUnique = "event_id", salts = 8)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("n_name")
    },

    // Q38 — z-order layout stats: the multi-dimensional clustering key
    // behind data-skipping file layouts (Delta/Iceberg OPTIMIZE ZORDER).
    // Interleaving the bits of (user bucket, hour-of-day) gives a 1-D sort
    // key whose consecutive blocks cover small RECTANGLES of the 2-D key
    // space, so per-file min/max stats prune scans filtered on EITHER
    // dimension; insertion order ("rowid" blocks of the same cardinality)
    // covers the full domain per block and prunes nothing. The query emits
    // both layouts' per-block (count, min/max per dim, bounding-box area)
    // so the skipping win is directly visible in the output — at 100 TB
    // "block" is the file produced by repartitionByRange(zkey) +
    // sortWithinPartitions(zkey), and these stats are the footer stats the
    // scan planner prunes on. Pure integer bit arithmetic on both engines.
    QueryDef(
      "q38_zorder_stats",
      s"""WITH pts AS (SELECT event_id, user_id % 64 AS x,
         |  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y FROM events),
         |z AS (SELECT x, y, ${sqlZInterleave("x", "y", 6)} AS zval FROM pts),
         |zb AS (SELECT 'zorder' AS layout, zval >> 6 AS block, COUNT(*) AS cnt,
         |       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
         |       FROM z GROUP BY block),
         |rb AS (SELECT 'rowid' AS layout, event_id >> 8 AS block, COUNT(*) AS cnt,
         |       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
         |       FROM pts GROUP BY block)
         |SELECT layout, block, cnt, x_min, x_max, y_min, y_max,
         |  (x_max - x_min + 1) * (y_max - y_min + 1) AS bbox_area
         |FROM (SELECT * FROM zb UNION ALL SELECT * FROM rb)
         |ORDER BY layout, block""".stripMargin) { (s, dir) =>
      val pts = Tables.events(s, dir)
        .select(col("event_id"), (col("user_id") % 64).as("x"),
          hour(col("ts")).cast("long").as("y"))
      def stats(df: org.apache.spark.sql.DataFrame, layout: String,
                block: org.apache.spark.sql.Column) =
        df.groupBy(block.as("block"))
          .agg(count(lit(1)).as("cnt"),
            min(col("x")).as("x_min"), max(col("x")).as("x_max"),
            min(col("y")).as("y_min"), max(col("y")).as("y_max"))
          .select(lit(layout).as("layout"), col("block"), col("cnt"),
            col("x_min"), col("x_max"), col("y_min"), col("y_max"))
      val zb = stats(pts.withColumn("zval", zInterleave(col("x"), col("y"), 6)),
        "zorder", shiftright(col("zval"), 6))
      val rb = stats(pts, "rowid", shiftright(col("event_id"), 8))
      zb.unionByName(rb)
        .withColumn("bbox_area",
          (col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1))
        .orderBy("layout", "block")
    },

    // Q41 — Hive-partitioned layout + partition-pruned scan: events laid
    // out one directory per day (`d=2024-01-XX/`), then read back with a
    // one-week partition-column filter. The filter resolves against
    // DIRECTORY NAMES at planning time — the other ~23 days are never
    // listed, opened, or scanned (PlanSpec pins partitionFilters + the
    // pruned partition count). This is the first-line skipping mechanism
    // of every date-partitioned 100 TB lake: a day's query touches a day's
    // files, independent of total table size. The oracle filters the flat
    // table — pruning changes I/O, never results.
    QueryDef(
      "q41_partition_pruned_scan",
      s"""SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS cnt,
         |  ${Det.sqlSum("value")} AS val_sum
         |FROM events
         |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
         |GROUP BY d, event_type ORDER BY d, event_type""".stripMargin) { (s, dir) =>
      prunedWeek(s, dir)
        .groupBy(col("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("val_sum"))
        .orderBy("d", "event_type")
    }
  )

  /** The date-partitioned events table (one dir per day, written once per
    * session) filtered to one week on the partition column — the frame
    * whose scan PlanSpec asserts is partition-pruned. */
  private[graft] def prunedWeek(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame =
    Materialize.partitioned(s, dir, "events_by_day", Seq("d"))(
      Tables.events(s, dir).withColumn("d", to_date(col("ts"))))
      .filter(col("d").between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))

  /** Bit-interleaved z-value of two non-negative ints: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1 — generated identically as a
    * Column tree and as the DuckDB SQL fragment. */
  private def zInterleave(x: org.apache.spark.sql.Column,
                          y: org.apache.spark.sql.Column, bits: Int) =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private def sqlZInterleave(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
}
