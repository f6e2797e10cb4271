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

  /** q38b file-stat model: estimated bytes per row, and the compaction
    * target size each output bin packs toward. */
  private val RowBytes = 64L
  private val TargetBytes = 16384L

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

    // Q38b — compaction planning (the OPTIMIZE/bin-packing step of every
    // lakehouse maintenance loop): given per-file stats — here one
    // micro-file per (day, hour) with an estimated byte size — assign
    // files to target-sized compaction bins WITHOUT crossing the day
    // partition (compaction never merges across partitions). The rule is
    // a per-day exclusive prefix sum over file order, floor-divided by the
    // target size — deterministic integers, no greedy driver loop. Scale
    // shape: the planner's real input at 100 TB is the table's FILE-STATS
    // log (metadata scale, like a Delta add-file log), so everything after
    // the one stats aggregate runs on a frame with one row per file; the
    // per-day planning window is bounded by files-per-partition, never
    // corpus size. The same prefix-sum shape as q25o's sequence packing,
    // re-expressed at the storage-layout layer.
    QueryDef(
      "q38b_compaction_plan",
      s"""WITH f AS (SELECT CAST(ts AS DATE) AS d,
         |  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) * $RowBytes AS BIGINT) AS est_bytes
         |  FROM events GROUP BY d, h),
         |c AS (SELECT d, h, n_rows, est_bytes,
         |  CAST(COALESCE(SUM(est_bytes) OVER (PARTITION BY d ORDER BY h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_excl
         |  FROM f)
         |SELECT d, h, n_rows, est_bytes, cum_excl // $TargetBytes AS bin
         |FROM c ORDER BY d, h""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("est_bytes", col("n_rows") * RowBytes)
      f.withColumn("cum_excl",
          coalesce(
            sum(col("est_bytes")).over(
              Window.partitionBy(col("d")).orderBy(col("h"))
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select(col("d"), col("h"), col("n_rows"), col("est_bytes"),
          expr(s"cum_excl DIV $TargetBytes").as("bin"))
        .orderBy("d", "h")
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
    },

    // Q41b — DYNAMIC partition pruning: the second half of q41's skipping
    // story. Here the day filter is not a literal on the fact table but a
    // predicate on a JOINED dimension (a calendar dim filtered to "audit
    // days"), so static pruning can't see it — Spark's PartitionPruning
    // rule instead injects a runtime subquery filter
    // (`dynamicpruningexpression` in the scan's partitionFilters, pinned in
    // PlanSpec) that evaluates the dim's surviving join keys first (reusing
    // the join's broadcast) and prunes the fact scan to those directories
    // at execution time. At 100 TB this is how `fact JOIN dim WHERE
    // dim.attr = X` touches only the qualifying day-directories without the
    // user hand-copying the dim predicate onto the partition column.
    QueryDef(
      "q41b_dynamic_partition_pruning",
      s"""WITH cal AS (
         |  SELECT CAST(DATE '2024-01-01' + i * INTERVAL 1 DAY AS DATE) AS d
         |  FROM generate_series(0, 90) t(i)
         |  WHERE i % 10 = 2)
         |SELECT e.d, event_type, COUNT(*) AS cnt, ${Det.sqlSum("value")} AS val_sum
         |FROM (SELECT CAST(ts AS DATE) AS d, event_type, value FROM events) e
         |JOIN cal ON e.d = cal.d
         |GROUP BY e.d, event_type ORDER BY e.d, event_type""".stripMargin) { (s, dir) =>
      dppJoinFrame(s, dir)
        .groupBy(col("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Det.dsum(col("value")).as("val_sum"))
        .orderBy("d", "event_type")
    },

    // Q43 — runtime (Bloom) filter join: DPP's sibling for NON-partition
    // join keys. A selectively filtered orders month joins lineitem on
    // o_orderkey; Spark's InjectRuntimeFilter builds a Bloom filter over
    // the filtered orders keys as a subquery and applies
    // `might_contain(...)` to the lineitem side BEFORE its shuffle — at
    // 100 TB the big side drops ~98.6% of its rows pre-exchange instead of
    // shuffling the full table into the join. The harness-scale thresholds
    // (the application-side floor targets multi-GB scans; broadcast is
    // disabled because a 20 MB dim would broadcast here but a 100-TB
    // run's dim side would not) are set ONLY while the plan is built and
    // executed into the materialized result; PlanSpec pins the injected
    // filter. Bench note: cold pass pays the build, warm reads the
    // materialization (same pattern as q23h/q25k).
    QueryDef(
      "q43_runtime_bloom_join",
      s"""SELECT o.o_orderpriority, COUNT(*) AS cnt,
         |  ${Det.sqlSum("l.l_extendedprice")} AS price_sum
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderdate >= DATE '1996-03-01'
         |  AND o.o_orderdate < DATE '1996-04-01'
         |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      withBloomConfs(s) {
        Materialize(s, dir, "q43_bloom")(
          bloomJoinFrame(s, dir)
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("cnt"),
              Det.dsum(col("l_extendedprice")).as("price_sum")))
      }.orderBy("o_orderpriority")
    }
  )

  /** The date-partitioned events table (one dir per day, written once per
    * session; partition-column type inference reads `d` back as DATE). */
  private[graft] def eventsByDay(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame =
    Materialize.partitioned(s, dir, "events_by_day", Seq("d"))(
      Tables.events(s, dir).withColumn("d", to_date(col("ts"))))

  /** [[eventsByDay]] filtered to one week on the partition column — the
    * frame whose scan PlanSpec asserts is statically partition-pruned. */
  private[graft] def prunedWeek(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame =
    eventsByDay(s, dir)
      .filter(col("d").between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))

  /** The q41b join before aggregation: partitioned fact ⋈ filtered calendar
    * dim. The dim is a 91-day generated calendar (the kind of tiny attribute
    * table that lives beside any date-partitioned lake) filtered on an
    * attribute the fact side can't see statically; exposed so PlanSpec can
    * assert the `dynamicpruningexpression` lands in the fact scan's
    * partitionFilters. */
  private[graft] def dppJoinFrame(s: org.apache.spark.sql.SparkSession,
                                  dir: String): org.apache.spark.sql.DataFrame = {
    // the dim predicate is on the dim's OWN attribute (`id`, the row's
    // ordinal — think "audit-cycle slot"), not an expression of the join
    // key: a filter phrased on `d` itself would be constraint-propagated
    // through the equi-join and statically pruned, leaving DPP nothing to
    // do. Filtering on `id` keeps the surviving day set invisible until
    // the dim is evaluated — the case DPP exists for.
    val cal = s.range(91)
      .filter(col("id") % 10 === 2)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("d"))
    eventsByDay(s, dir).join(cal, Seq("d"))
      .select(col("d"), col("event_type"), col("value"))
  }

  /** The q43 join before aggregation (filtered orders month ⋈ lineitem on
    * the order key), exposed for PlanSpec's runtime-filter pin. */
  private[graft] def bloomJoinFrame(s: org.apache.spark.sql.SparkSession,
                                    dir: String): org.apache.spark.sql.DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
  }

  /** Run `f` (plan construction AND execution — callers materialize inside)
    * under the runtime-Bloom-filter confs, restoring the session's settings
    * after. The defaults gate injection on a multi-GB application-side scan
    * and prefer broadcast for a dim this small — both right for production,
    * both masking the mechanism at harness scale. */
  private[graft] def withBloomConfs[T](s: org.apache.spark.sql.SparkSession)(f: => T): T =
    graft.Confs.withConfs(s,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")(f)

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
