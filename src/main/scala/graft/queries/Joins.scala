package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join coverage (SURVEY.md §2.4 J1–J7). The reference never joins two
  * datasets (its analyses imply BigQuery-side joins); declared here over the
  * TPC-H-ish testdata for capability parity.
  *
  * Scale notes baked into the shapes:
  *  - dims (part/customer/nation/region/supplier) are explicitly
  *    `broadcast()` — at 100 TB the fact side never shuffles for these.
  *  - the "range join" is keyed on user_id first (shuffle/SMJ on the equi
  *    key, range as a post-filter) — never a nested-loop over the fact table.
  *  - the as-of join is the union+window pattern (one shuffle on user_id),
  *    not a per-row lookup.
  */
object Joins {
  import Det._

  /** One statement, both engines (ANSI subset both parse) — see Q39. */
  private val Q39Sql =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT COUNT(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_finished
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // J1/Q09 — broadcast hash equi-join: fact ⋈ small dim.
    QueryDef(
      "q09_brand_revenue",
      s"""SELECT p_brand, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY p_brand""".stripMargin) { (s, dir) =>
      // measured round 16: a gated scan spread bought ~0.1 s here and
      // contradicts the J1 exemplar (the fact side never shuffles for a
      // broadcast-dim join) — left narrow deliberately
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },

    // J2/Q10 — multi-way join chain; the only big-big join is
    // lineitem ⋈ orders (SMJ/shuffled-hash on orderkey), everything after is
    // broadcast. Lineitem is pre-aggregated to ORDER grain before that join:
    // the one big shuffle now moves one row per order (partial agg combines
    // map-side) instead of every lineitem row, the join inherits the
    // pre-agg's hash partitioning on the key so only orders re-shuffles,
    // and countDistinct(o_orderkey) degenerates to count(*) — no Expand
    // pass in the final aggregate. Decimal sums are associative, so the
    // two-level sum is bit-identical to the single-level one.
    QueryDef(
      "q10_region_revenue",
      s"""SELECT r_name, n_name, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |COUNT(DISTINCT o_orderkey) AS n_orders
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      // spread keyed on l_orderkey: the pre-agg below reuses the exact
      // partitioning (same key, same count), so this costs no extra
      // exchange beyond the scale-gated scan spread itself (guide §2.4)
      val orderRev = Spread(Tables.lineitem(s, dir), col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,6)")).as("order_rev"))
      orderRev
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(col("order_rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    },

    // J3/Q11 — left outer join keeping order-less customers.
    QueryDef(
      "q11_customer_orders",
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         |COALESCE(${sqlSum("o_totalprice")}, 0.0) AS total_spend
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey")
    },

    // J4+J5/Q12 — left-semi (viewers who purchased) and left-anti (viewers
    // who never purchased), labeled and unioned.
    QueryDef(
      "q12_semi_anti_funnel",
      """WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT 'converted' AS segment, user_id FROM v
        |WHERE EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id)
        |UNION ALL
        |SELECT 'view_only' AS segment, user_id FROM v
        |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id)
        |ORDER BY segment, user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val v = ev.filter(col("event_type") === "view").select("user_id").distinct()
      val p = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      v.join(p, Seq("user_id"), "left_semi").select(lit("converted").as("segment"), col("user_id"))
        .unionAll(
          v.join(p, Seq("user_id"), "left_anti")
            .select(lit("view_only").as("segment"), col("user_id")))
        .orderBy("segment", "user_id")
    },

    // J6/Q13 — range join, keyed: events within 1h after each signup of the
    // same user. Equi-join on user_id carries the shuffle; the time range is
    // a cheap post-filter (the scalable alternative to a nested-loop theta
    // join).
    QueryDef(
      "q13_signup_followup",
      """SELECT b.user_id AS user_id, b.event_id AS signup_event,
        |COUNT(a.event_id) AS n_follow
        |FROM (SELECT * FROM events WHERE event_type = 'signup') b
        |LEFT JOIN events a ON a.user_id = b.user_id
        |  AND a.ts > b.ts AND a.ts <= b.ts + INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY user_id, signup_event""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val b = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_event"), col("ts").as("b_ts"))
      val a = ev.select(
        col("user_id").as("a_user"), col("event_id").as("a_event"), col("ts").as("a_ts"))
      b.join(
          a,
          col("a_user") === col("user_id") &&
            col("a_ts") > col("b_ts") &&
            col("a_ts") <= col("b_ts") + expr("INTERVAL 1 HOUR"),
          "left")
        .groupBy(col("user_id"), col("signup_event"))
        .agg(count(col("a_event")).as("n_follow"))
        .orderBy("user_id", "signup_event")
    },

    // J7/Q13b — as-of join via the union+window pattern: for each purchase,
    // the most recent prior view of the same user. One shuffle on user_id,
    // no nested loop; `max` over an ordered prefix of views ≡ "latest ≤ t".
    QueryDef(
      "q13b_asof_prior_view",
      """SELECT event_id, user_id, ts, prior_view_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |  max(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("prior_view_ts", max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "prior_view_ts")
        .orderBy("user_id", "event_id")
    },

    // Q39 — the SQL surface + subquery decorrelation: correlated EXISTS /
    // NOT EXISTS and two correlated scalar COUNT subqueries, submitted as
    // SQL TEXT through `spark.sql` over registered views (the engine's
    // second API). A naive engine executes a per-row subquery loop
    // (quadratic, driver-bound); Catalyst decorrelates every form into
    // joins — EXISTS → left-semi, NOT EXISTS → left-anti, scalar COUNT →
    // aggregate + left-outer with the empty-group 0 fixup — so the plan is
    // four shuffled/broadcast joins that scale like q10-q12. The identical
    // statement runs on DuckDB, which does its own unnesting: one SQL
    // string, two optimizers, same rows. PlanSpec pins the decorrelated
    // shape (no per-row subquery nodes in the physical plan).
    QueryDef("q39_sql_subqueries", Q39Sql) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(Q39Sql)
    }
  )
}
