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
    }
  )
}
