package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY.md §2) is exposed here as a named query;
  * each SQL-expressible one also carries the ANSI SQL the DuckDB oracle runs
  * against the same parquet tables. Aliases match on both sides (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** All declared queries, in registry form. */
  val all: Seq[QueryDef] =
    IngestParity.defs ++ Analytics.defs ++ ReshapeQueries.defs ++
      BehaviorQueries.defs ++ Joins.defs ++ Windows.defs ++
      SetsAndScalars.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      TextAnalysisQueries.defs ++ CurationQueries.defs ++ QualityQueries.defs ++
      MultimodalQueries.defs ++ StreamingQueries.defs ++ ScaleQueries.defs ++
      CurationPipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Works on any session: the confs the testdata requires (nanos
    * timestamps, UTC) are dynamic and set here defensively. */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    all.head.df(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.df).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
