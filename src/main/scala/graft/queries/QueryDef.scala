package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: a DataFrame program plus (when SQL-expressible)
  * the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  * Column names/aliases MUST match between the two forms — the driver's
  * compare sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    df: (SparkSession, String) => DataFrame,
    sql: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(df: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, df, Some(sql))
  def noOracle(name: String)(df: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, df, None)
}

/** Cross-engine determinism helpers.
  *
  * Floating-point SUM is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's — so any double SUM that feeds a
  * hash-compare goes through an exact decimal accumulator instead:
  * cast-to-decimal is deterministic (no representable tie at 6 fractional
  * digits), decimal addition is exact/associative, and the final cast back to
  * double is a single deterministic conversion. AVG likewise is computed as
  * exact-decimal SUM divided by COUNT (both engines do the division in
  * double, on identical inputs).
  */
object Det {
  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Order-independent mean of a double column, returned as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL fragment equivalents (DuckDB side). */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
