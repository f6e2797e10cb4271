package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** The reference's e-commerce event source (SURVEY.md §1.2, §2.1 S1/S2/S8):
  * declared 9-column schema, CSV scan, typed rows, and table DDL.
  *
  * The reference reads the Kaggle clickstream CSV in 100-row pandas chunks
  * and round-trips each chunk through a local Spark context
  * (batch_pipeline/write_session_batch.py:133-175). Here the scan is a
  * single declarative `spark.read.csv` with an explicit schema — Spark's
  * input-split batching replaces driver-side chunking, the schema is never
  * inferred (SURVEY.md §1.5), and the scan parallelizes per split at any
  * scale. */
object Ecommerce {

  /** One clickstream event, typed (SURVEY.md §1.6). `event_time` stays a
    * string at the edge — the wire format carries a ` UTC` suffix the
    * ingest transform strips (operators.EcommerceOps.normalizeEventTime). */
  final case class Event(
      event_time: String,
      event_type: String,
      product_id: String,
      category_id: String,
      category_code: String,
      brand: String,
      price: Double,
      user_id: String,
      user_session: String)

  /** Declared source schema (write_session_batch.py:150-160; Spanner DDL
    * write_session_batch.py:67-78; BigQuery schema
    * write_session_stream.py:81-98). */
  val schema: StructType = StructType(Seq(
    StructField("event_time", StringType),
    StructField("event_type", StringType),
    StructField("product_id", StringType),
    StructField("category_id", StringType),
    StructField("category_code", StringType),
    StructField("brand", StringType),
    StructField("price", DoubleType),
    StructField("user_id", StringType),
    StructField("user_session", StringType)))

  /** S1 — bounded CSV scan with the declared schema (never inferred). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Typed view of the scan. */
  def readCsvTyped(spark: SparkSession, path: String): Dataset[Event] = {
    import spark.implicits._
    readCsv(spark, path).as[Event]
  }

  /** S8 — table DDL: the engine's analogue of the reference's Spanner
    * `CREATE TABLE events_batch` (write_session_batch.py:61-88), as a
    * parquet-backed SQL table so `spark.sql("SELECT ... FROM <name>")`
    * works against it. */
  def createEventsTable(spark: SparkSession, name: String, location: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name (
         |  event_time STRING, event_type STRING, product_id STRING,
         |  category_id STRING, category_code STRING, brand STRING,
         |  price DOUBLE, user_id STRING, user_session STRING,
         |  record_id BIGINT)
         |USING parquet LOCATION '$location'""".stripMargin)
}
