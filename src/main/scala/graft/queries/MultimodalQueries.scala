package graft.queries

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Q26 — multimodal binary-column queries (SURVEY.md §2.11 X5). The payload
  * bytes stay opaque: queries touch only typed metadata and cheap byte-level
  * arithmetic, the layout that keeps 100 TB of media scannable (metadata
  * projection never reads the payload column in parquet).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    // X5/Q26 — binary payload + typed metadata, SQL-expressible slice:
    // byte length, frame count at 64 B/frame, kind tag from id.
    QueryDef(
      "q26_multimodal_meta",
      s"""SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  octet_length(encode(text)) AS n_bytes,
         |  CAST(ceil(octet_length(encode(text)) / ${Multimodal.FrameBytes}.0) AS BIGINT) AS n_frames,
         |  ascii(substring(text, 1, 1)) AS head_byte
         |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        element_at(
          array(Multimodal.Kinds.map(lit): _*),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        ceil(length(col("text").cast("binary")) / lit(Multimodal.FrameBytes.toDouble))
          .cast("long").as("n_frames"),
        ascii(substring(col("text"), 1, 1)).as("head_byte"))
        .orderBy("media_id")
    },

    // X5/Q26b — the typed decode pipeline (synthesize → mapPartitions
    // decode stub → features). No SQL form — the payload header parse is
    // partition-local Scala — so the driver records a rows-only check; the
    // ScalaTest spec pins exact values.
    QueryDef.noOracle("q26b_media_features") { (s, dir) =>
      implicit val spark = s
      Multimodal.decodeFeatures(Multimodal.synthesize(Tables.documents(s, dir)))
        .toDF()
        .orderBy("media_id")
    }
  )
}
