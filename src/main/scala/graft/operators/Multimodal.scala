package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §2.11 X5): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature
  * extraction as partition-local typed operators.
  *
  * The media decode itself is a STUB — the container has no codec
  * libraries — implemented as a deterministic fake that parses the
  * synthetic header this module writes. Everything around it is the real
  * Spark shape a production pipeline needs and is what the tests exercise:
  *   - media rows as a typed `Dataset[MediaFile]` with a `binary` payload
  *     column and a metadata struct (schema survives parquet round-trip);
  *   - decode/feature-extract via `mapPartitions` so any native library
  *     would be initialized once per partition, not once per row (the same
  *     batching contract `mapInPandas` gives a Python pipeline);
  *   - frame sampling as a pure function of the payload bytes, emitting a
  *     bounded per-row result (no driver collect anywhere).
  * At 100 TB the payload column dominates storage: partition by kind/date,
  * keep metadata in a sidecar projection so pruning-friendly scans never
  * touch the bytes unless the query needs them.
  */
object Multimodal {

  /** Typed media row: opaque payload + declared kind + source id. */
  final case class MediaFile(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features (stub): header-derived dimensions + sampled frames. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      n_frames: Int,
      checksum: Long)

  val Kinds = Seq("image", "audio", "video")

  /** Bytes per synthetic "frame" for the frame-sampling stub. */
  val FrameBytes = 64

  /** Synthesize a media table from the `documents` table: payload is the
    * UTF-8 text prefixed by an 8-byte header `[kind_tag, w, h, 0]×2` derived
    * deterministically from doc_id. Stands in for real image/audio bytes. */
  def synthesize(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val kind = Kinds((id % Kinds.size).toInt)
      val w = (32 + (id % 8) * 16).toByte
      val h = (32 + (id % 5) * 16).toByte
      val header = Array[Byte]((id % Kinds.size).toByte, w, h, 0, (id % Kinds.size).toByte, w, h, 0)
      MediaFile(id, kind, header ++ text.getBytes("UTF-8"))
    }
  }

  /** STUB resize: rewrites the header to the target dimensions and
    * downsamples the body by the linear scale factor (every k-th byte). A
    * real implementation would decode → scale → re-encode; the contract —
    * pure per-row function, output strictly smaller, metadata updated in
    * lockstep with the payload — is what downstream operators rely on. */
  def resizeStub(media: Dataset[MediaFile], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    media.map { m =>
      val header = m.payload.take(8)
      val w = if (header.length > 1) header(1) & 0xff else targetW
      val step = math.max(1, w / math.max(targetW, 1))
      val body = m.payload.drop(8)
      val sampled = Array.range(0, body.length, step).map(body)
      val newHeader = header.clone()
      if (newHeader.length > 2) {
        newHeader(1) = targetW.toByte
        newHeader(2) = targetH.toByte
      }
      // the mirrored second half exists only in full 8-byte headers — a
      // 3-6-byte payload must not index past its own length
      if (newHeader.length > 6) {
        newHeader(5) = targetW.toByte
        newHeader(6) = targetH.toByte
      }
      m.copy(payload = newHeader ++ sampled)
    }
  }

  /** STUB decode + feature extraction. A real implementation would hand the
    * payload to a codec here; the partition-local loop and the output
    * contract are the real thing. */
  def decodeFeatures(media: Dataset[MediaFile])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init site (codec/lib handles would be created here)
      rows.map { m =>
        val header = m.payload.take(8)
        val width = if (header.length > 1) header(1) & 0xff else 0
        val height = if (header.length > 2) header(2) & 0xff else 0
        val body = m.payload.drop(8)
        val nFrames = (body.length + FrameBytes - 1) / FrameBytes
        // deterministic fake checksum over every FrameBytes-th byte
        var sum = 0L
        var i = 0
        while (i < body.length) { sum = (sum * 31 + (body(i) & 0xff)) % 1000000007L; i += FrameBytes }
        MediaFeatures(m.media_id, m.kind, width, height, m.payload.length.toLong, nFrames, sum)
      }
    }
  }
}
