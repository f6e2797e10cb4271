package graft.queries

import graft.functions.TextHash
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
    // decode stub → features). The synthetic payload is fully derivable in
    // SQL — header bytes are pure functions of doc_id, the body is the
    // UTF-8 text — so the oracle rebuilds every feature, including the
    // rolling stride-64 checksum (bytes reconstructed bit-by-bit: DuckDB
    // 1.0 has no blob byte indexing, but get_bit + list_reduce fold the
    // same (acc*31 + byte) % 1e9+7 recurrence).
    QueryDef(
      "q26b_media_features",
      s"""WITH b AS (SELECT doc_id, encode(text) AS body,
         |            octet_length(encode(text)) AS nb FROM documents)
         |SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(32 + (doc_id % 8) * 16 AS BIGINT) AS width,
         |  CAST(32 + (doc_id % 5) * 16 AS BIGINT) AS height,
         |  CAST(nb + 8 AS BIGINT) AS n_bytes,
         |  CAST((nb + ${Multimodal.FrameBytes - 1}) // ${Multimodal.FrameBytes} AS BIGINT) AS n_frames,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(0, nb - 1, ${Multimodal.FrameBytes}),
         |        p -> CAST(list_sum(list_transform(generate_series(0, 7),
         |               bb -> get_bit(body::BIT, (p*8 + bb)::INTEGER)
         |                     * CAST(power(2, 7 - bb) AS BIGINT))) AS BIGINT))),
         |    (a, x) -> (a * 31 + x) % 1000000007) AS checksum
         |FROM b ORDER BY media_id""".stripMargin) { (s, dir) =>
      implicit val spark = s
      Multimodal.decodeFeatures(Multimodal.synthesize(Tables.documents(s, dir)))
        .toDF()
        .select(
          col("media_id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_bytes"),
          col("n_frames").cast("long").as("n_frames"),
          col("checksum"))
        .orderBy("media_id")
    },

    // X5+/Q26c — media near-dup by frame fingerprints: chunk each payload
    // body into fixed 64-byte "frames", fingerprint each frame, and pair
    // media sharing frames — the chunk-hash dedup a video/image pipeline
    // runs where text dedup runs MinHash. Shape at 100 TB: fingerprints
    // ride the scan (per-row expression), the pair producer is a blocked
    // EQUI-join on the frame hash (never all-pairs), shared-frame counts
    // are one hash agg, and set sizes join back on media_id — all linear;
    // a heavy-hitter frame (e.g. an all-black frame) is AQE's skew-join
    // case, same as a hot LSH bucket. Fixed-size chunking is
    // shift-sensitive (an insertion re-aligns every later frame) — the
    // production upgrade is content-defined boundaries via the rolling
    // hash in `TextHash.fingerprint`, same plan shape. Framing is by
    // 64-CHARACTER window on both engines (== 64 bytes on the ASCII
    // corpus): Spark's substr and DuckDB's substring both slice by
    // character and md5 both hash the slice's UTF-8 bytes, so the
    // fingerprints agree byte-exactly on ANY corpus, multibyte included
    // (pinned on a multibyte fixture — see FIXTURES.md).
    QueryDef(
      "q26c_frame_neardup",
      s"""WITH f AS (SELECT doc_id AS media_id,
         |  list_distinct(list_transform(generate_series(1, length(text), 64),
         |    p -> ${TextHash.sqlHash32("substring(text, p, 64)")})) AS fps
         |  FROM documents),
         |s AS (SELECT media_id, len(fps) AS nf FROM f),
         |e AS (SELECT media_id, unnest(fps) AS fp FROM f),
         |p AS (SELECT a.media_id AS media_a, b.media_id AS media_b, COUNT(*) AS shared
         |      FROM e a JOIN e b ON a.fp = b.fp AND a.media_id < b.media_id
         |      GROUP BY 1, 2)
         |SELECT media_a, media_b, shared, sa.nf AS nf_a, sb.nf AS nf_b,
         |  shared / (sa.nf + sb.nf - shared) AS frame_jaccard
         |FROM p JOIN s sa ON sa.media_id = media_a
         |       JOIN s sb ON sb.media_id = media_b
         |WHERE shared / (sa.nf + sb.nf - shared) >= 0.5
         |ORDER BY media_a, media_b""".stripMargin) { (s, dir) =>
      val f = Tables.documents(s, dir)
        .select(col("doc_id").as("media_id"),
          array_distinct(transform(
            sequence(lit(1), length(col("text")), lit(64)),
            p => TextHash.hash32(col("text").substr(p, lit(64))))).as("fps"))
      val sizes = f.select(col("media_id"), size(col("fps")).cast("long").as("nf"))
      val e = f.select(col("media_id"), explode(col("fps")).as("fp"))
      val pairs = e.as("a")
        .join(e.as("b"),
          col("a.fp") === col("b.fp") && col("a.media_id") < col("b.media_id"))
        .groupBy(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"))
        .agg(count(lit(1)).as("shared"))
      val jacc = col("shared") / (col("nf_a") + col("nf_b") - col("shared"))
      pairs
        .join(sizes.select(col("media_id").as("media_a"), col("nf").as("nf_a")), "media_a")
        .join(sizes.select(col("media_id").as("media_b"), col("nf").as("nf_b")), "media_b")
        .filter(jacc >= 0.5)
        .select(col("media_a"), col("media_b"), col("shared"),
          col("nf_a"), col("nf_b"), jacc.as("frame_jaccard"))
        .orderBy("media_a", "media_b")
    },

    // X5+/Q26d — q26c's named production upgrade: CONTENT-DEFINED chunk
    // boundaries (rolling-window rule) instead of fixed 64-byte frames. A
    // boundary lands where the integer Horner hash of the local 8-byte
    // window is ≡ 0 (mod 64), so an inserted/deleted prefix re-aligns
    // only the chunk that straddles the edit — every later boundary
    // re-synchronizes on unchanged content (MultimodalSpec pins this:
    // byte-shifted payloads keep most CDC fingerprints, lose all fixed
    // frames). The per-row work is ONE codegen'd pass over the payload
    // bytes (functions.CdcChunkFps — a per-position interpreted-HOF
    // formulation measured ~100 ms/doc, the expression runs at memory
    // speed); the oracle replays the identical 64-bit arithmetic over the
    // UTF-8 BYTE array, decoded from hex(encode(text)) — so the parity is
    // byte-exact on ANY corpus, multibyte included (VERDICT r10 #5; the
    // previous ascii()-codepoint fold held only on pure ASCII, guarded by
    // a corpus tripwire now retired in favor of MultimodalSpec's multibyte
    // parity pin). Plan shape is identical to q26c and linear
    // at 100 TB: fingerprint arrays ride the scan as per-row expressions,
    // the pair producer is the same blocked equi-join on chunk hash.
    QueryDef(
      "q26d_cdc_neardup",
      s"""WITH h AS (SELECT doc_id AS media_id, upper(hex(encode(text))) AS hx,
         |  octet_length(encode(text)) AS n FROM documents),
         |c AS (SELECT media_id,
         |  ${TextHash.sqlCdcCodes("hx", "n")} AS codes, n FROM h),
         |b AS (SELECT media_id, codes, n,
         |  ${TextHash.sqlCdcBoundaries("codes", "n")} AS bnds FROM c),
         |f AS (SELECT media_id, ${TextHash.sqlCdcChunkFps("codes", "n", "bnds")} AS fps FROM b),
         |s AS (SELECT media_id, len(fps) AS nc FROM f),
         |e AS (SELECT media_id, unnest(fps) AS fp FROM f),
         |p AS (SELECT a.media_id AS media_a, b.media_id AS media_b, COUNT(*) AS shared
         |      FROM e a JOIN e b ON a.fp = b.fp AND a.media_id < b.media_id
         |      GROUP BY 1, 2)
         |SELECT media_a, media_b, shared, sa.nc AS nc_a, sb.nc AS nc_b,
         |  shared / (sa.nc + sb.nc - shared) AS chunk_jaccard
         |FROM p JOIN s sa ON sa.media_id = media_a
         |       JOIN s sb ON sb.media_id = media_b
         |WHERE shared / (sa.nc + sb.nc - shared) >= 0.5
         |ORDER BY media_a, media_b""".stripMargin) { (s, dir) =>
      graft.functions.CdcFunctions.register(s)
      val f = Tables.documents(s, dir)
        .select(col("doc_id").as("media_id"),
          array_distinct(graft.functions.CdcFunctions.cdcChunkFps(col("text"))).as("fps"))
      val sizes = f.select(col("media_id"), size(col("fps")).cast("long").as("nc"))
      val e = f.select(col("media_id"), explode(col("fps")).as("fp"))
      val pairs = e.as("a")
        .join(e.as("b"),
          col("a.fp") === col("b.fp") && col("a.media_id") < col("b.media_id"))
        .groupBy(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"))
        .agg(count(lit(1)).as("shared"))
      val jacc = col("shared") / (col("nc_a") + col("nc_b") - col("shared"))
      pairs
        .join(sizes.select(col("media_id").as("media_a"), col("nc").as("nc_a")), "media_a")
        .join(sizes.select(col("media_id").as("media_b"), col("nc").as("nc_b")), "media_b")
        .filter(jacc >= 0.5)
        .select(col("media_a"), col("media_b"), col("shared"),
          col("nc_a"), col("nc_b"), jacc.as("chunk_jaccard"))
        .orderBy("media_a", "media_b")
    }
  )
}
