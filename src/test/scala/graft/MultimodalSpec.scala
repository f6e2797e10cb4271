package graft

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal pipeline: synthetic payload layout, stub decode determinism,
  * and schema survival through a parquet round-trip. */
class MultimodalSpec extends SparkSpec {

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("synthesize emits an 8-byte header plus the utf-8 text") {
    val m = Multimodal.synthesize(Tables.documents(spark, sf)).filter(_.media_id == 3L).head()
    assert(m.kind === Multimodal.Kinds(0))
    assert(m.payload.length >= 8)
    assert(m.payload(0) === 0.toByte)
    assert((m.payload(1) & 0xff) === 32 + (3 % 8) * 16)
  }

  test("decodeFeatures parses header dims and counts 64-byte frames") {
    val feats = Multimodal.decodeFeatures(Multimodal.synthesize(Tables.documents(spark, sf)))
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width === 32 + (f.media_id % 8) * 16)
      assert(f.height === 32 + (f.media_id % 5) * 16)
      assert(f.n_frames === ((f.n_bytes - 8 + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes))
      assert(f.kind === Multimodal.Kinds((f.media_id % 3).toInt))
    }
  }

  test("decode is deterministic across runs") {
    def run() = Multimodal.decodeFeatures(Multimodal.synthesize(Tables.documents(spark, sf)))
      .collect().map(f => (f.media_id, f.checksum)).sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("resizeStub shrinks payloads and rewrites dimensions in lockstep") {
    val in = Multimodal.synthesize(Tables.documents(spark, sf))
    val resized = Multimodal.resizeStub(in, 16, 16)
    val feats = Multimodal.decodeFeatures(resized).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width === 16)
      assert(f.height === 16)
    }
    val inSizes = in.collect().map(m => m.media_id -> m.payload.length).toMap
    resized.collect().foreach(m => assert(m.payload.length <= inSizes(m.media_id)))
  }

  test("cdc chunk fingerprints survive a byte-shift; fixed frames do not") {
    import graft.functions.TextHash
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    // The CDC property q26d exists for: prepend 14 bytes to every payload
    // and the content-defined chunks after the first boundary are unchanged
    // (the boundary windows' CONTENT is unchanged), while every fixed
    // 64-byte frame shifts and re-hashes.
    graft.functions.CdcFunctions.register(spark)
    def cdcFps(t: Column) = array_distinct(graft.functions.CdcFunctions.cdcChunkFps(t))
    def frameFps(t: Column) = array_distinct(transform(
      sequence(lit(1), length(t), lit(64)), p => TextHash.hash32(t.substr(p, lit(64)))))
    val docs = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 200)
      .orderBy(col("doc_id")).limit(20)
      .select(col("doc_id"), col("text"),
        concat(lit("PREFIX-SHIFT: "), col("text")).as("shifted"))
    val jac = docs.select(
      TextHash.jaccard(cdcFps(col("text")), cdcFps(col("shifted"))).as("cdc_j"),
      TextHash.jaccard(frameFps(col("text")), frameFps(col("shifted"))).as("frame_j"))
      .collect()
    val cdcAvg = jac.map(_.getDouble(0)).sum / jac.length
    val frameAvg = jac.map(_.getDouble(1)).sum / jac.length
    assert(jac.length === 20)
    assert(cdcAvg >= 0.4, s"cdc chunks should mostly re-sync, got avg $cdcAvg")
    assert(frameAvg <= 0.1, s"fixed frames should all shift, got avg $frameAvg")
    assert(cdcAvg > frameAvg * 4)
  }

  /** The q26d oracle's CDC rule replayed exactly as DuckDB now computes it
    * (VERDICT r10 #5): Horner folds over the UTF-8 BYTE array — the values
    * `strpos('0123456789ABCDEF', ...)` decodes from `hex(encode(text))` —
    * which is the SAME array the engine's CdcChunkFps folds, on any input.
    * This transcription is character-for-character the arithmetic of
    * TextHash.sqlCdcCodes/sqlCdcBoundaries/sqlCdcChunkFps; the end-to-end
    * DuckDB agreement is additionally pinned on a multibyte parquet
    * fixture (FIXTURES.md §C). */
  private def byteOracleCdcFps(s: String): Set[Long] = {
    import graft.functions.TextHash.{CdcB, CdcDiv, CdcW, FpMult, Mod}
    val codes = s.getBytes("UTF-8").map(b => (b & 0xff).toLong)
    val n = codes.length
    val bnds = (CdcW to math.max(n, CdcW)).filter(i => i < n &&
      codes.slice(i - CdcW, i).foldLeft(0L)((a, x) => (a * CdcB + x) % Mod)
        % CdcDiv == 0)
    val cuts = 0 +: bnds :+ n
    cuts.sliding(2).map { case Seq(a, b) =>
      codes.slice(a, b).foldLeft(0L)((acc, x) => (acc * FpMult + x) % Mod)
    }.toSet
  }

  private def engineCdcFps(s: String): Set[Long] =
    graft.functions.CdcChunkFps
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .toLongArray().toSet

  test("CDC oracle parity holds on multibyte text (byte-array folding, r9-#7 tripwire retired)") {
    // VERDICT r10 #5: the q26d oracle previously folded an ascii()
    // codepoint array — identical to the engine's byte fold only on pure
    // ASCII, guarded by a corpus tripwire here. The oracle now decodes the
    // UTF-8 bytes from hex(encode(text)), so byte-fold parity holds on ANY
    // corpus and the tripwire is retired. Pin engine == transcribed oracle
    // on ASCII, multibyte (2-byte sequences), and astral (4-byte) inputs.
    val ascii = "the quick brown fox jumps over the lazy dog, twice over. " * 4
    assert(engineCdcFps(ascii) === byteOracleCdcFps(ascii))
    val multibyte = "thé qüick brøwn fox jümps över the låzy dög, twice över. " * 4
    assert(engineCdcFps(multibyte) === byteOracleCdcFps(multibyte),
      "byte-array oracle fold must match the engine's UTF-8 byte fold on multibyte text")
    val astral = "emoji 😀 mixed 中文 content, seven words each round. " * 6
    assert(engineCdcFps(astral) === byteOracleCdcFps(astral),
      "parity must cover 3- and 4-byte UTF-8 sequences too")
    // and the multibyte inputs genuinely exercise the multibyte path
    assert(multibyte.getBytes("UTF-8").length > multibyte.length)
    assert(astral.getBytes("UTF-8").length > astral.length)
  }

  test("media schema round-trips through parquet with binary payload intact") {
    val dir = TempDirs.create("graft_media_")
    import spark.implicits._
    val in = Multimodal.synthesize(Tables.documents(spark, sf))
    in.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaFile]
    assert(back.count() === in.count())
    val (a, b) = (in.filter(_.media_id == 0L).head(), back.filter(_.media_id == 0L).head())
    assert(a.payload.toSeq === b.payload.toSeq)
  }
}
