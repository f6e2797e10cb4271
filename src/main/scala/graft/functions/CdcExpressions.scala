package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk fingerprints as ONE native pass over the string's
  * bytes (SURVEY.md §2.11 X5, q26d).
  *
  * Why an Expression and not higher-order functions: CDC examines EVERY byte
  * position (a boundary lands where the hash of the trailing
  * [[TextHash.CdcW]]-byte window is ≡ 0 mod [[TextHash.CdcDiv]]), so a
  * `filter(sequence(...), pred)` formulation evaluates an interpreted
  * predicate tree per position — measured ~40 µs/position with an md5-based
  * window hash, ~100 ms per 300-byte document, which is a non-starter at any
  * scale (this is the gap between "expressible" and "shippable": a rolling
  * chunker in C runs at ~1 ns/byte). `doGenCode` keeps the surrounding
  * operator whole-stage-codegen'd and delegates to one static-shaped helper
  * call per row; the helper is a plain JVM loop over the byte array — integer
  * Horner hashes only, no md5, no per-position allocation.
  *
  * Oracle parity: all arithmetic is exact 64-bit integer (window hash =
  * Horner base [[TextHash.CdcB]] mod [[TextHash.Mod]]; chunk fingerprint =
  * Horner base [[TextHash.FpMult]] mod Mod), reproduced in DuckDB by
  * [[TextHash.sqlCdcBoundaries]]/[[TextHash.sqlCdcChunkFps]] over an
  * `ascii()` codepoint array. The JVM side folds UTF-8 BYTES, the SQL side
  * codepoints — identical on the ASCII corpus (same assumption q26c's
  * byte-oriented oracle already makes; non-ASCII text chunks correctly on
  * both sides, just not bit-identically across engines).
  */
case class CdcChunkFps(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_fps"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkFps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val helper = ctx.addReferenceObj("cdcHelper", CdcChunkFps,
        CdcChunkFps.getClass.getName)
      s"${ev.value} = $helper.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkFps {

  import TextHash.{CdcB, CdcDiv, CdcW, FpMult, Mod}

  /** CdcB^(CdcW-1) mod Mod — the weight of the byte leaving the rolling
    * window. All products stay < 2^40 (Mod < 2^31, bytes < 2^8, CdcB < 2^9),
    * so the rolling update never overflows a long. */
  private val OutW: Long = {
    var p = 1L
    var k = 1
    while (k < CdcW) { p = (p * CdcB) % Mod; k += 1 }
    p
  }

  /** Ordered chunk fingerprints of `s` under the CDC boundary rule: chunk
    * ends after 1-based byte position p (CdcW ≤ p < n) iff the Horner hash
    * of bytes p-CdcW+1..p is ≡ 0 mod CdcDiv; the final chunk runs to
    * end-of-string (fingerprint 0 for the empty string — one empty chunk,
    * matching the oracle's fold over an empty slice). Single pass; the
    * chunk fingerprint accumulates as bytes stream by and resets at each
    * boundary (exactly the per-chunk Horner fold), and the WINDOW hash
    * ROLLS Rabin-Karp style — subtract the leaving byte's OutW weight,
    * shift, add the entering byte, all mod Mod — which is byte-for-byte
    * the same value the from-scratch 8-multiply inner loop produced
    * (congruence is preserved by each step) at 1/CdcW of the arithmetic.
    * The boundary hash is NEVER reset at a chunk cut: the window is over
    * raw byte positions, exactly as the oracle's per-position
    * [[TextHash.sqlCdcBoundaries]] computes it. */
  def compute(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val fps = new Array[Long](n + 1)
    var cnt = 0
    var acc = 0L
    var h = 0L
    var i = 0
    while (i < n) {
      val in = b(i) & 0xff
      acc = (acc * FpMult + in) % Mod
      h =
        if (i < CdcW) (h * CdcB + in) % Mod
        else {
          val dropped = (h - (b(i - CdcW) & 0xff) * OutW) % Mod
          ((if (dropped < 0) dropped + Mod else dropped) * CdcB + in) % Mod
        }
      val p = i + 1
      if (p >= CdcW && p < n && h % CdcDiv == 0) { fps(cnt) = acc; cnt += 1; acc = 0L }
      i += 1
    }
    fps(cnt) = acc
    cnt += 1
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(fps, cnt))
  }
}

/** Session registration + Column API for the CDC expression. */
object CdcFunctions {

  /** Idempotently register `cdc_chunk_fps` in the session's function
    * registry (also injectable via [[graft.plans.GraftExtensions]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("cdc_chunk_fps")
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new ExpressionInfo(classOf[CdcChunkFps].getName, "cdc_chunk_fps"),
        (exprs: Seq[Expression]) => CdcChunkFps(exprs.head))
    }
  }

  /** Chunk fingerprints of a string column (requires [[register]]). */
  def cdcChunkFps(text: Column): Column = call_function("cdc_chunk_fps", text)
}
