package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-batch FIRST-WINS key dedup as an engine-managed stateful operator
  * (q45c): the seen-key set q45b maintains as caller-managed versioned
  * parquet, carried instead in a typed `ValueState` per normalized-text
  * digest on the Spark 4.x `transformWithState` API (RocksDB state store —
  * required by the API, and the 100 TB state backend). Emission: the first
  * micro-batch to present a key emits that key's minimum-doc_id row; every
  * later occurrence (same batch or any later batch) is suppressed. With
  * doc_id-ordered slices this is exactly q45's whole-batch first-wins rank
  * (the q45b semantics), but state lifecycle — checkpointing, exactly-once
  * under retries, recovery on restart — is the ENGINE's job, not the
  * caller's: the two state designs are benchmarked against each other
  * under one oracle. In production the same processor runs with a
  * `TTLConfig` eviction window instead of `NONE`.
  */
class SeenKeyKeeperProcessor
    extends StatefulProcessor[String, (Long, String, String, String),
      (Long, String, String)] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean](
      "seen", Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(Long, String, String, String)],
      timerValues: TimerValues): Iterator[(Long, String, String)] = {
    if (seen.exists()) Iterator.empty
    else {
      val r = rows.minBy(_._1)
      seen.update(true)
      Iterator.single((r._1, r._2, r._3))
    }
  }
}
