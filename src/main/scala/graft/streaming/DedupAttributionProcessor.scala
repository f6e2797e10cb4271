package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming dedup attribution on the Spark 4.x `transformWithState`
  * (StatefulProcessor) API — the typed-state successor of
  * `flatMapGroupsWithState` (q29 runs the same semantics on the legacy
  * API; q29b runs this one and both hash-match the same batch oracle).
  *
  * Keyed by content hash; one `ValueState[Long]` per distinct hash holds
  * the canonical (minimum) doc_id, and every arriving doc is emitted with
  * its attribution. State is explicit and typed — the handle would also
  * give `ListState`/`MapState` and timers — and is backed by the RocksDB
  * state store (required by this API; also the 100 TB state backend). In
  * production the same processor runs with a `TTLConfig` eviction window
  * instead of `NONE`.
  */
class DedupAttributionProcessor
    extends StatefulProcessor[String, (Long, String), (Long, Long, Boolean)] {

  @transient private var canon: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    canon = getHandle.getValueState[Long]("canon", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
    val ids = rows.map(_._1).toArray.sorted
    val c = if (canon.exists()) math.min(canon.get(), ids.head) else ids.head
    canon.update(c)
    ids.iterator.map(id => (id, c, id != c))
  }
}
