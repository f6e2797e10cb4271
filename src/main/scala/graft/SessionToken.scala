package graft

import org.apache.spark.sql.SparkSession

/** Collision-free per-session cache token.
  *
  * `System.identityHashCode(session)` is NOT one: identity hashes are
  * reused after GC, so a cache keyed on it can serve a stopped session's
  * scratch dirs to a brand-new session that happens to land on the same
  * hash. This mints a unique token per session object instead, held in a
  * weak identity map: stable for the session's lifetime, never reused
  * while the session is reachable, and not pinning stopped sessions in
  * memory. (SparkSession's own `sessionUUID` would do, but it is
  * `private[sql]` — not public API.)
  */
object SessionToken {

  private val tokens =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private val n = new java.util.concurrent.atomic.AtomicLong(0)

  def apply(s: SparkSession): String =
    tokens.computeIfAbsent(s, _ => s"session-${n.incrementAndGet()}")
}
