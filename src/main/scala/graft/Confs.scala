package graft

import org.apache.spark.sql.SparkSession

/** Run `f` under temporary session-conf overrides, restoring each key's
  * prior value (or unsetting it) afterwards — even on failure. The single
  * home for the save/override/restore dance: query builders that need
  * non-default optimizer confs (ScaleQueries' runtime-Bloom settings) and
  * plan specs that probe conf-gated behavior both route through here. */
object Confs {
  def withConfs[T](s: SparkSession, pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }
}
