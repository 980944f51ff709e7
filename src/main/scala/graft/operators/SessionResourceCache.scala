package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** A per-session cache of Spark RESOURCES (persisted DataFrames / RDDs) —
  * the counterpart of [[SessionModelCache]] for values that must be
  * RELEASED, not just dropped: letting GC collect a key would strand
  * persisted blocks with no unpersist, so keys stay strong and lifecycle
  * is explicit instead (the round-14 advisor finding on the four
  * resource caches):
  *
  *   - ONE-LIVE-COPY swap: [[put]] releases the previous value under the
  *     same key (the established policy — a still-held earlier result
  *     silently recomputes through lineage, correct but uncached);
  *   - CONTEXT-STOP sweep: one listener per SparkContext (never per
  *     session/call) releases every entry whose session rode the stopped
  *     context — ImageOps.idRddCache's sweep, applied uniformly;
  *   - EXPLICIT session retirement: a long-lived JVM that CYCLES sessions
  *     on one context calls [[releaseSession]] when it retires one,
  *     otherwise each retired session leaves its last entries persisted
  *     until application end.
  *
  * `sessionOf` maps a key to its owning session (identity for
  * session-keyed caches; `_._1` for (session, caller) keys); `release`
  * unpersists a value.
  */
private[graft] final class SessionResourceCache[K, V <: AnyRef](
    sessionOf: K => SparkSession, release: V => Unit) {

  private val entries = new java.util.concurrent.ConcurrentHashMap[K, V]()
  private val sweepHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkContext]()

  /** Swap in `value` under `key`, releasing the previous copy; hooks the
    * context sweep on first use of a context. */
  def put(key: K, value: V): Unit = {
    val prev = entries.put(key, value)
    if ((prev ne null) && (prev ne value)) release(prev)
    val sc = sessionOf(key).sparkContext
    if (sweepHooked.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          sweepContext(sc)
      })
  }

  /** Release and drop every entry owned by `session` (safe any time; the
    * next compute re-populates). */
  def releaseSession(session: SparkSession): Unit =
    entries.forEach { (k, v) =>
      if (sessionOf(k) eq session) if (entries.remove(k, v)) release(v)
    }

  /** The context-stop sweep body (also the spec's seam — stopping the
    * one shared test context would kill the suite). */
  private[graft] def sweepContext(sc: SparkContext): Unit = {
    entries.forEach { (k, v) =>
      if (sessionOf(k).sparkContext eq sc) if (entries.remove(k, v)) release(v)
    }
    sweepHooked.remove(sc)
  }

  private[graft] def liveKeys: Set[K] = {
    import scala.jdk.CollectionConverters._
    entries.keySet().asScala.toSet
  }
}
