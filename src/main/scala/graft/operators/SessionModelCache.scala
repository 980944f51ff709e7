package graft.operators

/** A per-session model cache whose SESSION reference is WEAK: the outer
  * map is a [[java.util.WeakHashMap]] keyed by the owning object (a
  * `SparkSession` in practice), so a long-lived JVM that CYCLES sessions
  * on one context stops retaining a stopped session — and its cached
  * models — once the caller drops its last reference (the round-13
  * advisor finding on the quantizer caches: a strongly-keyed
  * ConcurrentHashMap held every retired session forever).
  *
  * Scope: ONLY for caches whose values are plain in-heap models (centroid
  * matrices, codebooks — nothing to release but memory). Caches holding
  * Spark RESOURCES (persisted RDDs/DataFrames) must keep the explicit
  * listener + release discipline instead (ImageOps.idRddCache,
  * DedupOps' label caches): letting GC collect those keys would strand
  * persisted blocks with no unpersist.
  *
  * Concurrency: outer accesses synchronize on the weak map (WeakHashMap
  * is not thread-safe); per-session lookups then ride a
  * ConcurrentHashMap whose computeIfAbsent gives the same
  * one-training-run-per-key guarantee the old flat map had. `compute`
  * may run Spark jobs — it executes outside the outer lock.
  */
private[graft] final class SessionModelCache[K, V] {
  private val outer =
    new java.util.WeakHashMap[AnyRef, java.util.concurrent.ConcurrentHashMap[K, V]]()

  private def innerOf(owner: AnyRef): java.util.concurrent.ConcurrentHashMap[K, V] =
    outer.synchronized {
      var m = outer.get(owner)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[K, V]()
        outer.put(owner, m)
      }
      m
    }

  def getOrCompute(owner: AnyRef, key: K)(compute: => V): V =
    innerOf(owner).computeIfAbsent(key, _ => compute)

  /** Number of owners currently retained (post-GC reachable ones plus
    * not-yet-expunged stale entries; WeakHashMap expunges on access).
    * Test seam for the weak-retention spec. */
  private[graft] def retainedOwners: Int = outer.synchronized { outer.size }
}
