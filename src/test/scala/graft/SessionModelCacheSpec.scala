package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SessionModelCache

/** The weak-retention contract behind the quantizer caches (round-13
  * advisor finding): a retired owner must become collectible — the cache
  * must not pin cycled sessions (and their models) for the JVM's life. */
class SessionModelCacheSpec extends AnyFunSuite {

  test("hits within an owner; distinct owners get distinct entries") {
    val cache = new SessionModelCache[String, Array[Double]]
    val a = new Object; val b = new Object
    var computes = 0
    def model(): Array[Double] = { computes += 1; Array(1.0, 2.0) }
    val m1 = cache.getOrCompute(a, "lake")(model())
    val m2 = cache.getOrCompute(a, "lake")(model())
    assert(m1 eq m2, "second lookup must hit, not retrain")
    assert(computes === 1)
    val m3 = cache.getOrCompute(b, "lake")(model())
    assert(!(m3 eq m1), "owners must not share entries")
    assert(computes === 2)
    assert(cache.retainedOwners === 2)
  }

  test("a dropped owner becomes collectible (weak key)") {
    val cache = new SessionModelCache[String, Array[Double]]
    // hold `kept` strongly throughout; `dropped` only via the cache
    val kept = new Object
    cache.getOrCompute(kept, "k")(Array(0.0))
    var dropped: Object = new Object
    cache.getOrCompute(dropped, "d")(Array(1.0))
    assert(cache.retainedOwners === 2)
    dropped = null
    // WeakHashMap expunges cleared refs on access; GC is best-effort, so
    // retry — the assertion is that it EVENTUALLY collects, which a
    // strongly-keyed map never would
    var tries = 0
    while (cache.retainedOwners > 1 && tries < 50) {
      System.gc()
      Thread.sleep(20)
      tries += 1
    }
    assert(cache.retainedOwners === 1,
      "retired owner still retained after GC — cache key is not weak")
    // the surviving owner's entry still hits
    var recomputed = false
    cache.getOrCompute(kept, "k") { recomputed = true; Array(9.0) }
    assert(!recomputed, "survivor's entry was evicted alongside")
  }
}
