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

/** The RESOURCE-cache counterpart (round-14 advisor finding): persisted
  * values need explicit release — one-live-copy swap, per-session
  * retirement, and the context-stop sweep must each unpersist exactly the
  * entries they cover, leaving live sessions untouched. */
class SessionResourceCacheSpec extends SparkSpec {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.storage.StorageLevel

  private def persisted(s: SparkSession, n: Int): DataFrame = {
    val df = s.range(n).toDF("id").persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    assert(df.storageLevel !== StorageLevel.NONE)
    df
  }

  test("one-live-copy swap, per-session release, and the context sweep each " +
    "unpersist exactly their entries; live sessions unaffected") {
    val cache = new operators.SessionResourceCache[SparkSession, DataFrame](
      identity, _.unpersist(blocking = true))
    val s2 = spark.newSession()
    val df1 = persisted(spark, 10)
    val df2 = persisted(s2, 12)
    cache.put(spark, df1)
    cache.put(s2, df2)

    // swap: the replaced copy is released, the other session's is not
    val df1b = persisted(spark, 5)
    cache.put(spark, df1b)
    assert(df1.storageLevel === StorageLevel.NONE, "swapped-out copy must unpersist")
    assert(df1b.storageLevel !== StorageLevel.NONE)
    assert(df2.storageLevel !== StorageLevel.NONE, "other session's entry swept by a swap")

    // retiring s2 releases ITS entry only
    cache.releaseSession(s2)
    assert(df2.storageLevel === StorageLevel.NONE, "retired session's blocks must unpersist")
    assert(df1b.storageLevel !== StorageLevel.NONE, "live session's entry must survive")
    assert(cache.liveKeys === Set(spark))

    // the context-stop sweep (exercised through its seam — stopping the
    // one shared test context would kill the suite) drops the rest
    cache.sweepContext(spark.sparkContext)
    assert(df1b.storageLevel === StorageLevel.NONE)
    assert(cache.liveKeys.isEmpty)
  }

  test("composite keys release by OWNING session; DedupOps' retirement hook " +
    "leaves live-session behavior unchanged") {
    val cache = new operators.SessionResourceCache[(SparkSession, String), DataFrame](
      _._1, _.unpersist(blocking = true))
    val s2 = spark.newSession()
    val a = persisted(spark, 3); val b = persisted(spark, 4); val c = persisted(s2, 5)
    cache.put((spark, "x"), a); cache.put((spark, "y"), b); cache.put((s2, "x"), c)
    cache.releaseSession(spark)
    assert(a.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(b.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(c.storageLevel !== org.apache.spark.storage.StorageLevel.NONE,
      "the other session's composite-keyed entry must survive")
    cache.releaseSession(s2)

    // end-to-end: a released dedup cache transparently re-populates —
    // results identical before and after retirement
    val before = operators.DedupOps.minhashEst(spark, sf).collect().toSeq
    operators.DedupOps.releaseSessionCaches(spark)
    val after = operators.DedupOps.minhashEst(spark, sf).collect().toSeq
    assert(after === before, "retirement must not change live-session results")
  }
}
