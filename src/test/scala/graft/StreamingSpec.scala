package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CorpusStreams, EventStreams}
import graft.streaming.CorpusStreams.DocIn
import graft.streaming.EventStreams.Ev

class StreamingSpec extends SparkSpec {

  private val H = 3600L * 1000000000L // 1h in ns
  private def ev(id: Long, tNs: Long, user: Long, tpe: String, v: Double) = Ev(id, tNs, user, tpe, v)

  test("windowedCounts: tumbling event-time windows with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventStreams.windowedCounts(mem.toDF(), "1 hour", "2 hours")
    val q = out.writeStream.format("memory").queryName("wc").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    mem.addData(
      ev(1, base, 1, "click", 1.0), ev(2, base + H / 2, 1, "click", 2.0),
      ev(3, base + H + 1, 2, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    mem.addData(ev(4, base + 10 * H, 1, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("select * from wc").collect()
    q.stop()
    val clicks = rows.filter(_.getAs[String]("event_type") == "click")
    assert(clicks.exists(_.getAs[Long]("n") == 2)) // both clicks in one window
    assert(rows.filter(_.getAs[String]("event_type") == "view").forall(_.getAs[Long]("n") == 1))
  }

  test("trendingTopK: graft_topk aggregates inside a streaming window, late rows merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventStreams.trendingTopK(mem.toDF(), k = 2, "1 hour", "2 hours")
    val q = out.writeStream.format("memory").queryName("tk").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    mem.addData(
      ev(1, base, 1, "click", 5.0), ev(2, base + H / 4, 2, "click", 9.0))
    q.processAllAvailable()
    // a LATE-but-admissible arrival for the same window must merge into
    // the heap before the watermark closes it
    mem.addData(ev(3, base + H / 2, 3, "click", 7.0))
    q.processAllAvailable()
    mem.addData(ev(9, base + 10 * H, 1, "click", 1.0)) // advances watermark
    q.processAllAvailable()
    val rows = spark.sql("select * from tk").collect()
    q.stop()
    val winStartMs = (base / 1000000L) / 3600000L * 3600000L // floor to the hour
    val first = rows.filter(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[java.sql.Timestamp]("window_start").getTime == winStartMs)
    assert(first.length === 1)
    val top = first.head.getSeq[org.apache.spark.sql.Row](2)
    // top-2 of {5.0, 9.0, 7.0} = [(9.0, id 2), (7.0, id 3)], best first
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) === Seq((9.0, 2L), (7.0, 3L)))
  }

  test("sessionizeStream: gap closes a session and emits it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventStreams.sessionizeStream(spark, mem.toDS(), gapNs = H)
    val q = out.writeStream.format("memory").queryName("sess").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    mem.addData(ev(1, base, 7, "click", 1.0), ev(2, base + H / 4, 7, "view", 1.0))
    q.processAllAvailable()
    mem.addData(ev(3, base + 5 * H, 7, "click", 1.0)) // gap > 1h: closes first session
    q.processAllAvailable()
    val rows = spark.sql("select * from sess").collect()
    assert(rows.length === 1)
    val s = rows(0)
    assert(s.getAs[Long]("user_id") === 7)
    assert(s.getAs[Int]("n_events") === 2)
    assert(s.getAs[Long]("session_end_ns") - s.getAs[Long]("session_start_ns") === H / 4)
    // event-time timeout: another key's data pushes the watermark past
    // user 7's (end + gap), flushing its open session as final
    mem.addData(ev(9, base + 20 * H, 1, "click", 1.0))
    q.processAllAvailable()
    mem.addData(ev(10, base + 21 * H, 1, "view", 1.0)) // extra batch: fire pending timeouts
    q.processAllAvailable()
    val flushed = spark.sql("select * from sess where user_id = 7").collect()
    q.stop()
    assert(flushed.length === 2)
    assert(flushed.map(_.getAs[Int]("n_events")).sorted.toSeq === Seq(1, 2))
  }

  test("windowedCounts: checkpointed file-stream query resumes without reprocessing") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("cksrc").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val out = Files.createTempDirectory("ckout").toString
    val schema = Tables.events(spark, sf).schema
    def start() = EventStreams.windowedCounts(
        spark.readStream.schema(schema).parquet(src), "1 day", "1 day")
      .writeStream.format("parquet").outputMode("append")
      .option("path", out)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    Tables.events(spark, sf).filter(col("event_id") < 300).write.mode("append").parquet(src)
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint; feed the remainder
    val q2 = start()
    Tables.events(spark, sf).filter(col("event_id") >= 300).write.mode("append").parquet(src)
    q2.processAllAvailable()
    q2.stop()
    val sunk = spark.read.parquet(out)
    val streamed = sunk.agg(sum("n")).collect()(0).getLong(0)
    // closed windows only (append mode): streamed counts must never exceed
    // the total and must cover most events; no window may be emitted twice
    val total = Tables.events(spark, sf).count()
    assert(streamed <= total && streamed > total / 2)
    val dupWindows = sunk.groupBy("window_start", "event_type")
      .count().filter(col("count") > 1).count()
    assert(dupWindows === 0)
  }

  test("dedupStream: re-delivered keys dropped, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventStreams.dedupStream(mem.toDF(), "1 hour")
    val q = out.writeStream.format("memory").queryName("dd").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    mem.addData(
      ev(1, base, 1, "click", 1.0),
      ev(1, base, 1, "click", 1.0),        // exact re-delivery (same batch)
      ev(2, base + H / 4, 2, "view", 2.0))
    q.processAllAvailable()
    mem.addData(ev(1, base + H / 2, 1, "click", 9.9)) // re-delivery, later ts, within watermark
    q.processAllAvailable()
    mem.addData(ev(9, base + 10 * H, 3, "click", 0.0)) // advances watermark
    q.processAllAvailable()
    val rows = spark.sql("select * from dd").collect()
    q.stop()
    // (user_id, event_id) = (1, 1) survived exactly once despite 3 deliveries
    assert(rows.count(r => r.getAs[Long]("user_id") == 1 && r.getAs[Long]("event_id") == 1) === 1)
    assert(rows.length === 3) // (1,1), (2,2), (3,9)
  }

  test("clickViewJoin: stream-stream join attributes views within the hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventStreams.clickViewJoin(mem.toDF())
    val q = out.writeStream.format("memory").queryName("cvj").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    mem.addData(
      ev(1, base, 5, "click", 1.0),
      ev(2, base + H / 2, 5, "view", 1.0),   // within the hour -> joins
      ev(3, base + 3 * H, 5, "view", 1.0),   // too late -> no click match
      ev(4, base + H / 4, 6, "view", 1.0))   // other user -> no match
    q.processAllAvailable()
    mem.addData(ev(9, base + 20 * H, 1, "click", 1.0)) // advance watermark
    q.processAllAvailable()
    val rows = spark.sql("select view_id, click_id from cvj").collect()
    q.stop()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 2 && rows(0).getLong(1) === 1)
  }

  test("neardupStream: band buckets claim state, flag later arrivals, expire by TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val out = CorpusStreams.neardupStream(spark, mem.toDF(),
      watermarkDelay = "2 hours", bucketTtlMs = 24L * 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("nds").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    val textA = "the quick brown fox jumps over the lazy dog again and again today"
    val textB = "completely different vocabulary with no overlapping windows whatsoever here now"
    mem.addData(
      DocIn(10, base, textA),
      DocIn(11, base + H / 4, textA), // identical text -> every band collides
      DocIn(12, base + H / 4, textB)) // unique text -> no band collides
    q.processAllAvailable()
    mem.addData(DocIn(10, base + H / 2, textA)) // owner re-delivery: not flagged
    q.processAllAvailable()
    def rows() = spark.sql("select * from nds").collect()
    val first = rows()
    // doc 11 flagged on all 4 bands with doc 10 as owner
    val d11 = first.filter(_.getAs[Long]("doc_id") == 11)
    assert(d11.length === 4 && d11.forall(r =>
      r.getAs[Boolean]("neardup") && r.getAs[Long]("owner") === 10L))
    // doc 12 clean; owner re-delivery (doc 10 twice) never flagged
    assert(first.filter(_.getAs[Long]("doc_id") == 12).forall(!_.getAs[Boolean]("neardup")))
    assert(first.filter(_.getAs[Long]("doc_id") == 10).forall(!_.getAs[Boolean]("neardup")))
    // push the watermark past last-touch + TTL, then an extra batch fires
    // the pending timeouts: textA's buckets expire
    mem.addData(DocIn(90, base + 30 * H, textB + " plus watermark pusher words"))
    q.processAllAvailable()
    mem.addData(DocIn(91, base + 31 * H, textB + " another pusher batch entirely"))
    q.processAllAvailable()
    mem.addData(DocIn(30, base + 31 * H, textA)) // same text, fresh claim
    q.processAllAvailable()
    val d30 = rows().filter(_.getAs[Long]("doc_id") == 30)
    q.stop()
    assert(d30.length === 4 && d30.forall(r =>
      !r.getAs[Boolean]("neardup") && r.getAs[Long]("owner") === 30L),
      s"expected expired buckets to be re-claimed: ${d30.mkString(";")}")
  }

  test("decontaminateStream: arriving docs flagged against the heldout index; clean docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // heldout index from a tiny corpus dir: doc 3 hashes to the heldout
    // split ((3*2654435761) % 100 = 83) and carries a known 13-gram
    val shared = (1 to 13).map(i => s"s$i").mkString(" ")
    val corpus = java.nio.file.Files.createTempDirectory("deconidx").toString
    Seq((3L, s"$shared h1 h2 h3"), (1L, (1 to 15).map(i => s"tr$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$corpus/documents.parquet")
    val heldout = graft.operators.CurationOps.heldoutIndex(spark, corpus)

    val mem = MemoryStream[DocIn]
    val out = CorpusStreams.decontaminateStream(spark, mem.toDF(), heldout)
    val q = out.writeStream.format("memory").queryName("dcs").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    mem.addData(
      DocIn(100, base, s"t1 t2 $shared t3 t4"), // carries the heldout 13-gram verbatim
      DocIn(101, base, (1 to 20).map(i => s"c$i").mkString(" "))) // clean
    q.processAllAvailable()
    // append-mode aggregation emits when the watermark passes the doc's
    // event time: push it with two later batches
    mem.addData(DocIn(900, base + 10 * H, (1 to 14).map(i => s"w$i").mkString(" ")))
    q.processAllAvailable()
    mem.addData(DocIn(901, base + 11 * H, (1 to 14).map(i => s"x$i").mkString(" ")))
    q.processAllAvailable()
    val rows = spark.sql("select * from dcs").collect()
    q.stop()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.contains(100L) && byId.contains(101L), rows.mkString(";"))
    // the contaminated arrival: exactly ONE of its 5 windows (17 tokens)
    // is the heldout 13-gram — the batch kernel's arithmetic, streamed
    assert(byId(100L).getAs[Boolean]("drop"))
    assert(byId(100L).getAs[Long]("n_ngrams") === 5L)
    assert(byId(100L).getAs[Long]("n_hits") === 1L)
    assert(!byId(101L).getAs[Boolean]("drop"))
    assert(byId(101L).getAs[Long]("n_hits") === 0L)
  }

  test("neardupStream: a late arrival never shrinks a bucket's TTL expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val out = CorpusStreams.neardupStream(spark, mem.toDF(),
      watermarkDelay = "2 hours", bucketTtlMs = 24L * 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("ndl").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    mem.addData(DocIn(10, base, textA)) // claims at T
    q.processAllAvailable()
    // late but watermark-admissible arrival at T - 1h: expiry must stay
    // T + 24h, not shrink to T + 23h
    mem.addData(DocIn(11, base - H, textA))
    q.processAllAvailable()
    // watermark lands between T + 23h (buggy expiry) and T + 24h (correct)
    mem.addData(DocIn(90, base + 25 * H + H / 2, "watermark pusher with distinct words only here"))
    q.processAllAvailable()
    mem.addData(DocIn(91, base + 25 * H + H / 2, "second pusher batch to fire any pending timeouts"))
    q.processAllAvailable()
    mem.addData(DocIn(30, base + 25 * H - H / 4, textA)) // admissible probe
    q.processAllAvailable()
    val d30 = spark.sql("select * from ndl where doc_id = 30").collect()
    q.stop()
    // the bucket must still be owned by doc 10 — a shrunk expiry would have
    // expired it and let doc 30 claim fresh
    assert(d30.length === 4 && d30.forall(r =>
      r.getAs[Boolean]("neardup") && r.getAs[Long]("owner") === 10L),
      s"late arrival shrank the TTL: ${d30.mkString(";")}")
  }

  test("winnowStream: a copied block claims fingerprints, flags the partial copy, expires by TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val out = CorpusStreams.winnowStream(spark, mem.toDF(),
      watermarkDelay = "2 hours", fpTtlMs = 24L * 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("wns").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    val a = (1 to 40).map(i => s"a$i")
    // doc 11 embeds a 20-token block of doc 10 (>= w+k-1 = 8: shared
    // fingerprints GUARANTEED) inside fresh text; doc 12 is disjoint
    val partial = ((1 to 10).map(i => s"b$i") ++ a.slice(10, 30) ++
      (11 to 20).map(i => s"b$i")).mkString(" ")
    mem.addData(DocIn(10, base, a.mkString(" ")))
    q.processAllAvailable()
    mem.addData(
      DocIn(11, base + H / 4, partial),
      DocIn(12, base + H / 4, (1 to 30).map(i => s"c$i").mkString(" ")))
    q.processAllAvailable()
    mem.addData(DocIn(10, base + H / 2, a.mkString(" "))) // owner re-delivery
    q.processAllAvailable()
    def rows() = spark.sql("select * from wns").collect()
    val first = rows()
    // the batch kernel agrees: the stream's claimed fps for doc 10 ==
    // winnowOf over the same text (one code path, but pin it anyway)
    val batchFps = graft.operators.CurationOps.winnowOf(
      Seq((10L, a.mkString(" "))).toDF("doc_id", "text"), 5, 4)
      .select("fp").collect().map(_.getLong(0)).toSet
    assert(first.filter(_.getAs[Long]("doc_id") == 10L)
      .map(_.getAs[Long]("fp")).toSet === batchFps)
    // doc 11: the copied block's fps flag against owner 10 (>= minShared
    // evidence); its fresh-text fps claim cleanly
    val d11 = first.filter(_.getAs[Long]("doc_id") == 11L)
    val flagged = d11.filter(_.getAs[Boolean]("neardup"))
    assert(flagged.length >= 2, s"expected >= 2 shared fps, got ${flagged.length}")
    assert(flagged.forall(_.getAs[Long]("owner") === 10L))
    assert(d11.exists(!_.getAs[Boolean]("neardup")), "fresh-text fps must claim cleanly")
    // disjoint doc 12 clean; owner re-delivery never flagged
    assert(first.filter(_.getAs[Long]("doc_id") == 12L).forall(!_.getAs[Boolean]("neardup")))
    assert(first.filter(_.getAs[Long]("doc_id") == 10L).forall(!_.getAs[Boolean]("neardup")))
    // push the watermark past TTL; the expired fps re-claim freshly
    mem.addData(DocIn(90, base + 30 * H, (1 to 30).map(i => s"d$i").mkString(" ")))
    q.processAllAvailable()
    mem.addData(DocIn(91, base + 31 * H, (1 to 30).map(i => s"e$i").mkString(" ")))
    q.processAllAvailable()
    mem.addData(DocIn(30, base + 31 * H, a.mkString(" ")))
    q.processAllAvailable()
    val d30 = rows().filter(_.getAs[Long]("doc_id") == 30L)
    q.stop()
    assert(d30.nonEmpty && d30.forall(r =>
      !r.getAs[Boolean]("neardup") && r.getAs[Long]("owner") === 30L),
      s"expected expired fingerprints to re-claim: ${d30.take(5).mkString(";")}")
  }

  test("monitorTable: latest status per worker on a static frame") {
    // the same aggregation works in batch mode (streaming-batch parity)
    val e = Tables.events(spark, sf)
    val m = EventStreams.monitorTable(e)
    val viaWindow = graft.operators.RosbagDomainOps.monitorStatus(spark, sf)
      .select("user_id", "last_status")
    val joined = m.select(col("user_id"), col("last_status").as("mt_status"))
      .join(viaWindow, "user_id")
    assert(joined.filter(col("mt_status") =!= col("last_status")).count() === 0)
  }
  test("levelShiftStream: a step alarms at the boundary across batch seams; constants and stragglers never do") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val w = 5
    val out = EventStreams.levelShiftStream(spark, mem.toDS(), w = w, thresh = 3.0)
    val q = out.writeStream.format("memory").queryName("lshift").outputMode("append").start()
    val base = 1700000000L * 1000000000L
    def e(i: Int, t: String, v: Double) = Ev(i.toLong, base + i.toLong * 1000000L, 1L, t, v)
    // channel "a": 30 at 0.0 then 30 at 10.0 — split MID-RING across
    // three batches, so the detector must carry its ring over the seams
    val series = (0 until 60).map(i => e(i, "a", if (i < 30) 0.0 else 10.0))
    mem.addData(series.take(28): _*)
    q.processAllAvailable()
    mem.addData(series.slice(28, 33): _*)
    q.processAllAvailable()
    mem.addData(series.drop(33): _*)
    // channel "c": constant — running sigma 0, never alarms
    mem.addData((0 until 40).map(i => e(1000 + i, "c", 7.0)): _*)
    q.processAllAvailable()
    val rows = spark.sql("select * from lshift").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("event_type") == "a"))
    // the strongest alarm is the boundary event (first 10.0 = id 30)
    val peak = rows.maxBy(r => math.abs(r.getAs[Double]("shift_z")))
    assert(peak.getAs[Long]("event_id") === 30L)
    assert(peak.getAs[Double]("mean_before") === 0.0)
    assert(peak.getAs[Double]("mean_after") === 10.0)
    // a straggler far in channel a's past is dropped: no new alarms, no crash
    val before = rows.length
    mem.addData(e(2, "a", 500.0))
    q.processAllAvailable()
    val after = spark.sql("select * from lshift").collect().length
    q.stop()
    assert(after === before)
  }

}
