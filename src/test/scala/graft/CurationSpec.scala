package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CurationOps

/** Invariants for the corpus-curation batch (q56–q59 + PII redaction);
  * oracle parity is the driver gate, these pin the semantics.
  */
class CurationSpec extends SparkSpec {

  test("q56 contamination: test docs only, rates in [0,1], planted dups fully contaminated") {
    val rows = CurationOps.contamination(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      assert((docId * 2654435761L) % 100 >= 80, s"train doc $docId leaked into the report")
      val shared = r.getAs[Long]("n_contaminated")
      val total = r.getAs[Long]("n_shingles")
      val rate = r.getAs[Double]("contamination")
      assert(shared >= 0 && shared <= total)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // exact cross-split duplicates (same text both sides) must read as 100%
    val dupGroups = operators.DedupOps.exact(spark, sf).filter(col("n_copies") > 1)
    val dupDocs = Tables.documents(spark, sf)
      .join(dupGroups.select("text_hash"),
        md5(col("text").cast("binary")) === col("text_hash"))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().groupBy(_.getString(1)).values
    val crossSplit = dupDocs.filter { g =>
      val splits = g.map(r => (r.getLong(0) * 2654435761L) % 100 >= 80).toSet
      splits.size == 2
    }
    if (crossSplit.nonEmpty) {
      val byId = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("contamination")).toMap
      val testIds = crossSplit.flatMap(_.map(_.getLong(0)))
        .filter(id => (id * 2654435761L) % 100 >= 80)
      testIds.foreach { id =>
        byId.get(id).foreach(rate => assert(rate === 1.0,
          s"test doc $id duplicates a train doc but reads ${rate}"))
      }
    }
  }

  test("q57 dup-ngram rate: bounds and exact arithmetic") {
    val rows = CurationOps.dupNgramRate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_ngrams")
      val distinct = r.getAs[Long]("n_distinct")
      val rate = r.getAs[Double]("dup_rate")
      assert(distinct >= 1 && distinct <= total)
      assert(math.abs(rate - (total - distinct).toDouble / total) < 1e-15)
    }
  }

  test("q58 stratified sample: exact per-stratum quota, deterministic") {
    val langTotals = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = CurationOps.stratifiedSample(spark, sf, pct = 20).collect()
    val perLang = sampled.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong)
    langTotals.foreach { case (lang, n) =>
      val quota = (n * 20 + 99) / 100
      assert(perLang.getOrElse(lang, 0L) === quota,
        s"$lang: expected ceil quota $quota of $n, got ${perLang.getOrElse(lang, 0L)}")
    }
    // deterministic under re-execution (hash order, not rand())
    val again = CurationOps.stratifiedSample(spark, sf, pct = 20).collect()
    assert(sampled.map(_.getAs[Long]("doc_id")).toSeq === again.map(_.getAs[Long]("doc_id")).toSeq)
    assertThrows[IllegalArgumentException](CurationOps.stratifiedSample(spark, sf, pct = 0))
  }

  test("q59 int8 quantization: every nonzero vector saturates its max element; errors bounded") {
    val rows = CurationOps.quantizeStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalVectors = rows.map(_.getAs[Long]("n_vectors")).sum
    val totalSaturated = rows.map(_.getAs[Long]("n_saturated")).sum
    // the arg-max element quantizes to exactly ±127 by construction
    assert(totalSaturated >= totalVectors,
      s"expected >=1 saturated element per vector: $totalSaturated < $totalVectors")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_sse") > 0.0)
      // per-element error of round-to-nearest is at most scale/2; scale is
      // bounded by the global max norm — use a loose but sound cap
      assert(r.getAs[Double]("max_abs_err") < 1.0)
    }
  }

  test("q60 chunking: full coverage, stride spacing, no sliver tail") {
    val chunks = CurationOps.chunkDocs(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val nTokens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet === nTokens.keySet) // every doc chunked, incl. short ones
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_no"))
      assert(sorted.head.getAs[Long]("start_token") === 1L)
      // consecutive chunks exactly stride apart
      val starts = sorted.map(_.getAs[Long]("start_token"))
      starts.zip(starts.tail).foreach { case (a, b) => assert(b - a === 24L) }
      // the last chunk reaches the final token; every chunk is non-empty
      val last = sorted.last
      assert(last.getAs[Long]("start_token") + last.getAs[Long]("n_chunk_tokens") - 1 === nTokens(id))
      sorted.foreach { c =>
        val k = c.getAs[Long]("n_chunk_tokens")
        assert(k >= 1 && k <= 32)
        assert(c.getAs[String]("chunk_text").split(" ", -1).length.toLong === k)
      }
    }
  }

  test("q61 packing: bins contiguous per shard, every doc packed, budget arithmetic exact") {
    val bins = CurationOps.packSequences(spark, sf).collect()
    val totalDocs = Tables.documents(spark, sf).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, bs) =>
      val ids = bs.map(_.getAs[Long]("bin")).sorted
      assert(ids.head === 0L && ids === (0L until ids.length).toArray.toSeq,
        s"bins not contiguous: ${ids.mkString(",")}")
      // doc ranges don't overlap across consecutive bins
      val ordered = bs.sortBy(_.getAs[Long]("bin"))
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      }
    }
    // recompute shard 0's binning driver-side from raw token counts
    val docs0 = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 32 == 0).sortBy(_._1)
    var cum = 0L
    val expected = docs0.map { case (id, n) => val b = cum / 512; cum += n; (id, b) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = bins.filter(_.getAs[Long]("shard") == 0L)
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_docs")).toMap
    assert(got === expected)
  }

  test("redactPii: typed placeholders replace emails, phones, SSNs, IPs; clean text unchanged") {
    import spark.implicits._
    val cases = Seq(
      (1L, "contact alice.smith+x@example.co.uk for details"),
      (2L, "call +1 (555) 123-4567 or 555 987 6543 today"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "server at 192.168.0.12 responded"),
      (5L, "perfectly clean sentence with no identifiers"))
    val out = cases.toDF("id", "text")
      .select(col("id"), TextFunctions.redactPii(col("text")).as("red"),
        TextFunctions.piiCounts(col("text")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getStruct(2))).toMap
    assert(out(1L)._1 === "contact [EMAIL] for details")
    assert(out(1L)._2.getAs[Int]("emails") === 1)
    assert(out(2L)._1 === "call [PHONE] or [PHONE] today")
    assert(out(2L)._2.getAs[Int]("phones") === 2)
    assert(out(3L)._1 === "ssn [SSN] on file")
    assert(out(3L)._2.getAs[Int]("ssns") === 1)
    assert(out(4L)._1 === "server at [IP] responded")
    assert(out(4L)._2.getAs[Int]("ips") === 1)
    assert(out(5L)._1 === cases(4)._2)
    val c5 = out(5L)._2
    assert(c5.getAs[Int]("emails") + c5.getAs[Int]("phones") +
      c5.getAs[Int]("ssns") + c5.getAs[Int]("ips") === 0)
  }
}
