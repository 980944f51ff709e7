package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels behind the shingle/minhash expressions.
  *
  * The round-1 shingle pipeline was row-based Catalyst
  * (posexplode -> per-doc lead() window -> distinct): correct, but it paid
  * two wide shuffles (window sort + distinct) before any dedup work started,
  * and the MinHash query re-derived it for the signature pass — 46% of the
  * whole benchmark. These kernels compute the distinct shingle set and the
  * full 16-hash MinHash signature per row, map-side, inside whole-stage
  * codegen (the generated code makes one static call per row — no lambda
  * dispatch, no shuffle until the candidate join itself).
  *
  * Arithmetic is bit-identical to the round-1 pipeline and the DuckDB
  * oracles: word tokens are `split(text, " ")` semantics (empties
  * preserved), word hash is the portable poly(31) mod 1e9+7 fold
  * (TextFunctions.charHash), 3-gram combine is
  * ((h1*1000003 + h2) % M * 1000003 + h3) % M, and minhash k of shingle v is
  * ((2k+1)*v + 7919k + 13) mod (2^31-1).
  */
object ShingleKernels {
  private val M = 1000000007L
  private val P = 2147483647L // 2^31 - 1
  val NumHashes = 16

  /** Distinct hashed 3-gram shingles of a document, first-occurrence order.
    * Empty array for texts with fewer than 3 tokens (mirrors the oracle's
    * `WHERE len(string_split(text,' ')) >= 3`).
    */
  def shingles(text: UTF8String): ArrayData = {
    val s = text.toString
    // tokenize on single spaces preserving empty tokens — exactly
    // split(text, " ") / DuckDB string_split(text, ' ')
    var nTok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    if (nTok < 3) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](nTok)
    var t = 0
    var h = 0L
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { wh(t) = h; t += 1; h = 0L }
      else h = (h * 31 + c) % M
      i += 1
    }
    wh(t) = h
    val seen = new java.util.HashSet[java.lang.Long](nTok * 2)
    val out = new Array[Long](nTok - 2)
    var nOut = 0
    var j = 0
    while (j + 2 < nTok) {
      val sh = (((wh(j) * 1000003L + wh(j + 1)) % M) * 1000003L + wh(j + 2)) % M
      if (seen.add(sh)) { out(nOut) = sh; nOut += 1 }
      j += 1
    }
    new GenericArrayData(if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** 60-bit SimHash fingerprint of a document: per-bit counts of all token
    * hashes (+1/-1 per bit, every token occurrence counted), bit set where
    * the count is >= 0 — integer arithmetic, order-independent, identical
    * to the explode+groupBy formulation and the DuckDB oracle.
    *
    * The per-token hash is H = h1 | (h2 << 30) from two independent
    * polynomial hashes (x31 mod 1e9+7 — the shared charHash — and x131
    * mod 998244353), giving 60 usable fingerprint bits. A single mod-1e9+7
    * hash caps the fingerprint at ~30 real bits, and a short fingerprint
    * saturates: unrelated documents land within Hamming 3 at rate
    * ~n²·2^-fpBits, which measured as quadratic OUTPUT growth past ~10⁵
    * docs at sf10. 64-bit fingerprints are exactly why Manku et al.
    * (WWW 2007) scale to 8B docs; 60 is the clean two-hash analogue. */
  private val M2 = 998244353L
  def simhash(text: UTF8String): Long = {
    val s = text.toString
    val bits = new Array[Int](60)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        val h = h1 | (h2 << 30)
        var j = 0
        while (j < 60) {
          bits(j) += (((h >> j) & 1L).toInt << 1) - 1
          j += 1
        }
        h1 = 0L
        h2 = 0L
      } else {
        h1 = (h1 * 31 + s.charAt(i)) % M
        h2 = (h2 * 131 + s.charAt(i)) % M2
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (bits(j) >= 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** 16-hash MinHash signature of a shingle set; empty array in -> empty
    * array out (callers filter those docs, as the oracle excludes them). */
  def minhash(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val sig = new Array[Long](NumHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = sh.getLong(i)
      var k = 0
      while (k < NumHashes) {
        val h = ((2L * k + 1) * v + 7919L * k + 13L) % P
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** `graft_shingles(text)` — distinct hashed 3-gram shingles as array<long>. */
case class ShingleSet(child: Expression) extends UnaryExpression {
  // callers guarantee a string input
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernels.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(text)` — 60-bit SimHash fingerprint as a long. */
case class SimHashFingerprint(child: Expression) extends UnaryExpression {
  // callers guarantee a string input
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_doc_pairs(docs)` — generator: all ordered document pairs from one
  * shingle's posting list `array<struct<doc_id:long, n:long>>`, emitted as
  * rows (doc_a, doc_b, na, nb) with doc_a < doc_b.
  *
  * This is the pair-generation half of the inverted-index dedup join: after
  * `groupBy(sh).agg(collect_list(...))` each shingle's C(df,2) candidate
  * pairs stream out of GenerateExec through this lazy iterator — no
  * self-join, no sort, and memory stays O(df) per shingle (the C(df,2)
  * output is never materialized as an array). df itself is bounded by the
  * caller's dfCap stop-shingle guard at corpus scale.
  */
case class DocPairGen(child: Expression) extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType = new StructType()
    .add("doc_a", LongType, nullable = false)
    .add("doc_b", LongType, nullable = false)
    .add("na", LongType, nullable = false)
    .add("nb", LongType, nullable = false)
  override def prettyName: String = "graft_doc_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) return Iterator.empty
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val ns = new Array[Long](m)
    var i = 0
    while (i < m) {
      val st = arr.getStruct(i, 2)
      ids(i) = st.getLong(0)
      ns(i) = st.getLong(1)
      i += 1
    }
    // pair order is (min, max): sort the posting list once by doc_id
    val idx = Array.range(0, m).sortBy(ids)
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < m - 1
      override def next(): InternalRow = {
        val r = new GenericInternalRow(
          Array[Any](ids(idx(a)), ids(idx(b)), ns(idx(a)), ns(idx(b))))
        b += 1
        if (b >= m) { a += 1; b = a + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash(shingles)` — 16-long MinHash signature of a shingle set. */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  // callers guarantee an array<long> input
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.minhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernels.minhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
