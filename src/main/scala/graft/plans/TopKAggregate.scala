package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded per-group top-k as a TYPED IMPERATIVE AGGREGATE —
  * `graft_topk(score, id, aux, k)` → `array<struct<score,id,aux>>`, best
  * first, ordered by (score DESC, id ASC).
  *
  * The scale story vs the window formulation (q11): `row_number() OVER
  * (PARTITION BY g ORDER BY score DESC)` must SORT every row of every
  * group before discarding all but k. An aggregate gets partial
  * aggregation for free: each map task keeps a k-entry heap per group,
  * shuffles k rows per (task, group) — the shuffle and the final state are
  * bounded by k·groups no matter how many billions of rows flow in, and
  * nothing is ever globally sorted. (Same plan shape DataSketches-style
  * sketch aggregates use.)
  *
  * Determinism: the (score, id) total order makes the result independent
  * of row arrival and merge order — ties keep the smallest id, so the
  * oracle's ROW_NUMBER tiebreak reproduces it exactly.
  *
  * Null handling: rows with a null score or id are SKIPPED (standard SQL
  * aggregate convention — max/min/arg-max ignore nulls); a null aux is
  * preserved as null in the output struct. Note the window formulation
  * q11b mirrors (ROW_NUMBER ... DESC = NULLS LAST) would still EMIT
  * null-score rows when a group has fewer than k non-null values — on
  * data with nullable scores the two shapes differ by exactly those rows.
  *
  * NaN handling: all comparisons go through `java.lang.Double.compare`, a
  * total order in which NaN ranks ABOVE every other value — exactly where
  * Spark's `ORDER BY score DESC` places it — so a NaN score is admitted as
  * the current best rather than wedging the heap (a naive `>` test is
  * always false against NaN, which would both keep NaN pinned as "worst"
  * and reject every later arrival).
  */
case class TopKAggregate(
    score: Expression, id: Expression, aux: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggregate.Buffer] {

  import TopKAggregate._

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v >= 1 && v <= (1 << 20), s"graft_topk: unreasonable k=$v")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, aux, kExpr)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAggregate =
    copy(score = c(0), id = c(1), aux = c(2), kExpr = c(3))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("aux", LongType, nullable = true))), containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val a = aux.eval(input)
      b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (a == null) null else java.lang.Long.valueOf(a.asInstanceOf[Long]))
    }
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.absorb(other); b }

  override def eval(b: Buffer): Any =
    new GenericArrayData(b.sortedBest.map(e => InternalRow(e._1, e._2, e._3)))

  override def serialize(b: Buffer): Array[Byte] = {
    val es = b.entries
    val buf = ByteBuffer.allocate(8 + es.length * 25)
    buf.putInt(b.k).putInt(es.length)
    es.foreach { case (s, i, a) =>
      buf.putDouble(s).putLong(i)
      if (a == null) buf.put(0: Byte).putLong(0L) else buf.put(1: Byte).putLong(a)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new Buffer(buf.getInt)
    val n = buf.getInt
    var j = 0
    while (j < n) {
      val s = buf.getDouble; val i = buf.getLong
      val hasAux = buf.get() == (1: Byte); val a = buf.getLong
      b.offer(s, i, if (hasAux) java.lang.Long.valueOf(a) else null)
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_topk"
}

object TopKAggregate {
  /** Bounded k-entry min-heap; the root is the WORST kept entry (lowest
    * score, then highest id), so a better arrival evicts it in O(log k). */
  final class Buffer(val k: Int) {
    // (score, id, aux); heap orders "worst first"; aux is boxed to carry null.
    // All score comparisons use java.lang.Double.compare — a TOTAL order
    // (NaN above everything, matching Spark's ORDER BY DESC) — never
    // primitive </>/== which are vacuously false against NaN.
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long, java.lang.Long)](
      new Ordering[(Double, Long, java.lang.Long)] {
        // ranks the WORSE entry higher: lower score first, then larger id
        def compare(a: (Double, Long, java.lang.Long), b: (Double, Long, java.lang.Long)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      })

    def offer(s: Double, i: Long, a: java.lang.Long): Unit = {
      if (heap.size < k) heap.enqueue((s, i, a))
      else {
        val w = heap.head // worst kept
        val c = java.lang.Double.compare(s, w._1)
        if (c > 0 || (c == 0 && i < w._2)) { heap.dequeue(); heap.enqueue((s, i, a)) }
      }
    }

    def absorb(other: Buffer): Unit = other.entries.foreach(e => offer(e._1, e._2, e._3))

    def entries: Array[(Double, Long, java.lang.Long)] = heap.toArray

    def sortedBest: Array[(Double, Long, java.lang.Long)] =
      entries.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }
  }

}
