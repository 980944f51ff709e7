package graft.jobs

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Packed training-set export in the MXNet RecordIO layout the reference
  * builds with im2rec (object-detection/ground_truth/im2rec.py:131-145
  * `mx.recordio.pack`): the interchange format SageMaker/MXNet object-
  * detection training jobs consume.
  *
  * Record wire format (public MXNet RecordIO spec, little-endian):
  *   uint32 magic = 0xced7230a
  *   uint32 lrecord = (cflag << 29) | payload_length
  *   payload, zero-padded to a 4-byte boundary
  * Payload = IRHeader ('IfQQ': uint32 flag, float32 label, uint64 id,
  * uint64 id2) + flag float32 label values (flag > 0 means a packed
  * multi-dim label, im2rec --pack-label) + image bytes.
  *
  * The writer is partition-parallel: each task packs its partition into its
  * own `part-NNNNN.rec` shard plus the `.idx` offset index
  * (MXIndexedRecordIO) that makes records randomly addressable for
  * shuffled training reads. Shard count = partition count, so output
  * parallelism is set the Spark way (`repartition(n)`) and no single node
  * ever buffers the dataset.
  */
object RecordIO {

  private val Magic = 0xced7230a
  private val HeaderBytes = 24

  final case class Record(id: Long, label: Array[Float], image: Array[Byte])

  /** One packed record: IRHeader + label floats + image, framed and padded.
    * Matches mx.recordio.pack(IRHeader(0, label_array, id, 0), img).
    */
  def pack(rec: Record): Array[Byte] = {
    // Long arithmetic: an image near 2 GiB would wrap an Int payloadLen
    // negative and slip past the guard below
    val payloadLenL = HeaderBytes.toLong + 4L * rec.label.length + rec.image.length
    // lrecord holds the length in 29 bits (cflag lives in the top 3): a
    // ~512 MB payload would silently overflow into cflag and corrupt the
    // shard for every reader — fail loudly at write time instead
    require(payloadLenL < (1L << 29),
      s"record ${rec.id}: payload $payloadLenL bytes exceeds the RecordIO 29-bit length field (${(1 << 29) - 1})")
    val payloadLen = payloadLenL.toInt
    val padded = (payloadLen + 3) / 4 * 4
    val buf = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putInt(payloadLen) // cflag = 0: single complete record
    buf.putInt(rec.label.length) // IRHeader.flag = label width
    buf.putFloat(0f)             // IRHeader.label unused when flag > 0
    buf.putLong(rec.id)
    buf.putLong(0L)              // IRHeader.id2
    rec.label.foreach(buf.putFloat)
    buf.put(rec.image)
    buf.array()
  }

  /** Parse every record in one `.rec` shard (inverse of [[pack]]). */
  def unpackShard(bytes: Array[Byte]): Iterator[Record] = new Iterator[Record] {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def hasNext: Boolean = buf.remaining() >= 8
    def next(): Record = {
      val magic = buf.getInt()
      require(magic == Magic, f"bad record magic 0x$magic%08x")
      val lrecord = buf.getInt()
      require((lrecord >>> 29) == 0, "multi-part records are not produced by this writer")
      val len = lrecord & ((1 << 29) - 1)
      val start = buf.position()
      val flag = buf.getInt()
      buf.getFloat()
      val id = buf.getLong()
      buf.getLong()
      val label = Array.fill(flag)(buf.getFloat())
      val image = new Array[Byte](len - HeaderBytes - 4 * flag)
      buf.get(image)
      buf.position(start + (len + 3) / 4 * 4) // skip alignment padding
      Record(id, label, image)
    }
  }

  /** Write records as sharded `.rec` + `.idx` files, one shard per
    * partition, executor-side (the same sink shape as the PNG writer: local
    * files here, an object-store upload in production).
    */
  def write(records: Dataset[Record], outDir: String): Unit = {
    new File(outDir).mkdirs()
    records.foreachPartition { it: Iterator[Record] =>
      val part = TaskContext.get().partitionId()
      val rec = new File(outDir, f"part-$part%05d.rec")
      val idx = new File(outDir, f"part-$part%05d.idx")
      val out = new BufferedOutputStream(new FileOutputStream(rec))
      val idxOut = new java.io.PrintWriter(idx)
      try {
        var pos = 0L
        it.foreach { r =>
          val bytes = pack(r)
          out.write(bytes)
          idxOut.println(s"${r.id}\t$pos")
          pos += bytes.length
        }
      } finally { out.close(); idxOut.close() }
    }
  }

  /** Distributed read-back: one task per shard, records re-inflated from
    * the framed layout. (Whole-shard reads are the native RecordIO access
    * pattern — records are not splittable without the .idx; shards are kept
    * task-sized by the writer.)
    */
  def read(spark: SparkSession, dir: String): Dataset[Record] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.rec")
      .load(dir)
      .select("content")
      .as[Array[Byte]]
      .flatMap(unpackShard)
  }

  /** Build object-detection training records from images + ground-truth
    * boxes: label layout = [header_width=2, label_width=5,
    * (class_id, xmin, ymin, xmax, ymax) per box] — the .lst/.rec convention
    * im2rec packs for SageMaker object detection. The per-image box list is
    * a bounded collect_list (annotations per image). Images with no
    * ground-truth boxes pack too, with the bare [2,5] header — im2rec packs
    * every .lst entry, and background/negative images are part of an
    * object-detection training set.
    */
  def trainingRecords(spark: SparkSession, images: DataFrame, boxes: DataFrame): Dataset[Record] = {
    import spark.implicits._
    val perImage = boxes
      .select(col("source_ref"), array(
        col("class_id").cast("float"),
        col("xmin").cast("float"), col("ymin").cast("float"),
        col("xmax").cast("float"), col("ymax").cast("float")).as("box"))
      .groupBy("source_ref")
      // sort_array: collect_list order is scheduling-dependent; sorting the
      // box arrays makes the packed .rec bytes reproducible run-to-run
      .agg(flatten(sort_array(collect_list(col("box")))).as("box_vals"))
    images
      .join(perImage, Seq("source_ref"), "left")
      .select(col("id").cast("long"),
        coalesce(col("box_vals"), array().cast("array<float>")).as("box_vals"),
        col("image"))
      .as[(Long, Seq[Float], Array[Byte])]
      .map { case (id, boxVals, image) =>
        Record(id, Array(2f, 5f) ++ boxVals, image)
      }
  }
}
