package graft.jobs

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style sharded tar export: each training sample is a group of
  * files sharing one basename key (`{key}.json` metadata + `{key}.{ext}`
  * payload), samples laid out sequentially in bounded-size POSIX ustar
  * archives. This is the second packed-artifact interchange format next to
  * [[RecordIO]] — the layout PyTorch WebDataset / NVIDIA DALI readers
  * stream sequentially from object storage, which is exactly the access
  * pattern a 100 TB multimodal training set needs (no random reads, shard
  * = unit of shuffling and of restart).
  *
  * The tar grammar here is the public POSIX.1-1988 ustar layout: 512-byte
  * header block (name, octal size, checksum with the chksum field blanked,
  * magic "ustar"), file data zero-padded to a 512 boundary, two zero
  * blocks at end-of-archive. Like the PNG encoder, the bytes are validated
  * in the spec by an independent reader (GNU tar) rather than trusted
  * round-trip-only.
  *
  * The writer is partition-parallel with size-based shard rolling: each
  * task streams its partition into `part-P-shard-S.tar` files, starting a
  * new shard once the current one would exceed `maxShardBytes` — shard
  * size stays bounded no matter how partitions are sized, and no node ever
  * buffers more than one sample.
  */
object TarShards {

  /** One WebDataset sample: `key.json` + `key.ext` in the same shard. */
  final case class Sample(key: String, json: String, ext: String, payload: Array[Byte])

  private val Block = 512

  /** One ustar header block + zero-padded data for a single member file. */
  private[graft] def tarEntry(name: String, data: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length <= 100, s"tar member name over 100 bytes: $name")
    // (the 11-octal-digit size field caps a member at 8 GiB - 1; a JVM
    // byte array tops out at 2 GiB, so the field can never overflow here)
    val hdr = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      System.arraycopy(b, 0, hdr, off, b.length)
    }
    System.arraycopy(nameBytes, 0, hdr, 0, nameBytes.length)
    put(100, "0000644\u0000")                    // mode
    put(108, "0000000\u0000")                    // uid
    put(116, "0000000\u0000")                    // gid
    put(124, f"${data.length}%011o\u0000")       // size, octal
    put(136, "00000000000\u0000")                // mtime: epoch, reproducible bytes
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum blanked for the sum
    hdr(156) = '0'                               // typeflag: regular file
    put(257, "ustar\u000000")                    // magic + version
    var sum = 0L
    var i = 0
    while (i < Block) { sum += hdr(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ")
    val padded = (data.length + Block - 1) / Block * Block
    val out = new Array[Byte](Block + padded)
    System.arraycopy(hdr, 0, out, 0, Block)
    System.arraycopy(data, 0, out, Block, data.length)
    out
  }

  private[graft] def sampleBytes(s: Sample): Array[Byte] =
    tarEntry(s"${s.key}.json", s.json.getBytes(StandardCharsets.UTF_8)) ++
      tarEntry(s"${s.key}.${s.ext}", s.payload)

  /** Parse every member of one tar shard: (name, bytes) in archive order
    * (inverse of [[tarEntry]]; stops at the end-of-archive zero block).
    */
  def unpackShard(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var pos = 0
      private def headerAt(p: Int): Boolean =
        p + Block <= bytes.length && bytes(p) != 0
      def hasNext: Boolean = headerAt(pos)
      def next(): (String, Array[Byte]) = {
        val nameEnd = {
          var i = pos
          while (i < pos + 100 && bytes(i) != 0) i += 1
          i
        }
        val name = new String(bytes, pos, nameEnd - pos, StandardCharsets.UTF_8)
        val magic = new String(bytes, pos + 257, 5, StandardCharsets.UTF_8)
        require(magic == "ustar", s"bad tar magic at offset $pos: $magic")
        val size = java.lang.Long.parseLong(
          new String(bytes, pos + 124, 11, StandardCharsets.UTF_8).trim, 8).toInt
        val data = java.util.Arrays.copyOfRange(bytes, pos + Block, pos + Block + size)
        pos += Block + (size + Block - 1) / Block * Block
        (name, data)
      }
    }

  /** Write samples as size-rolled tar shards, one file series per
    * partition, executor-side (local files here, an object-store multipart
    * upload in production — same sink shape as RecordIO/PNG).
    */
  def write(samples: Dataset[Sample], outDir: String,
            maxShardBytes: Long = 64L * 1024 * 1024): Unit = {
    require(maxShardBytes >= Block * 4, s"maxShardBytes too small: $maxShardBytes")
    new File(outDir).mkdirs()
    samples.foreachPartition { it: Iterator[Sample] =>
      val part = TaskContext.get().partitionId()
      var shardNo = -1
      var out: BufferedOutputStream = null
      var written = 0L
      def roll(): Unit = {
        if (out != null) { out.write(new Array[Byte](Block * 2)); out.close() }
        shardNo += 1
        out = new BufferedOutputStream(new FileOutputStream(
          new File(outDir, f"part-$part%05d-shard-$shardNo%04d.tar")))
        written = 0L
      }
      try {
        it.foreach { s =>
          val bytes = sampleBytes(s)
          // roll BETWEEN samples, never inside one: a sample's members must
          // land in the same shard for sequential readers to regroup them
          if (out == null || (written > 0 && written + bytes.length + Block * 2 > maxShardBytes))
            roll()
          out.write(bytes)
          written += bytes.length
        }
      } finally if (out != null) { out.write(new Array[Byte](Block * 2)); out.close() }
    }
  }

  /** Write samples under EXPLICIT logical shard ids (column layout
    * `(shard int, key, json, ext, payload)`): files named
    * `shard-SSSSS-NNN.tar`, rolling on shard change and on
    * `maxShardBytes` — so the file set is a deterministic function of the
    * logical sharding, not of Spark's partition count (the property a
    * resumable training run needs: re-exporting the same corpus yields
    * byte-identical shards). The caller must have the frame repartitioned
    * by `shard` and sorted within partitions by (shard, key); this method
    * asserts per-partition shard/key monotonicity rather than trusting it.
    */
  def writeSharded(rows: DataFrame, outDir: String,
      maxShardBytes: Long = 64L * 1024 * 1024): Unit = {
    require(maxShardBytes >= Block * 4, s"maxShardBytes too small: $maxShardBytes")
    new File(outDir).mkdirs()
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      var shard = -1
      var sub = -1
      var lastKey: String = null
      var out: BufferedOutputStream = null
      var written = 0L
      def roll(newShard: Int): Unit = {
        if (out != null) { out.write(new Array[Byte](Block * 2)); out.close() }
        if (newShard != shard) { sub = 0; shard = newShard } else sub += 1
        out = new BufferedOutputStream(new FileOutputStream(
          new File(outDir, f"shard-$shard%05d-$sub%03d.tar")))
        written = 0L
      }
      try {
        it.foreach { r =>
          val sh = r.getInt(0)
          val s = Sample(r.getString(1), r.getString(2), r.getString(3),
            r.getAs[Array[Byte]](4))
          require(sh >= shard, s"shard order violated: $sh after $shard — " +
            "sortWithinPartitions(shard, key) missing")
          if (sh == shard) {
            require(lastKey == null || s.key > lastKey,
              s"key order violated in shard $sh: ${s.key} after $lastKey")
          } else lastKey = null
          val bytes = sampleBytes(s)
          if (out == null || sh != shard ||
              (written > 0 && written + bytes.length + Block * 2 > maxShardBytes))
            roll(sh)
          out.write(bytes)
          written += bytes.length
          lastKey = s.key
        }
      } finally if (out != null) { out.write(new Array[Byte](Block * 2)); out.close() }
    }
  }

  /** Distributed read-back: one task per shard, members regrouped into
    * samples by basename key (whole-shard sequential reads are the native
    * WebDataset access pattern).
    */
  def read(spark: SparkSession, dir: String): Dataset[Sample] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(dir)
      .select("content")
      .as[Array[Byte]]
      .flatMap { shard =>
        unpackShard(shard).toSeq.groupBy(_._1.reverse.dropWhile(_ != '.').drop(1).reverse)
          .toSeq.sortBy(_._1)
          .map { case (key, members) =>
            val byExt = members.map { case (n, b) => n.drop(key.length + 1) -> b }.toMap
            val payloadExt = byExt.keys.filter(_ != "json").head
            Sample(key,
              new String(byExt("json"), StandardCharsets.UTF_8),
              payloadExt, byExt(payloadExt))
          }
      }
  }

  /** Build WebDataset samples from images + ground-truth boxes: metadata
    * travels as one deterministic JSON doc per sample (`to_json` over a
    * sorted box array — reproducible bytes), payload as-is. Box-less
    * images pack with an empty box list, mirroring RecordIO.
    */
  def trainingSamples(spark: SparkSession, images: DataFrame, boxes: DataFrame): Dataset[Sample] = {
    import spark.implicits._
    val perImage = boxes
      .select(col("source_ref"), struct(
        col("class_id").cast("long").as("class_id"),
        col("xmin").cast("double").as("xmin"), col("ymin").cast("double").as("ymin"),
        col("xmax").cast("double").as("xmax"), col("ymax").cast("double").as("ymax")).as("box"))
      .groupBy("source_ref")
      .agg(sort_array(collect_list(col("box"))).as("boxes"))
    images
      .join(perImage, Seq("source_ref"), "left")
      .select(
        format_string("%09d", col("id")).as("key"),
        to_json(struct(col("id"), col("source_ref"),
          coalesce(col("boxes"), array().cast(
            "array<struct<class_id:bigint,xmin:double,ymin:double,xmax:double,ymax:double>>"))
            .as("boxes"))).as("json"),
        lit("png").as("ext"),
        col("image").as("payload"))
      .as[Sample]
  }
}
