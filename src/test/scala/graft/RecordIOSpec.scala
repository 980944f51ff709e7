package graft

import java.nio.file.Files

import graft.jobs.RecordIO
import graft.jobs.RecordIO.Record

class RecordIOSpec extends SparkSpec {

  test("pack(): exact MXNet wire layout") {
    val bytes = RecordIO.pack(Record(7L, Array(1.5f), Array[Byte](1, 2, 3)))
    // magic 0xced7230a little-endian
    assert(bytes.slice(0, 4).toSeq === Seq[Byte](0x0a, 0x23, 0xd7.toByte, 0xce.toByte))
    val payloadLen = 24 + 4 + 3 // IRHeader + 1 label float + 3 image bytes
    assert(bytes.slice(4, 8).toSeq === Seq[Byte]((payloadLen & 0xff).toByte, 0, 0, 0))
    assert(bytes.length === 8 + (payloadLen + 3) / 4 * 4) // padded to 4B
    assert(bytes.slice(8, 12).toSeq === Seq[Byte](1, 0, 0, 0)) // flag = 1
    assert(bytes.slice(16, 24).toSeq === Seq[Byte](7, 0, 0, 0, 0, 0, 0, 0)) // id
  }

  test("pack()/unpackShard() roundtrip across odd payload lengths") {
    val recs = (0 until 5).map { i =>
      Record(i.toLong, Array.tabulate(i)(_.toFloat), Array.tabulate[Byte](i * 3 + 1)(_.toByte))
    }
    val shard = recs.flatMap(r => RecordIO.pack(r).toSeq).toArray
    val back = RecordIO.unpackShard(shard).toSeq
    assert(back.map(_.id) === recs.map(_.id))
    back.zip(recs).foreach { case (b, r) =>
      assert(b.label.toSeq === r.label.toSeq)
      assert(b.image.toSeq === r.image.toSeq)
    }
  }

  test("pack(): payload beyond the 29-bit length field fails loudly") {
    // lrecord's top 3 bits are cflag: a >=2^29-byte payload would silently
    // corrupt the shard, so pack must refuse it
    val tooBig = new Array[Byte]((1 << 29) - 24) // header alone reaches the limit
    val e = intercept[IllegalArgumentException] {
      RecordIO.pack(Record(1L, Array.empty[Float], tooBig))
    }
    assert(e.getMessage.contains("29-bit"))
  }

  test("trainingRecords() -> write() -> read(): boxes and bytes recovered") {
    import spark.implicits._
    val images = Seq(
      (0L, "img0.png", Array[Byte](10, 11, 12, 13)),
      (1L, "img1.png", Array[Byte](20, 21)),
      (2L, "img2.png", Array[Byte](30)) // negative image: no ground-truth boxes
    ).toDF("id", "source_ref", "image")
    val boxes = Seq(
      ("img0.png", 3L, 0.1, 0.2, 0.5, 0.6),
      ("img0.png", 1L, 0.3, 0.4, 0.7, 0.8),
      ("img1.png", 2L, 0.0, 0.0, 1.0, 1.0)
    ).toDF("source_ref", "class_id", "xmin", "ymin", "xmax", "ymax")

    val out = Files.createTempDirectory("recio").toString
    RecordIO.write(RecordIO.trainingRecords(spark, images, boxes).repartition(2), out)

    val shards = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(shards.count(_.endsWith(".rec")) === 2)
    assert(shards.count(_.endsWith(".idx")) === 2) // random-access offset index

    val back = RecordIO.read(spark, out).collect().sortBy(_.id)
    assert(back.map(_.id).toSeq === Seq(0L, 1L, 2L))
    val r0 = back(0)
    assert(r0.label.take(2).toSeq === Seq(2f, 5f)) // header_width, label_width
    assert(r0.label.length === 2 + 2 * 5)          // two boxes packed
    val boxSet = r0.label.drop(2).grouped(5).map(_.toSeq).toSet
    assert(boxSet === Set(Seq(3f, 0.1f, 0.2f, 0.5f, 0.6f), Seq(1f, 0.3f, 0.4f, 0.7f, 0.8f)))
    assert(r0.image.toSeq === Seq[Byte](10, 11, 12, 13))
    assert(back(1).image.toSeq === Seq[Byte](20, 21))
    assert(back(1).label.drop(2).toSeq === Seq(2f, 0f, 0f, 1f, 1f))
    // the box-less image packs too (im2rec packs every .lst entry) —
    // bare [header_width, label_width] header, zero boxes
    assert(back(2).label.toSeq === Seq(2f, 5f))
    assert(back(2).image.toSeq === Seq[Byte](30))

    // .idx offsets address the records inside the shard
    val idxLines = shards.filter(_.endsWith(".idx")).flatMap { f =>
      scala.io.Source.fromFile(new java.io.File(out, f)).getLines().toSeq
    }
    val nonEmpty = idxLines.filter(_.nonEmpty)
    assert(nonEmpty.length === 3)
    nonEmpty.foreach { l => assert(l.split("\t").length === 2) }
  }
}
