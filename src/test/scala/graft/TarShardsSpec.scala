package graft

import java.nio.file.Files

import scala.sys.process._

import graft.jobs.TarShards
import graft.jobs.TarShards.Sample

class TarShardsSpec extends SparkSpec {

  test("tarEntry(): GNU tar reads the ustar bytes (independent validator)") {
    val dir = Files.createTempDirectory("tarval").toFile
    val f = new java.io.File(dir, "one.tar")
    val out = new java.io.FileOutputStream(f)
    out.write(TarShards.tarEntry("a/sample.json", """{"k":1}""".getBytes))
    out.write(TarShards.tarEntry("a/sample.png", Array.tabulate[Byte](700)(_.toByte)))
    out.write(new Array[Byte](1024)) // end-of-archive
    out.close()
    // the authoritative check: a reader we did not write parses the archive
    val listing = Seq("tar", "-tf", f.getAbsolutePath).!!.trim.split("\n").toSeq
    assert(listing === Seq("a/sample.json", "a/sample.png"))
    val extract = Files.createTempDirectory("tarx").toFile
    assert(Seq("tar", "-xf", f.getAbsolutePath, "-C", extract.getAbsolutePath).! === 0)
    val png = Files.readAllBytes(new java.io.File(extract, "a/sample.png").toPath)
    assert(png.toSeq === Array.tabulate[Byte](700)(_.toByte).toSeq)
  }

  test("unpackShard() inverts tarEntry() across member sizes incl. block-aligned") {
    val members = Seq(
      "empty.json" -> Array.empty[Byte],
      "half.bin" -> Array.tabulate[Byte](100)(_.toByte),
      "exact.bin" -> Array.tabulate[Byte](512)(i => (i * 3).toByte),
      "big.bin" -> Array.tabulate[Byte](1300)(i => (i ^ 7).toByte))
    val shard = members.flatMap { case (n, d) => TarShards.tarEntry(n, d).toSeq }.toArray ++
      new Array[Byte](1024)
    val back = TarShards.unpackShard(shard).toSeq
    assert(back.map(_._1) === members.map(_._1))
    back.zip(members).foreach { case ((_, got), (_, want)) => assert(got.toSeq === want.toSeq) }
  }

  test("write(): shard rolling bounds size; samples never split across shards") {
    import spark.implicits._
    // each sample ~= 512*2 headers + 1536 payload blocks ≈ 2.5 KiB
    val samples = (0 until 8).map(i =>
      Sample(f"$i%09d", s"""{"id":$i}""", "bin", Array.fill[Byte](1000)(i.toByte)))
    val out = Files.createTempDirectory("tarshards").toString
    TarShards.write(samples.toDS().repartition(1), out, maxShardBytes = 6000)
    val shards = new java.io.File(out).listFiles().filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(shards.length > 1, "size cap never rolled a shard")
    shards.foreach { f =>
      assert(f.length() <= 6000 + 1024, s"${f.getName}: ${f.length()} bytes over cap")
      val names = TarShards.unpackShard(Files.readAllBytes(f.toPath)).map(_._1).toSeq
      // both members of every sample in the same shard, json first
      names.grouped(2).foreach { g =>
        assert(g.length === 2, s"dangling half-sample in ${f.getName}: $g")
        assert(g(0).stripSuffix(".json") === g(1).stripSuffix(".bin"))
      }
    }
    val all = shards.flatMap(f => TarShards.unpackShard(Files.readAllBytes(f.toPath)).map(_._1))
    assert(all.count(_.endsWith(".json")) === 8)
  }

  test("trainingSamples() -> write() -> read(): json metadata and bytes recovered") {
    import spark.implicits._
    val images = Seq(
      (0L, "img0.png", Array[Byte](10, 11, 12, 13)),
      (1L, "img1.png", Array[Byte](20, 21)),
      (2L, "img2.png", Array[Byte](30)) // no ground-truth boxes
    ).toDF("id", "source_ref", "image")
    val boxes = Seq(
      ("img0.png", 3L, 0.1, 0.2, 0.5, 0.6),
      ("img0.png", 1L, 0.3, 0.4, 0.7, 0.8),
      ("img1.png", 2L, 0.0, 0.0, 1.0, 1.0)
    ).toDF("source_ref", "class_id", "xmin", "ymin", "xmax", "ymax")

    val out = Files.createTempDirectory("wds").toString
    TarShards.write(TarShards.trainingSamples(spark, images, boxes).repartition(2), out)

    val back = TarShards.read(spark, out).collect().sortBy(_.key)
    assert(back.map(_.key).toSeq === Seq("000000000", "000000001", "000000002"))
    assert(back(0).payload.toSeq === Seq[Byte](10, 11, 12, 13))
    assert(back(0).ext === "png")
    // deterministic JSON: sorted box array, class 1 before class 3
    assert(back(0).json.contains(""""boxes":[{"class_id":1"""))
    assert(back(0).json.contains(""""class_id":3"""))
    assert(back(1).json.contains(""""class_id":2"""))
    assert(back(2).json.contains(""""boxes":[]"""))
    assert(back(2).payload.toSeq === Seq[Byte](30))
  }
}
