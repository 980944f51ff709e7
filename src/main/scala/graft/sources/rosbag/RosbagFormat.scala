package graft.sources.rosbag

import java.io.{ByteArrayInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream

/** ROS bag v2.0 record grammar (public format; semantics mirror the
  * reference's streaming parser, /root/reference/service/app/bagstream.py:80-210).
  *
  * A bag is `#ROSBAG V2.0\n` followed by records:
  * `[u32 header_len][header fields][u32 data_len][data]`, each header field
  * `[u32 field_len]"name="[value bytes]`. Record kinds by `op` byte:
  * 2=message, 3=bag header, 4=index, 5=chunk (nested records, optionally
  * bz2), 6=chunk info, 7=connection.
  *
  * Parsing is STREAMING: `iterator` consumes an InputStream and holds at
  * most one chunk (rosbag chunks are ~1 MB by default) plus one message in
  * memory, so multi-GB bags never materialize — the 100 TB path
  * (SURVEY.md §4). A truncated tail (corrupt upload) ends the iteration
  * with everything demuxed so far instead of killing the task.
  */
object RosbagFormat {

  final case class Connection(id: Int, topic: String, datatype: String, msgDef: String)

  /** One demuxed message: connection metadata + receive time + raw ROS
    * serialization. */
  final case class BagMessage(topic: String, datatype: String, timeNs: Long, data: Array[Byte], msgDef: String = "")

  private def readU32(in: DataInputStream): Long = {
    val b = new Array[Byte](4)
    in.readFully(b)
    (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)
  }

  /** Header fields as raw bytes keyed by name. */
  private def readHeader(in: DataInputStream, headerLen: Long): Map[String, Array[Byte]] = {
    var remaining = headerLen
    val fields = Map.newBuilder[String, Array[Byte]]
    while (remaining > 0) {
      val fieldLen = readU32(in)
      val buf = new Array[Byte](fieldLen.toInt)
      in.readFully(buf)
      val eq = buf.indexOf('='.toByte)
      require(eq >= 0, "malformed bag header field (no '=')")
      val name = new String(buf, 0, eq, StandardCharsets.ISO_8859_1)
      fields += name -> java.util.Arrays.copyOfRange(buf, eq + 1, buf.length)
      remaining -= fieldLen + 4
    }
    fields.result()
  }

  private def leInt(b: Array[Byte]): Int =
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)

  /** ROS time field: u32 sec, u32 nsec (little-endian) -> epoch nanos. */
  private def leTimeNs(b: Array[Byte]): Long = {
    val sec = (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)
    val nsec = (b(4) & 0xffL) | ((b(5) & 0xffL) << 8) | ((b(6) & 0xffL) << 16) | ((b(7) & 0xffL) << 24)
    sec * 1000000000L + nsec
  }

  private def str(b: Array[Byte]): String = new String(b, StandardCharsets.ISO_8859_1)

  /** Read and validate the `#ROSBAG V2.0\n` magic line from a stream. */
  private def readMagic(in: DataInputStream): Unit = {
    val sb = new StringBuilder
    var c = in.read()
    while (c >= 0 && c != '\n' && sb.length < 64) {
      sb.append(c.toChar)
      c = in.read()
    }
    require(sb.toString.contains("V2.0"), "unsupported bag version (only V2.0)")
  }

  /** Streaming demux of one bag. Memory: one chunk + one message. */
  def iterator(raw: InputStream): Iterator[BagMessage] = new Iterator[BagMessage] {
    private val outer = new DataInputStream(raw)
    private val connections = scala.collection.mutable.Map[Int, Connection]()
    // top of stack = currently-draining chunk stream; bottom = outer stream
    private var stack: List[DataInputStream] = List(outer)
    private var nextMsg: BagMessage = _

    readMagic(outer)
    advance()

    override def hasNext: Boolean = nextMsg != null

    override def next(): BagMessage = {
      val m = nextMsg
      advance()
      m
    }

    private def advance(): Unit = {
      nextMsg = null
      while (nextMsg == null && stack.nonEmpty) {
        try advanceStep()
        catch {
          case _: EOFException =>
            // mid-record EOF: a corrupt chunk is skipped (outer stream
            // continues with the next record); a truncated outer stream
            // ends the parse with everything demuxed so far — a damaged
            // bag yields its good prefix, not a dead task
            stack = if (stack.lengthCompare(1) > 0) stack.tail else Nil
        }
      }
    }

    /** Consume exactly one record from the top stream (or pop it on clean
      * end-of-stream); may set nextMsg or push a chunk stream. */
    private def advanceStep(): Unit = {
        val in = stack.head
        val headerLen =
          try readU32(in)
          catch { case _: EOFException => stack = stack.tail; -1L }
        if (headerLen == 0) stack = stack.tail
        else if (headerLen > 0) {
          val header = readHeader(in, headerLen)
          val dataLen = readU32(in).toInt
          val op = header.get("op").map(b => b(0) & 0xff).getOrElse(-1)
          op match {
            case 5 => // chunk: push its (bounded) record stream
              val data = new Array[Byte](dataLen)
              in.readFully(data)
              val compression = header.get("compression").map(str).getOrElse("none")
              val chunkIn: InputStream = compression match {
                case "bz2"  => new BZip2CompressorInputStream(new ByteArrayInputStream(data))
                // `rosbag record --lz4` (roslz4) writes standard LZ4 FRAME
                // format inside each chunk (magic 0x184D2204 + 64 KiB
                // independent blocks) — the common AV-logging default
                case "lz4"  => new net.jpountz.lz4.LZ4FrameInputStream(new ByteArrayInputStream(data))
                case "none" => new ByteArrayInputStream(data)
                case other  => // never parse compressed bytes as records
                  throw new IllegalArgumentException(
                    s"unsupported chunk compression: $other (only none/bz2/lz4)")
              }
              stack = new DataInputStream(chunkIn) :: stack
            case 7 => // connection: data section holds the connection header
              val data = new Array[Byte](dataLen)
              in.readFully(data)
              val connHeader = readHeader(new DataInputStream(new ByteArrayInputStream(data)), dataLen.toLong)
              val id = leInt(header("conn"))
              connections(id) = Connection(id, str(connHeader("topic")), str(connHeader("type")),
                connHeader.get("message_definition").map(str).getOrElse(""))
            case 2 => // message data
              val data = new Array[Byte](dataLen)
              in.readFully(data)
              val t = leTimeNs(header("time"))
              connections.get(leInt(header("conn"))).foreach { c =>
                nextMsg = BagMessage(c.topic, c.datatype, t, data, c.msgDef)
              }
            case _ => // bag header (3), index (4), chunk info (6): skip payload
              var toSkip = dataLen
              while (toSkip > 0) {
                val skipped = in.skipBytes(toSkip)
                if (skipped <= 0) throw new EOFException()
                toSkip -= skipped
              }
          }
        }
    }
  }

  /** Convenience: parse a whole in-memory bag (tests, small files). */
  def parse(bytes: Array[Byte]): Seq[BagMessage] =
    iterator(new ByteArrayInputStream(bytes)).toSeq
}
