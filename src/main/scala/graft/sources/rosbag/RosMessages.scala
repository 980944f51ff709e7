package graft.sources.rosbag

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal ROS 1 message deserializers for the types the reference extracts
  * (bagstream.py:379-384 process_message_map), from the public ROS msg
  * layouts: little-endian primitives, strings/arrays length-prefixed u32.
  */
object RosMessages {

  final case class RosHeader(seq: Long, stampNs: Long, frameId: String)

  final case class ImageMsg(
      header: RosHeader, height: Long, width: Long, encoding: String,
      isBigendian: Int, step: Long, data: Array[Byte])

  /** sensor_msgs/CompressedImage: header, format string ("png", "jpeg",
    * or PIL-style "bgr8; png compressed bgr8"), length-prefixed payload —
    * the topic type bandwidth-limited rigs actually record (the raw Image
    * layout above is what the reference's bagstream.py:249 handles; the
    * compressed twin is the same header + an opaque codec payload).
    */
  final case class CompressedImageMsg(header: RosHeader, format: String, data: Array[Byte])

  final case class LaserScanMsg(
      header: RosHeader, angleMin: Float, angleMax: Float, angleIncrement: Float,
      timeIncrement: Float, scanTime: Float, rangeMin: Float, rangeMax: Float,
      ranges: Array[Float], intensities: Array[Float])

  final case class OdometryMsg(
      header: RosHeader, childFrameId: String,
      posX: Double, posY: Double, posZ: Double,
      oriX: Double, oriY: Double, oriZ: Double, oriW: Double,
      twistLinX: Double, twistLinY: Double, twistLinZ: Double,
      twistAngX: Double, twistAngY: Double, twistAngZ: Double)

  final case class WrenchMsg(
      forceX: Double, forceY: Double, forceZ: Double,
      torqueX: Double, torqueY: Double, torqueZ: Double)

  /** sensor_msgs/PointField: one channel of a PointCloud2's packed point
    * record. `datatype` is the ROS constant (INT8=1 … FLOAT64=8). */
  final case class PointField(name: String, offset: Long, datatype: Int, count: Long)

  /** sensor_msgs/PointCloud2 — the lidar/radar topic type AV rigs record
    * (the reference demuxes cameras only; point clouds are the other half
    * of an AV lake's sensor volume). Points stay a packed opaque byte
    * array here; [[RosbagReader.pointCloudPoints]] unpacks per-point rows
    * through the self-describing `fields` table.
    */
  final case class PointCloud2Msg(
      header: RosHeader, height: Long, width: Long, fields: Seq[PointField],
      isBigendian: Boolean, pointStep: Long, rowStep: Long,
      data: Array[Byte], isDense: Boolean)

  private def buf(data: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)

  private def readString(b: ByteBuffer): String = {
    val len = b.getInt
    val arr = new Array[Byte](len)
    b.get(arr)
    new String(arr, StandardCharsets.UTF_8)
  }

  private def readHeaderMsg(b: ByteBuffer): RosHeader = {
    val seq = b.getInt.toLong & 0xffffffffL
    val sec = b.getInt.toLong & 0xffffffffL
    val nsec = b.getInt.toLong & 0xffffffffL
    RosHeader(seq, sec * 1000000000L + nsec, readString(b))
  }

  private def readFloatArray(b: ByteBuffer): Array[Float] = {
    val n = b.getInt
    Array.fill(n)(b.getFloat)
  }

  def image(data: Array[Byte]): ImageMsg = {
    val b = buf(data)
    val h = readHeaderMsg(b)
    val height = b.getInt.toLong & 0xffffffffL
    val width = b.getInt.toLong & 0xffffffffL
    val encoding = readString(b)
    val isBig = b.get() & 0xff
    val step = b.getInt.toLong & 0xffffffffL
    val len = b.getInt
    val px = new Array[Byte](len)
    b.get(px)
    ImageMsg(h, height, width, encoding, isBig, step, px)
  }

  def compressedImage(data: Array[Byte]): CompressedImageMsg = {
    val b = buf(data)
    val h = readHeaderMsg(b)
    val format = readString(b)
    val len = b.getInt
    val payload = new Array[Byte](len)
    b.get(payload)
    CompressedImageMsg(h, format, payload)
  }

  def laserScan(data: Array[Byte]): LaserScanMsg = {
    val b = buf(data)
    val h = readHeaderMsg(b)
    LaserScanMsg(h, b.getFloat, b.getFloat, b.getFloat, b.getFloat, b.getFloat,
      b.getFloat, b.getFloat, readFloatArray(b), readFloatArray(b))
  }

  def odometry(data: Array[Byte]): OdometryMsg = {
    val b = buf(data)
    val h = readHeaderMsg(b)
    val child = readString(b)
    val px = b.getDouble; val py = b.getDouble; val pz = b.getDouble
    val ox = b.getDouble; val oy = b.getDouble; val oz = b.getDouble; val ow = b.getDouble
    b.position(b.position() + 36 * 8) // pose covariance float64[36]
    val lx = b.getDouble; val ly = b.getDouble; val lz = b.getDouble
    val ax = b.getDouble; val ay = b.getDouble; val az = b.getDouble
    OdometryMsg(h, child, px, py, pz, ox, oy, oz, ow, lx, ly, lz, ax, ay, az)
  }

  def pointCloud2(data: Array[Byte]): PointCloud2Msg = {
    val b = buf(data)
    val h = readHeaderMsg(b)
    val height = b.getInt.toLong & 0xffffffffL
    val width = b.getInt.toLong & 0xffffffffL
    val nFields = b.getInt
    val fields = Seq.fill(nFields) {
      val name = readString(b)
      val offset = b.getInt.toLong & 0xffffffffL
      val dt = b.get() & 0xff
      val count = b.getInt.toLong & 0xffffffffL
      PointField(name, offset, dt, count)
    }
    val isBig = (b.get() & 0xff) != 0
    val pointStep = b.getInt.toLong & 0xffffffffL
    val rowStep = b.getInt.toLong & 0xffffffffL
    val len = b.getInt
    val pts = new Array[Byte](len)
    b.get(pts)
    val isDense = (b.get() & 0xff) != 0
    PointCloud2Msg(h, height, width, fields, isBig, pointStep, rowStep, pts, isDense)
  }

  /** One endian-ordered view over a cloud's point payload — created ONCE
    * per cloud and passed into the per-point loop (the loop reads
    * ~channels × points values; wrapping a fresh buffer per read was ~4
    * allocations per point on a path documented as a ~100× row fan-out).
    * The wire header/metadata layer is always little-endian; only the
    * point PAYLOAD honors the cloud's is_bigendian flag.
    */
  private[rosbag] def pointBuffer(data: Array[Byte], bigendian: Boolean): ByteBuffer =
    ByteBuffer.wrap(data)
      .order(if (bigendian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)

  /** Read one numeric channel value at `base + field.offset` from a packed
    * point record, by the PointField datatype constant, via absolute gets
    * on a [[pointBuffer]] (no per-read allocation, thread-confined to the
    * decoding task).
    */
  private[rosbag] def pointValue(b: ByteBuffer, base: Int, f: PointField): Double = {
    val p = base + f.offset.toInt
    f.datatype match {
      case 1 => b.get(p).toDouble                      // INT8
      case 2 => (b.get(p) & 0xff).toDouble             // UINT8
      case 3 => b.getShort(p).toDouble                 // INT16
      case 4 => (b.getShort(p) & 0xffff).toDouble      // UINT16
      case 5 => b.getInt(p).toDouble                   // INT32
      case 6 => (b.getInt(p).toLong & 0xffffffffL).toDouble // UINT32
      case 7 => b.getFloat(p).toDouble                 // FLOAT32
      case 8 => b.getDouble(p)                         // FLOAT64
      case other => throw new IllegalArgumentException(
        s"PointField ${f.name}: unknown datatype constant $other")
    }
  }

  def wrench(data: Array[Byte]): WrenchMsg = {
    val b = buf(data)
    WrenchMsg(b.getDouble, b.getDouble, b.getDouble, b.getDouble, b.getDouble, b.getDouble)
  }

  /** std_msgs with a single primitive `data` slot. */
  def stdString(data: Array[Byte]): String = readString(buf(data))
  def stdInt32(data: Array[Byte]): Int = buf(data).getInt
  def stdFloat64(data: Array[Byte]): Double = buf(data).getDouble

  /** audio_common_msgs/AudioInfo — the stream-description message the
    * audio_capture node publishes once beside its data topic (public
    * audio_common layout: channels, sample_rate, sample_format, bitrate,
    * coding_format). The microphone half of an AV rig's recording; the
    * reference extracts cameras only (bagstream.py:246), so this is
    * beyond-parity like PointCloud2.
    */
  final case class AudioInfoMsg(channels: Long, sampleRate: Long,
      sampleFormat: String, bitrate: Long, codingFormat: String)

  def audioInfo(data: Array[Byte]): AudioInfoMsg = {
    val b = buf(data)
    // AudioInfo.msg declares `uint8 channels` — a single byte, NOT a u32.
    // Reading 4 bytes here shifted every later field by 3 and made real
    // audio_capture bags unparseable (garbage string lengths).
    val channels = b.get.toLong & 0xffL
    val rate = b.getInt.toLong & 0xffffffffL
    val fmt = readString(b)
    val bitrate = b.getInt.toLong & 0xffffffffL
    AudioInfoMsg(channels, rate, fmt, bitrate, readString(b))
  }

  /** audio_common_msgs/AudioData: one length-prefixed sample buffer
    * (`uint8[] data`). */
  def audioData(data: Array[Byte]): Array[Byte] = {
    val b = buf(data)
    val len = b.getInt
    val out = new Array[Byte](len)
    b.get(out)
    out
  }

  /** audio_common_msgs/AudioDataStamped: std_msgs/Header + AudioData. */
  def audioDataStamped(data: Array[Byte]): (RosHeader, Array[Byte]) = {
    val b = buf(data)
    val h = readHeaderMsg(b)
    val len = b.getInt
    val out = new Array[Byte](len)
    b.get(out)
    (h, out)
  }
}
