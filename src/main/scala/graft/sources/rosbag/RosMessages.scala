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

  def wrench(data: Array[Byte]): WrenchMsg = {
    val b = buf(data)
    WrenchMsg(b.getDouble, b.getDouble, b.getDouble, b.getDouble, b.getDouble, b.getDouble)
  }

  /** std_msgs with a single primitive `data` slot. */
  def stdString(data: Array[Byte]): String = readString(buf(data))
  def stdInt32(data: Array[Byte]): Int = buf(data).getInt
  def stdFloat64(data: Array[Byte]): Double = buf(data).getDouble
}
