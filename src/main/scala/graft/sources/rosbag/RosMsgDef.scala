package graft.sources.rosbag

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Dynamic ROS 1 message deserialization from the connection's
  * `message_definition` header — the reference's generic slot-walk
  * (`process_topic`, bagstream.py:322) re-expressed: any topic whose type we
  * did not hand-code still lands as a typed row of (path -> value) pairs,
  * with fixed arrays exploded to `name_0..name_k` exactly like the
  * reference's tuple slots.
  *
  * The definition text is the public concatenated-gendeps format: the root
  * message's fields, then `====` separators each followed by
  * `MSG: <full/type>` and that dependency's fields.
  */
object RosMsgDef {

  final case class Field(typ: String, name: String, isArray: Boolean, fixedLen: Int)

  /** Parse definition text into type -> fields, keyed by full and short
    * type names.
    */
  def parse(rootType: String, definition: String): Map[String, Seq[Field]] = {
    val sections = definition.split("\n=+\n").toSeq
    def fieldsOf(lines: Seq[String]): Seq[Field] =
      lines
        .map(_.replaceAll("#.*$", "").trim)
        .filter(l => l.nonEmpty && !l.contains("=")) // skip blanks + constants
        .flatMap { l =>
          l.split("\\s+", 2) match {
            case Array(t, n) =>
              val arr = t.contains("[")
              val fixed =
                if (!arr) -1
                else {
                  val inner = t.substring(t.indexOf('[') + 1, t.indexOf(']'))
                  if (inner.isEmpty) -1 else inner.toInt
                }
              Some(Field(t.replaceAll("\\[.*\\]", ""), n.trim, arr, fixed))
            case _ => None
          }
        }
    val types = Map.newBuilder[String, Seq[Field]]
    sections.zipWithIndex.foreach { case (sec, i) =>
      val lines = sec.split("\n").toSeq
      if (i == 0) {
        val fs = fieldsOf(lines)
        types += rootType -> fs
        types += rootType.split("/").last -> fs
      } else {
        lines.find(_.startsWith("MSG:")) match {
          case Some(msgLine) =>
            val full = msgLine.stripPrefix("MSG:").trim
            val fs = fieldsOf(lines.dropWhile(!_.startsWith("MSG:")).drop(1))
            types += full -> fs
            types += full.split("/").last -> fs
          case None =>
        }
      }
    }
    types.result()
  }

  private val primitiveSizes: Map[String, Int] = Map(
    "bool" -> 1, "byte" -> 1, "char" -> 1, "int8" -> 1, "uint8" -> 1,
    "int16" -> 2, "uint16" -> 2, "int32" -> 4, "uint32" -> 4,
    "int64" -> 8, "uint64" -> 8, "float32" -> 4, "float64" -> 8,
    "time" -> 8, "duration" -> 8)

  private def readPrimitive(typ: String, b: ByteBuffer): String = typ match {
    case "bool"              => (b.get() != 0).toString
    case "byte" | "int8"     => b.get().toString
    case "char" | "uint8"    => (b.get() & 0xff).toString
    case "int16"             => b.getShort.toString
    case "uint16"            => (b.getShort & 0xffff).toString
    case "int32"             => b.getInt.toString
    case "uint32"            => (b.getInt.toLong & 0xffffffffL).toString
    case "int64" | "uint64"  => b.getLong.toString
    case "float32"           => b.getFloat.toString
    case "float64"           => b.getDouble.toString
    case "time" | "duration" =>
      val sec = b.getInt.toLong & 0xffffffffL
      val nsec = b.getInt.toLong & 0xffffffffL
      (sec * 1000000000L + nsec).toString
    case "string" =>
      val len = b.getInt
      val arr = new Array[Byte](len)
      b.get(arr)
      new String(arr, StandardCharsets.UTF_8)
  }

  /** Deserialize a payload into flattened (slot-path, value) pairs. */
  def deserialize(rootType: String, types: Map[String, Seq[Field]], data: Array[Byte]): Seq[(String, String)] = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[(String, String)]

    def walk(typ: String, prefix: String): Unit =
      types.get(typ).orElse(types.get(typ.split("/").last)) match {
        case Some(fields) =>
          fields.foreach { f =>
            val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
            if (!f.isArray) emit(f.typ, name)
            else {
              val n = if (f.fixedLen >= 0) f.fixedLen else b.getInt
              // explode like the reference's tuple slots: name_0..name_k
              (0 until n).foreach(i => emit(f.typ, s"${name}_$i"))
            }
          }
        case None => // unknown nested type: cannot continue safely
          throw new IllegalArgumentException(s"unresolved message type: $typ")
      }

    def emit(typ: String, name: String): Unit =
      if (primitiveSizes.contains(typ) || typ == "string")
        out += name -> readPrimitive(typ, b)
      else walk(typ, name)

    walk(rootType, "")
    out.result()
  }
}
