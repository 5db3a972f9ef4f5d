package graft.cypher

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** PackStream — the openly specified serialization format of Neo4j's
  * Bolt protocol (public docs: the "PackStream" specification; same
  * wire markers in every bolt driver). Implemented from the public
  * spec, subset sufficient for the write path: Null, Boolean, Integer,
  * Float, String, List, Map (string keys), Structure.
  *
  * Values map to/from plain Scala: `null`, `Boolean`, `Long` (all
  * integer widths decode to Long), `Double`, `String`, `Seq[Any]`,
  * `Map[String, Any]`, and [[PackStream.Structure]].
  */
object PackStream {

  /** A PackStream structure: one tag byte + up to 15 fields. Bolt
    * messages (HELLO, RUN, SUCCESS, …) are structures.
    */
  final case class Structure(tag: Byte, fields: Seq[Any])

  def pack(value: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    write(new DataOutputStream(bos), value)
    bos.toByteArray
  }

  def write(out: DataOutputStream, value: Any): Unit = value match {
    case null           => out.writeByte(0xC0)
    case b: Boolean     => out.writeByte(if (b) 0xC3 else 0xC2)
    case i: Int         => write(out, i.toLong)
    case s: Short       => write(out, s.toLong)
    case b: Byte        => write(out, b.toLong)
    case l: Long =>
      if (l >= -16L && l <= 127L) out.writeByte(l.toInt)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) { out.writeByte(0xC8); out.writeByte(l.toInt) }
      else if (l >= Short.MinValue && l <= Short.MaxValue) { out.writeByte(0xC9); out.writeShort(l.toInt) }
      else if (l >= Int.MinValue && l <= Int.MaxValue) { out.writeByte(0xCA); out.writeInt(l.toInt) }
      else { out.writeByte(0xCB); out.writeLong(l) }
    case d: Double      => out.writeByte(0xC1); out.writeLong(java.lang.Double.doubleToLongBits(d))
    case f: Float       => write(out, f.toDouble)
    case s: String =>
      val bytes = s.getBytes(UTF_8)
      if (bytes.length < 16) out.writeByte(0x80 | bytes.length)
      else if (bytes.length < 256) { out.writeByte(0xD0); out.writeByte(bytes.length) }
      else if (bytes.length < 65536) { out.writeByte(0xD1); out.writeShort(bytes.length) }
      else { out.writeByte(0xD2); out.writeInt(bytes.length) }
      out.write(bytes)
    case xs: Seq[_] =>
      if (xs.length < 16) out.writeByte(0x90 | xs.length)
      else if (xs.length < 256) { out.writeByte(0xD4); out.writeByte(xs.length) }
      else if (xs.length < 65536) { out.writeByte(0xD5); out.writeShort(xs.length) }
      else { out.writeByte(0xD6); out.writeInt(xs.length) }
      xs.foreach(write(out, _))
    case m: Map[_, _] =>
      if (m.size < 16) out.writeByte(0xA0 | m.size)
      else if (m.size < 256) { out.writeByte(0xD8); out.writeByte(m.size) }
      else if (m.size < 65536) { out.writeByte(0xD9); out.writeShort(m.size) }
      else { out.writeByte(0xDA); out.writeInt(m.size) }
      m.foreach { case (k, v) => write(out, k.toString); write(out, v) }
    case Structure(tag, fields) =>
      require(fields.length < 16, s"structure arity ${fields.length} exceeds PackStream's 15")
      out.writeByte(0xB0 | fields.length)
      out.writeByte(tag.toInt)
      fields.foreach(write(out, _))
    case other =>
      throw new IllegalArgumentException(s"cannot pack ${other.getClass.getName}")
  }

  def unpack(bytes: Array[Byte]): Any =
    read(new DataInputStream(new java.io.ByteArrayInputStream(bytes)))

  def read(in: DataInputStream): Any = {
    val marker = in.readUnsignedByte()
    marker match {
      case 0xC0                      => null
      case 0xC2                      => false
      case 0xC3                      => true
      case 0xC1                      => java.lang.Double.longBitsToDouble(in.readLong())
      case 0xC8                      => in.readByte().toLong
      case 0xC9                      => in.readShort().toLong
      case 0xCA                      => in.readInt().toLong
      case 0xCB                      => in.readLong()
      case m if m < 0x80             => m.toLong                       // tiny positive int
      case m if m >= 0xF0            => (m - 0x100).toLong             // tiny negative int
      case m if (m & 0xF0) == 0x80   => readString(in, m & 0x0F)
      case 0xD0                      => readString(in, in.readUnsignedByte())
      case 0xD1                      => readString(in, in.readUnsignedShort())
      case 0xD2                      => readString(in, in.readInt())
      case m if (m & 0xF0) == 0x90   => readList(in, m & 0x0F)
      case 0xD4                      => readList(in, in.readUnsignedByte())
      case 0xD5                      => readList(in, in.readUnsignedShort())
      case 0xD6                      => readList(in, in.readInt())
      case m if (m & 0xF0) == 0xA0   => readMap(in, m & 0x0F)
      case 0xD8                      => readMap(in, in.readUnsignedByte())
      case 0xD9                      => readMap(in, in.readUnsignedShort())
      case 0xDA                      => readMap(in, in.readInt())
      case m if (m & 0xF0) == 0xB0   =>
        val tag = in.readByte()
        Structure(tag, (0 until (m & 0x0F)).map(_ => read(in)))
      case other =>
        throw new IllegalArgumentException(f"unsupported PackStream marker 0x$other%02X")
    }
  }

  private def readString(in: DataInputStream, n: Int): String = {
    val buf = new Array[Byte](n)
    in.readFully(buf)
    new String(buf, UTF_8)
  }
  private def readList(in: DataInputStream, n: Int): Seq[Any] =
    (0 until n).map(_ => read(in))
  private def readMap(in: DataInputStream, n: Int): Map[String, Any] =
    (0 until n).map { _ =>
      val k = read(in) match {
        case s: String => s
        case other     => throw new IllegalArgumentException(s"non-string map key: $other")
      }
      k -> read(in)
    }.toMap
}
