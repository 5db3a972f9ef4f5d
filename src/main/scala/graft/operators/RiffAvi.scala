package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal RIFF/AVI frame container codec — the video half of the
  * multimodal surface, real and dependency-free: AVI is an openly
  * documented RIFF form (the `hdrl`/`movi` LIST layout of the
  * Microsoft AVI specification), and frame EXTRACTION is pure chunk
  * walking — `00dc`/`00db` chunk payloads inside `LIST movi` — which
  * needs no codec library. Per-frame pixel decode then goes through
  * [[Multimodal.ImageIoCodec]] (the JDK decodes the frame payloads:
  * the MJPEG convention stores one JPEG per `00dc` chunk; the fixture
  * path stores lossless gray PNGs, which is what lets a SQL oracle
  * recompute per-frame luminance sums bit-exactly).
  *
  * Scale notes: [[frames]] walks chunk HEADERS and slices payloads —
  * no pixel work — so frame sampling at 100 TB reads container
  * structure only; decode cost is paid per SELECTED frame.
  */
object RiffAvi {

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc(id))
    bos.write(u32(payload.length.toLong))
    bos.write(payload)
    if (payload.length % 2 == 1) bos.write(0) // RIFF chunks pad to even
    bos.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc("LIST"))
    bos.write(u32(4L + body.length))
    bos.write(fourcc(listType))
    bos.write(body)
    bos.toByteArray
  }

  /** One AVI with the given frame payloads (each an ImageIO-decodable
    * image, conventionally JPEG for MJPEG; the fixtures use lossless
    * PNG). Header fields carry the declared dims/fps; frame payloads
    * are authoritative for pixel content.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 25): Array[Byte] = {
    require(fps > 0, s"bad fps $fps")
    // avih: 56-byte main header (microseconds/frame, flags, total
    // frames, initial frames, streams, suggested buffer, dims, reserved)
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps); b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(frames.length); b.putInt(0); b.putInt(1); b.putInt(0)
      b.putInt(width); b.putInt(height)
      b.array()
    }
    // strh: 56-byte stream header ('vids' + MJPG handler, scale/rate =
    // 1/fps, length = frame count)
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")); b.put(fourcc("MJPG"))
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(1); b.putInt(fps); b.putInt(0); b.putInt(frames.length)
      b.putInt(0); b.putInt(-1); b.putInt(0); b.putLong(0L)
      b.array()
    }
    // strf: 40-byte BITMAPINFOHEADER
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40); b.putInt(width); b.putInt(height)
      b.putShort(1); b.putShort(24); b.put(fourcc("MJPG"))
      b.putInt(width * height * 3); b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc("RIFF"))
    bos.write(u32(body.length.toLong))
    bos.write(body)
    bos.toByteArray
  }

  /** Frame payloads of a RIFF/AVI container: every `00dc`/`00db` chunk
    * inside `LIST movi`, in stream order. None when the bytes are not
    * a well-formed RIFF/AVI (the corrupt-input fallback) or contain no
    * movi list.
    */
  def frames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    def cc(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def len(off: Int): Long =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
    if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val riffEnd = math.min(8L + len(4), bytes.length.toLong)

    val out = Vector.newBuilder[Array[Byte]]
    var found = false
    def walk(start: Long, end: Long, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = cc(off.toInt)
        val size = len(off.toInt + 4)
        val payload = off + 8
        if (payload + size > end) return // truncated chunk: stop cleanly
        if (id == "LIST" && size >= 4) {
          val listType = cc(payload.toInt)
          if (listType == "movi") found = true
          walk(payload + 4, payload + size, inMovi || listType == "movi")
        } else if (inMovi && (id == "00dc" || id == "00db") && size > 0) {
          out += java.util.Arrays.copyOfRange(bytes, payload.toInt, (payload + size).toInt)
        }
        off = payload + size + (size % 2) // skip pad byte
      }
    }
    try walk(12L, riffEnd, inMovi = false)
    catch { case scala.util.control.NonFatal(_) => return None }
    if (!found) None else Some(out.result())
  }
}
