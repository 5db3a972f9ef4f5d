package graft.cypher

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

/** Minimal Bolt wire protocol (openly specified by Neo4j: handshake,
  * chunked message framing, PackStream-encoded message structures) —
  * the write-path subset the Cypher export pipeline needs: HELLO, RUN,
  * PULL, GOODBYE, and the SUCCESS / FAILURE / RECORD / IGNORED
  * responses. Implemented from the public protocol documents; a real
  * Neo4j 4.x+ server negotiating version 4.4 speaks exactly these
  * frames.
  */
object Bolt {

  val Magic: Array[Byte] = Array(0x60, 0x60, 0xB0, 0x17).map(_.toByte)

  // message tags (public protocol constants)
  val HELLO: Byte = 0x01
  val GOODBYE: Byte = 0x02
  val RESET: Byte = 0x0F
  val RUN: Byte = 0x10
  val PULL: Byte = 0x3F
  val SUCCESS: Byte = 0x70
  val RECORD: Byte = 0x71
  val IGNORED: Byte = 0x7E
  val FAILURE: Byte = 0x7F

  /** Write one message as chunked frames: [uint16 size][bytes]… 0x0000. */
  def writeMessage(out: DataOutputStream, msg: PackStream.Structure): Unit = {
    val bytes = PackStream.pack(msg)
    var off = 0
    while (off < bytes.length) {
      val n = math.min(bytes.length - off, 0xFFFF)
      out.writeShort(n)
      out.write(bytes, off, n)
      off += n
    }
    out.writeShort(0)
    out.flush()
  }

  /** Read one chunked message (blocks; None on orderly stream end). */
  def readMessage(in: DataInputStream): Option[PackStream.Structure] = {
    val buf = new ByteArrayOutputStream()
    var first = true
    while (true) {
      val size =
        try in.readUnsignedShort()
        catch { case _: java.io.EOFException if first => return None }
      first = false
      if (size == 0) {
        if (buf.size == 0) {
          // NOOP keep-alive chunk (0x0000 between messages) — skip
          first = true
        } else {
          return PackStream.unpack(buf.toByteArray) match {
            case s: PackStream.Structure => Some(s)
            case other => throw new IllegalStateException(s"non-structure message: $other")
          }
        }
      } else {
        val chunk = new Array[Byte](size)
        in.readFully(chunk)
        buf.write(chunk)
      }
    }
    None // unreachable
  }

  /** Client side of the version handshake: propose 4.4 (and only 4.4 —
    * the subset implemented here), return the server's choice.
    */
  def clientHandshake(out: DataOutputStream, in: DataInputStream): Int = {
    out.write(Magic)
    out.writeInt(0x00000404) // 4.4
    out.writeInt(0)
    out.writeInt(0)
    out.writeInt(0)
    out.flush()
    val agreed = in.readInt()
    require(agreed == 0x00000404, f"bolt server proposed unsupported version 0x$agreed%08X")
    agreed
  }
}

/** Live [[CypherSession]] over a real Bolt TCP connection — the wire
  * client the reference's write path drives through the neo4j python
  * driver (database/export/cypher.py:89-176). One session = one
  * socket; `run` is RUN + PULL(-1) with strict SUCCESS checking, so a
  * server-side failure surfaces as an exception instead of silently
  * dropping writes. Use with [[CypherExecutor.runDistributed]] via a
  * factory closing over (host, port, auth) — each task opens its own
  * connection, exactly the per-partition shape a cluster write needs.
  *
  * Auth subset: `scheme: "none"` or `basic` (principal/credentials) —
  * enough for the loopback server double in BoltSpec and for a real
  * server with auth disabled; token schemes drop in by extending the
  * HELLO map.
  */
final class BoltCypherSession(
    host: String,
    port: Int,
    user: Option[String] = None,
    password: Option[String] = None,
    timeoutMillis: Int = 120000,
) extends CypherSession {

  private val socket = new Socket()
  // bounded connect AND read timeouts: a hung endpoint (accepting TCP
  // but never answering) must fail the task, not block an executor
  // forever mid-handshake or mid-PULL
  socket.connect(new java.net.InetSocketAddress(host, port), timeoutMillis)
  socket.setSoTimeout(timeoutMillis)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))
  private val in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))

  Bolt.clientHandshake(out, in)
  locally {
    val auth: Map[String, Any] = user match {
      case Some(u) => Map("scheme" -> "basic", "principal" -> u,
        "credentials" -> password.getOrElse(""))
      case None => Map("scheme" -> "none")
    }
    Bolt.writeMessage(out, PackStream.Structure(Bolt.HELLO,
      Seq(Map("user_agent" -> "graft/0.1") ++ auth)))
    expectSuccess("HELLO")
  }

  override def run(statement: String): Unit = {
    Bolt.writeMessage(out, PackStream.Structure(Bolt.RUN,
      Seq(statement, Map.empty[String, Any], Map.empty[String, Any])))
    expectSuccess(s"RUN ${statement.take(60)}")
    Bolt.writeMessage(out, PackStream.Structure(Bolt.PULL,
      Seq(Map("n" -> -1L))))
    // drain RECORDs (write statements produce none, but stay correct
    // for RETURNing statements) until the summary
    var done = false
    while (!done) {
      Bolt.readMessage(in) match {
        case Some(PackStream.Structure(Bolt.RECORD, _)) => ()
        case Some(PackStream.Structure(Bolt.SUCCESS, _)) => done = true
        case Some(PackStream.Structure(Bolt.FAILURE, fields)) =>
          throw new IllegalStateException(s"bolt FAILURE during PULL: ${fields.headOption.getOrElse("")}")
        case Some(PackStream.Structure(Bolt.IGNORED, _)) =>
          throw new IllegalStateException("bolt IGNORED during PULL (connection in failed state)")
        case other =>
          throw new IllegalStateException(s"unexpected bolt response during PULL: $other")
      }
    }
  }

  private def expectSuccess(context: String): Unit =
    Bolt.readMessage(in) match {
      case Some(PackStream.Structure(Bolt.SUCCESS, _)) => ()
      case Some(PackStream.Structure(Bolt.FAILURE, fields)) =>
        throw new IllegalStateException(s"bolt FAILURE after $context: ${fields.headOption.getOrElse("")}")
      case other =>
        throw new IllegalStateException(s"unexpected bolt response after $context: $other")
    }

  override def close(): Unit = {
    try {
      Bolt.writeMessage(out, PackStream.Structure(Bolt.GOODBYE, Seq.empty))
    } catch { case scala.util.control.NonFatal(_) => () }
    socket.close()
  }
}

/** Serializable per-task session factory for
  * [[CypherExecutor.runDistributed]]: a compiled class holding ONLY the
  * connection coordinates, so it serializes cleanly from ANY caller —
  * notably the spark-shell, whose REPL line wrappers drag sibling
  * variables (sockets, sessions) into ad-hoc lambda closures and fail
  * task serialization.
  */
final class BoltSessionFactory(
    host: String,
    port: Int,
    user: Option[String] = None,
    password: Option[String] = None,
) extends (() => CypherSession) with Serializable {
  override def apply(): CypherSession = new BoltCypherSession(host, port, user, password)
}
