package graft.cypher

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import graft.model.{Forest, Schema}
import org.scalatest.funsuite.AnyFunSuite

/** In-process loopback Bolt SERVER double: speaks the real wire —
  * version handshake, chunked framing, PackStream messages — and
  * applies received RUN statements to a shared [[OfflineGraphSession]].
  * What the spec proves end-to-end: the [[BoltCypherSession]] CLIENT's
  * frames are a correct bolt conversation (the server parses them with
  * an independent read path), and the distributed executor really
  * drives per-task TCP connections.
  */
final class BoltServerDouble {
  val graph = new OfflineGraphSession
  val connections = new AtomicLong(0)
  @volatile var failOn: String => Boolean = _ => false

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (true) {
      val s = server.accept()
      connections.incrementAndGet()
      val t = new Thread(() => serve(s), "bolt-double-conn")
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () } // server closed
  }, "bolt-double-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = server.close()

  private def serve(socket: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    try {
      // handshake: magic + four proposals; accept only 4.4
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(magic.sameElements(Bolt.Magic), "bad bolt magic")
      val proposals = (0 until 4).map(_ => in.readInt())
      require(proposals.contains(0x00000404), s"no 4.4 proposal in $proposals")
      out.writeInt(0x00000404)
      out.flush()

      var open = true
      while (open) {
        Bolt.readMessage(in) match {
          case None | Some(PackStream.Structure(Bolt.GOODBYE, _)) =>
            open = false
          case Some(PackStream.Structure(Bolt.HELLO, _)) =>
            Bolt.writeMessage(out, PackStream.Structure(Bolt.SUCCESS,
              Seq(Map("server" -> "graft-bolt-double/0.1", "connection_id" -> "double"))))
          case Some(PackStream.Structure(Bolt.RESET, _)) =>
            Bolt.writeMessage(out, PackStream.Structure(Bolt.SUCCESS, Seq(Map.empty[String, Any])))
          case Some(PackStream.Structure(Bolt.RUN, fields)) =>
            val stmt = fields.head.asInstanceOf[String]
            if (failOn(stmt))
              Bolt.writeMessage(out, PackStream.Structure(Bolt.FAILURE,
                Seq(Map("code" -> "Neo.ClientError.Statement.SyntaxError", "message" -> "refused by double"))))
            else {
              graph.synchronized { graph.run(stmt) }
              Bolt.writeMessage(out, PackStream.Structure(Bolt.SUCCESS,
                Seq(Map("fields" -> Seq.empty[Any]))))
            }
          case Some(PackStream.Structure(Bolt.PULL, _)) =>
            Bolt.writeMessage(out, PackStream.Structure(Bolt.SUCCESS,
              Seq(Map("bookmark" -> "bm-double"))))
          case Some(other) =>
            throw new IllegalStateException(s"double got unexpected message $other")
        }
      }
    } catch { case _: java.io.IOException => () }
    finally socket.close()
  }
}

class BoltSpec extends AnyFunSuite with SparkSpec {

  test("PackStream round-trips the bolt value subset, all width tiers") {
    val values: Seq[Any] = Seq(
      null, true, false,
      0L, 7L, -1L, -16L, -17L, 127L, 128L, -129L, 32767L, 32768L,
      -2147483648L, 2147483648L, Long.MaxValue, Long.MinValue,
      1.5d, -0.25d,
      "", "hi", "x" * 15, "y" * 16, "z" * 300, "w" * 70000,
      Seq(1L, "two", Seq(3L)), (0 until 20).map(_.toLong),
      Map("a" -> 1L, "b" -> "two"),
      (0 until 20).map(i => s"k$i" -> i.toLong).toMap,
      PackStream.Structure(0x10, Seq("RETURN 1", Map.empty[String, Any])))
    values.foreach { v =>
      val back = PackStream.unpack(PackStream.pack(v))
      assert(back == v, s"round trip changed $v -> $back")
    }
  }

  test("bolt client against the wire double: hello, run, failure surfaces, goodbye") {
    val server = new BoltServerDouble
    try {
      val s = new BoltCypherSession("127.0.0.1", server.port)
      s.run("CREATE INDEX graft_oid IF NOT EXISTS FOR (n:`x`) ON (n._architxt_oid)")
      s.run("MERGE (n:`x` { _architxt_oid: 'a' }) ON CREATE SET n += { `p`: 'v' }")
      s.run("MATCH (src:`x` { _architxt_oid: 'a' }) MATCH (dest:`x` { _architxt_oid: 'a' }) " +
        "MERGE (src)-[r:`loop`]->(dest)")
      assert(server.graph.nodes.size == 1 && server.graph.edges.size == 1
        && server.graph.indexes.size == 1)

      server.failOn = _.contains("BOOM")
      val err = intercept[IllegalStateException](s.run("MERGE (n:`BOOM` { _architxt_oid: 'b' }) ON CREATE SET n += {  }"))
      assert(err.getMessage.contains("FAILURE"))
      s.close()
    } finally server.stop()
  }

  // ---- canned real-protocol fixtures -----------------------------------
  // The double above answers with frames built by OUR packer; these
  // cases instead replay HAND-DERIVED byte sequences transcribed from
  // the public Bolt/PackStream specifications — the exact bytes a real
  // server puts on the wire — so vendor-shaped negotiation and failure
  // frames are pinned without a live server.

  /** One canned-conversation server: replies to the handshake with
    * `negotiation`, then answers each subsequent chunked message with
    * the next canned response in `responses`.
    */
  private def cannedServer(
      negotiation: Array[Byte],
      responses: Seq[Array[Byte]]): (Int, () => Unit) = {
    val ss = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val s = ss.accept()
        val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
        val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
        val hs = new Array[Byte](20) // magic + 4 proposals
        in.readFully(hs)
        out.write(negotiation); out.flush()
        responses.foreach { r =>
          Bolt.readMessage(in) // consume the client's next message
          out.write(r); out.flush()
        }
        // linger for the client's GOODBYE/close
        try Bolt.readMessage(in) catch { case _: Throwable => () }
        s.close()
      } catch { case _: Throwable => () }
    }, "bolt-canned")
    t.setDaemon(true); t.start()
    (ss.getLocalPort, () => ss.close())
  }

  /** Chunked framing: [uint16 size][bytes] 0x0000 (bolt spec). */
  private def chunk(msg: Array[Byte]): Array[Byte] = {
    require(msg.length <= 0xFFFF)
    Array[Byte]((msg.length >> 8).toByte, (msg.length & 0xFF).toByte) ++
      msg ++ Array[Byte](0, 0)
  }

  private def str(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    // tiny string (0x80|len) below 16, D0+len8 below 256 — PackStream spec
    if (b.length < 16) Array((0x80 | b.length).toByte) ++ b
    else Array(0xD0.toByte, b.length.toByte) ++ b
  }

  test("canned negotiation fixtures: a 5.x pick and the no-overlap reply are rejected loudly") {
    // a server answering the 4.4-only proposal with Bolt 5.4
    // (00 00 04 05: minor 4, major 5 — the handshake's version layout)
    val (p1, stop1) = cannedServer(Array[Byte](0, 0, 4, 5), Seq.empty)
    try {
      val e1 = intercept[IllegalArgumentException](
        new BoltCypherSession("127.0.0.1", p1))
      assert(e1.getMessage.contains("0x00000405"), e1.getMessage)
    } finally stop1()
    // a real Neo4j 5-only server with no overlapping version replies
    // all-zero, per the spec ("no supported version")
    val (p2, stop2) = cannedServer(Array[Byte](0, 0, 0, 0), Seq.empty)
    try {
      val e2 = intercept[IllegalArgumentException](
        new BoltCypherSession("127.0.0.1", p2))
      assert(e2.getMessage.contains("0x00000000"), e2.getMessage)
    } finally stop2()
  }

  test("canned FAILURE and IGNORED frames surface the vendor metadata") {
    // hand-derived from the PackStream spec:
    //   SUCCESS {server:"Neo4j/4.4.42", connection_id:"bolt-1023"}
    val helloSuccess = chunk(
      Array(0xB1.toByte, Bolt.SUCCESS, 0xA2.toByte) ++
        str("server") ++ str("Neo4j/4.4.42") ++
        str("connection_id") ++ str("bolt-1023"))
    //   FAILURE {code:"Neo.ClientError.Statement.SyntaxError",
    //            message:"Invalid input 'FROB'"} — the real failure
    //   metadata shape a Neo4j server returns for a syntax error
    val failure = chunk(
      Array(0xB1.toByte, Bolt.FAILURE, 0xA2.toByte) ++
        str("code") ++ str("Neo.ClientError.Statement.SyntaxError") ++
        str("message") ++ str("Invalid input 'FROB'"))
    val (p1, stop1) = cannedServer(Array[Byte](0, 0, 4, 4),
      Seq(helloSuccess, failure))
    try {
      val s = new BoltCypherSession("127.0.0.1", p1)
      val e = intercept[IllegalStateException](s.run("FROB oops"))
      assert(e.getMessage.contains("Neo.ClientError.Statement.SyntaxError"),
        s"vendor code must reach the operator: ${e.getMessage}")
      assert(e.getMessage.contains("Invalid input 'FROB'"), e.getMessage)
      s.close()
    } finally stop1()

    //   RUN accepted (SUCCESS {fields:[]}) but PULL answered IGNORED
    //   (B0 7E — the empty-struct frame a failed-state connection sends)
    val runSuccess = chunk(
      Array(0xB1.toByte, Bolt.SUCCESS, 0xA1.toByte) ++
        str("fields") ++ Array(0x90.toByte))
    val ignored = chunk(Array(0xB0.toByte, Bolt.IGNORED))
    val (p2, stop2) = cannedServer(Array[Byte](0, 0, 4, 4),
      Seq(helloSuccess, runSuccess, ignored))
    try {
      val s = new BoltCypherSession("127.0.0.1", p2)
      val e = intercept[IllegalStateException](s.run("RETURN 1"))
      assert(e.getMessage.contains("IGNORED"), e.getMessage)
      s.close()
    } finally stop2()
  }

  test("distributed export writes the customer graph over real per-task TCP sessions") {
    val forest = graft.sources.RelationalLoader.load(
      spark, "/root/testdata/sf0.001", graft.sources.Testdata.customerDb)
    val schema = Schema.fromForest(Forest.toNodesDF(forest))
    val ex = CypherExporter.export(forest, schema)

    // reference result: the same export applied through the in-process
    // offline executor
    val want = new OfflineGraphSession
    CypherExecutor.run(ex, want, cleanup = true)

    val server = new BoltServerDouble
    try {
      val port = server.port
      CypherExecutor.runDistributed(ex,
        () => new BoltCypherSession("127.0.0.1", port), cleanup = true)
      val got = server.graph
      assert(got.nodes.keySet == want.nodes.keySet)
      assert(got.nodes.values.map(n => (n.label, n.oid, n.props, n.hasOid)).toSet ==
        want.nodes.values.map(n => (n.label, n.oid, n.props, n.hasOid)).toSet)
      assert(got.edges == want.edges)
      assert(got.indexes == want.indexes)
      // the data phases really fanned out: driver sessions (index +
      // cleanup) plus at least one connection per non-empty partition
      assert(server.connections.get() >= 4,
        s"expected per-task connections, got ${server.connections.get()}")
    } finally server.stop()
  }
}
