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
