package graft.nlp

import java.net.{InetAddress, InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.model.Forest
import org.scalatest.funsuite.AnyFunSuite

/** Loopback CoreNLP SERVER double: speaks the real server protocol —
  * `POST /?properties=<url-encoded JSON>` with the sentence as body,
  * JSON response with one Penn-bracket `parse` per sentence — and
  * produces a deterministic constituency shape ((NP first-token)
  * (VP rest)). What the spec proves: [[CoreNlpHttpParser]]'s request
  * is a correct CoreNLP conversation (the double parses it with an
  * independent reader and asserts the annotator properties), the
  * bracket response round-trips into the tree model, and the parser
  * drives the full distributed `parseBatch` pipeline over real HTTP.
  */
final class CoreNlpServerDouble {
  val requests = new AtomicLong(0)
  @volatile var failAll = false

  private val server =
    HttpServer.create(new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
  server.createContext("/", (ex: HttpExchange) => {
    requests.incrementAndGet()
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val resp: Array[Byte] =
      if (failAll) {
        val e = "server refused".getBytes(UTF_8)
        ex.sendResponseHeaders(500, e.length.toLong)
        e
      } else {
        val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val props = query.split("&").collectFirst {
          case kv if kv.startsWith("properties=") =>
            URLDecoder.decode(kv.drop("properties=".length), UTF_8)
        }.getOrElse("")
        assert(props.contains("\"outputFormat\":\"json\""), s"bad properties: $props")
        assert(props.contains("tokenize.language"), s"no language in: $props")
        val toks = body.trim.split("\\s+").filter(_.nonEmpty)
        val parse =
          if (toks.isEmpty) """{"sentences":[]}"""
          else {
            val np = s"(NP (NN ${toks.head}))"
            val vp = if (toks.length > 1)
              toks.tail.map(t => s"(VB $t)").mkString("(VP ", " ", ")")
            else ""
            val bracket = s"(ROOT (S $np $vp))"
            s"""{"sentences":[{"index":0,"parse":${graft.util.Json.quote(bracket)}}]}"""
          }
        val b = parse.getBytes(UTF_8)
        ex.sendResponseHeaders(200, b.length.toLong)
        b
      }
    val os = ex.getResponseBody
    try os.write(resp) finally os.close()
    ex.close()
  })
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}

class CoreNlpSpec extends AnyFunSuite with SparkSpec {

  test("parse over real HTTP: protocol asserted by the double, bracket round-trips, ROOT unwrapped") {
    val server = new CoreNlpServerDouble
    try {
      val parser = new CoreNlpHttpParser(server.url)
      val t = parser.parse("patient took aspirin", "English").get
      // the sentence tree is ROOT's first child, like the reference's
      // next(tree)[0]
      assert(t.label.render == "S")
      assert(t.leaves == Vector("patient", "took", "aspirin"))
      assert(t.render == "(S (NP (NN patient)) (VP (VB took) (VB aspirin)))")
      assert(parser.parse("", "English").isEmpty) // empty sentences array
      assert(server.requests.get() == 2)

      server.failAll = true
      val err = intercept[IllegalStateException](parser.parse("x", "English"))
      assert(err.getMessage.contains("500"))
    } finally server.stop()
  }

  test("parseBatch drives the HTTP backend through the distributed pipeline") {
    import spark.implicits._
    val server = new CoreNlpServerDouble
    try {
      val sentences = Seq(
        AnnotatedSentence("patient took aspirin", Seq(Entity("DRUG", 13, 20, "T1", "aspirin")), Seq.empty),
        AnnotatedSentence("nurse gave insulin", Seq(Entity("DRUG", 11, 18, "T2", "insulin")), Seq.empty)).toDS()
      val forest = new CoreNlpHttpParser(server.url).parseBatch(sentences)
      val trees = Forest.collectTrees(forest)
      assert(trees.size == 2)
      assert(trees.exists(_.render.contains("(ENT::DRUG aspirin)")))
      assert(trees.exists(_.render.contains("(ENT::DRUG insulin)")))
      // executors really hit the wire (one request per sentence)
      assert(server.requests.get() >= 2)
    } finally server.stop()
  }
}
