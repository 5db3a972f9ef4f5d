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

  test("canned real CoreNLP server payload: pretty-printed parse, extras ignored, first sentence wins") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // fixture transcribed from the documented CoreNLP server JSON for
    // "The quick brown fox jumped over the lazy dog. It ran." with
    // annotators tokenize,ssplit,pos,parse: the parse is PRETTY-PRINTED
    // across lines (a real-server quirk the loopback double's compact
    // brackets never exercise), tokens carry lemma/offsets/before/after,
    // and dependency arrays are present — everything beyond `parse`
    // must be ignored, and only sentences[0] is taken
    val fixture =
      """{
        |  "sentences": [
        |    {
        |      "index": 0,
        |      "parse": "(ROOT\n  (S\n    (NP (DT The) (JJ quick) (JJ brown) (NN fox))\n    (VP (VBD jumped)\n      (PP (IN over)\n        (NP (DT the) (JJ lazy) (NN dog))))\n    (. .)))",
        |      "basicDependencies": [
        |        {"dep": "ROOT", "governor": 0, "governorGloss": "ROOT", "dependent": 5, "dependentGloss": "jumped"},
        |        {"dep": "det", "governor": 4, "governorGloss": "fox", "dependent": 1, "dependentGloss": "The"},
        |        {"dep": "amod", "governor": 4, "governorGloss": "fox", "dependent": 2, "dependentGloss": "quick"},
        |        {"dep": "amod", "governor": 4, "governorGloss": "fox", "dependent": 3, "dependentGloss": "brown"},
        |        {"dep": "nsubj", "governor": 5, "governorGloss": "jumped", "dependent": 4, "dependentGloss": "fox"}
        |      ],
        |      "enhancedDependencies": [
        |        {"dep": "ROOT", "governor": 0, "governorGloss": "ROOT", "dependent": 5, "dependentGloss": "jumped"}
        |      ],
        |      "enhancedPlusPlusDependencies": [
        |        {"dep": "ROOT", "governor": 0, "governorGloss": "ROOT", "dependent": 5, "dependentGloss": "jumped"}
        |      ],
        |      "tokens": [
        |        {"index": 1, "word": "The", "originalText": "The", "lemma": "the", "characterOffsetBegin": 0, "characterOffsetEnd": 3, "pos": "DT", "before": "", "after": " "},
        |        {"index": 2, "word": "quick", "originalText": "quick", "lemma": "quick", "characterOffsetBegin": 4, "characterOffsetEnd": 9, "pos": "JJ", "before": " ", "after": " "},
        |        {"index": 3, "word": "brown", "originalText": "brown", "lemma": "brown", "characterOffsetBegin": 10, "characterOffsetEnd": 15, "pos": "JJ", "before": " ", "after": " "},
        |        {"index": 4, "word": "fox", "originalText": "fox", "lemma": "fox", "characterOffsetBegin": 16, "characterOffsetEnd": 19, "pos": "NN", "before": " ", "after": " "},
        |        {"index": 5, "word": "jumped", "originalText": "jumped", "lemma": "jump", "characterOffsetBegin": 20, "characterOffsetEnd": 26, "pos": "VBD", "before": " ", "after": " "},
        |        {"index": 6, "word": "over", "originalText": "over", "lemma": "over", "characterOffsetBegin": 27, "characterOffsetEnd": 31, "pos": "IN", "before": " ", "after": " "},
        |        {"index": 7, "word": "the", "originalText": "the", "lemma": "the", "characterOffsetBegin": 32, "characterOffsetEnd": 35, "pos": "DT", "before": " ", "after": " "},
        |        {"index": 8, "word": "lazy", "originalText": "lazy", "lemma": "lazy", "characterOffsetBegin": 36, "characterOffsetEnd": 40, "pos": "JJ", "before": " ", "after": " "},
        |        {"index": 9, "word": "dog", "originalText": "dog", "lemma": "dog", "characterOffsetBegin": 41, "characterOffsetEnd": 44, "pos": "NN", "before": " ", "after": ""},
        |        {"index": 10, "word": ".", "originalText": ".", "lemma": ".", "characterOffsetBegin": 44, "characterOffsetEnd": 45, "pos": ".", "before": "", "after": " "}
        |      ]
        |    },
        |    {
        |      "index": 1,
        |      "parse": "(ROOT\n  (S\n    (NP (PRP It))\n    (VP (VBD ran))\n    (. .)))",
        |      "basicDependencies": [],
        |      "enhancedDependencies": [],
        |      "enhancedPlusPlusDependencies": [],
        |      "tokens": [
        |        {"index": 1, "word": "It", "originalText": "It", "lemma": "it", "characterOffsetBegin": 47, "characterOffsetEnd": 49, "pos": "PRP", "before": " ", "after": " "},
        |        {"index": 2, "word": "ran", "originalText": "ran", "lemma": "run", "characterOffsetBegin": 50, "characterOffsetEnd": 53, "pos": "VBD", "before": " ", "after": ""},
        |        {"index": 3, "word": ".", "originalText": ".", "lemma": ".", "characterOffsetBegin": 53, "characterOffsetEnd": 54, "pos": ".", "before": "", "after": ""}
        |      ]
        |    }
        |  ]
        |}""".stripMargin
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val b = fixture.getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length.toLong)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    })
    server.start()
    try {
      val parser = new CoreNlpHttpParser(
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val t = parser.parse("The quick brown fox jumped over the lazy dog. It ran.", "en").get
      // ROOT unwrapped to its first child; the pretty-printed newlines
      // and indentation parse cleanly; the punctuation POS "." is a
      // legal label
      assert(t.label.render == "S")
      assert(t.leaves == Vector("The", "quick", "brown", "fox", "jumped",
        "over", "the", "lazy", "dog", "."))
      assert(t.render == "(S (NP (DT The) (JJ quick) (JJ brown) (NN fox)) " +
        "(VP (VBD jumped) (PP (IN over) (NP (DT the) (JJ lazy) (NN dog)))) (. .))")
    } finally server.stop(0)
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
