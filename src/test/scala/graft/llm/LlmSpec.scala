package graft.llm

import graft.SparkSpec
import graft.core._
import graft.model.{Forest, Schema => GraftSchema}
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic fake endpoint: parses the numbered list out of the
  * prompt and "simplifies" each tree by wrapping consecutive ENT
  * children of untyped nodes into a GROUP named after the first entity —
  * a stand-in for the reference LLM's schema-induction behavior that
  * keeps the whole pipeline (batching, numbering, parse, sanitize,
  * vocab snap, fallback) real and testable offline.
  */
class StubLlmClient extends LlmClient {
  var calls: Int = 0

  private def groupify(t: ArchiTree): ArchiTree = {
    val kids = t.children.map {
      case Child.Node(c) => Child.Node(groupify(c)): Child
      case leaf          => leaf
    }
    val out = t.copy(children = kids)
    if (!out.isTyped && out.childTrees.nonEmpty &&
      out.childTrees.forall(_.hasType(NodeType.Ent)) && out.children.size == out.childTrees.size)
      out.copy(label = Typed(NodeType.Group, out.childTrees.head.label.name))
    else out
  }

  override def complete(prompt: String): String = {
    calls += 1
    LlmRewrite.parseNumberedList(prompt).zipWithIndex.map { case (json, i) =>
      val tree = TreeJson.fromJson(json)
      s"${i + 1}. ${TreeJson.toJson(groupify(tree))}"
    }.mkString("\n")
  }
}

class LlmSpec extends AnyFunSuite with SparkSpec {

  test("normalize: NFKC, alnum-only, upper snake_case") {
    assert(LlmRewrite.normalize("hello, world") == "HELLO_WORLD")
    assert(LlmRewrite.normalize("  Person-Name  ") == "PERSON_NAME")
    assert(LlmRewrite.normalize("--") == "")
  }

  test("ratio matches difflib on knowns; closeMatches ranks by ratio") {
    assert(LlmRewrite.ratio("abcd", "bcde") == 0.75)
    assert(LlmRewrite.ratio("abc", "abc") == 1.0)
    assert(LlmRewrite.ratio("abc", "xyz") == 0.0)
    val m = LlmRewrite.closeMatches("PERSONS", Seq("PERSON", "LESSON", "CAR"), n = 2, cutoff = 0.6)
    assert(m.head == "PERSON")
  }

  test("sanitize: ensures ROOT, relabels invalid GROUP/REL bottom-up") {
    val bad = ArchiTree.fromString("(GROUP::g (ENT::a x) (inner y))")
    val out = LlmRewrite.sanitize(bad, "oid1")
    assert(out.label.render == "ROOT")
    assert(out.oid == "oid1")
    val g = out.childTrees.head
    assert(!g.hasType(NodeType.Group) && g.label.render.startsWith("UNDEF_"))

    val badRel = ArchiTree.fromString("(REL::r (GROUP::a (ENT::x v)))")
    val rel = LlmRewrite.sanitize(badRel, "oid2").childTrees.head
    assert(rel.label.render.startsWith("UNDEF_"))

    val good = ArchiTree.fromString("(REL::r (GROUP::a (ENT::x v)) (GROUP::b (ENT::y w)))")
    val kept = LlmRewrite.sanitize(good, "oid3").childTrees.head
    assert(kept.label.render == "REL::r")
  }

  test("fixVocab snaps close GROUP labels onto the vocabulary") {
    val t = ArchiTree.fromString("(ROOT (GROUP::PERSONS (ENT::name alice)))")
    val out = LlmRewrite.fixVocab(t, Set("PERSON", "EXAM"), 0.6)
    assert(out.childTrees.head.label.render == "GROUP::PERSON")
  }

  test("parseTreeOutput: chatter-wrapped JSON parses; garbage falls back") {
    val orig = ArchiTree.fromString("(ROOT (ENT::a x))")
    val answer = "Sure! Here is the tree:\n```json\n" +
      TreeJson.toJson(ArchiTree.fromString("(ROOT (GROUP::g (ENT::a x)))")) + "\n```"
    val (parsed, changed) = LlmRewrite.parseTreeOutput(answer, orig, Set.empty)
    assert(changed && parsed.childTrees.head.hasType(NodeType.Group))

    val (fb, fbChanged) = LlmRewrite.parseTreeOutput("no json here", orig, Set.empty)
    assert(!fbChanged && fb == orig)
  }

  test("extractVocab merges close labels and applies min support") {
    val trees = Seq.fill(3)(ArchiTree.fromString("(ROOT (GROUP::Person (ENT::n v)))")) ++
      Seq.fill(2)(ArchiTree.fromString("(ROOT (GROUP::Persons (ENT::n v)))")) ++
      Seq(ArchiTree.fromString("(ROOT (GROUP::Car (ENT::n v)))"))
    val forest = Forest.fromTrees(spark, trees)
    val vocab = LlmRewrite.extractVocab(forest, minSupport = 4, minSimilarity = 0.6)
    assert(vocab == Set("PERSON")) // 3 + 2 merged ≥ 4; CAR at 1 < 4
  }

  test("llm rewrite end to end with the stub client: groups induced, schema verifies") {
    val trees = (1 to 8).map { i =>
      ArchiTree.fromString(s"(ROOT (S (ENT::name p$i) (ENT::age ${20 + i})))")
    }
    val forest = Forest.fromTrees(spark, trees)
    val out = LlmRewrite.rewrite(forest, new StubLlmClient,
      LlmRewrite.Config(maxTokens = 256, minSupport = Some(2)))
    val outTrees = Forest.collectTrees(out)
    assert(outTrees.size == 8)
    assert(outTrees.forall(_.subtrees.exists(_.hasType(NodeType.Group))))
    val schema = GraftSchema.fromTrees(outTrees, keepUnlabelled = false)
    assert(schema.verify)
  }

  test("a skipped answer number falls back, without shifting later answers") {
    val t1 = ArchiTree.fromString("(ROOT (S (ENT::a x1)))")
    val t2 = ArchiTree.fromString("(ROOT (S (ENT::a x2)))")
    val t3 = ArchiTree.fromString("(ROOT (S (ENT::a x3)))")
    val forest = Forest.fromTrees(spark, Seq(t1, t2, t3)).coalesce(1)
    // answers items 1 and 3 only (grouped); skips 2 — a common LLM failure
    val skipper = new LlmClient {
      def complete(prompt: String): String = {
        val items = LlmRewrite.parseNumberedItems(prompt)
        def grouped(json: String) = {
          val t = TreeJson.fromJson(json)
          val s = t.childTrees.head
          TreeJson.toJson(t.copy(children = Vector(Child.Node(
            s.copy(label = Typed(NodeType.Group, "G"))))))
        }
        s"1. ${grouped(items(1))}\n3. ${grouped(items(3))}"
      }
    }
    val out = Forest.collectTrees(
      LlmRewrite.rewrite(forest, skipper, LlmRewrite.Config(maxTokens = 100000)))
      .sortBy(_.leaves.head)
    assert(out(0).childTrees.head.hasType(NodeType.Group)) // answered
    assert(out(1) == t2)                                   // skipped → original
    assert(out(2).childTrees.head.hasType(NodeType.Group)) // answered, not shifted
    assert(out(2).leaves == Vector("x3"))
  }

  test("llm rewrite falls back to originals when the endpoint errors") {
    val trees = Seq(ArchiTree.fromString("(ROOT (S (ENT::a x)))"))
    val forest = Forest.fromTrees(spark, trees)
    val broken = new LlmClient { def complete(p: String): String = throw new RuntimeException("boom") }
    val out = Forest.collectTrees(LlmRewrite.rewrite(forest, broken))
    assert(out == Forest.collectTrees(forest))
  }

  test("HTTP llm client against a chat-completions double: wire parity with the in-process client") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.nio.charset.StandardCharsets.UTF_8

    // loopback OpenAI-compatible endpoint double: parses the real JSON
    // request with an independent reader, answers through the SAME
    // Groupify logic the offline client uses
    val inner = new GroupifyLlmClient
    val requests = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var failAll = false
    val server = HttpServer.create(
      new java.net.InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      requests.incrementAndGet()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val req = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val resp =
        if (failAll) {
          val e = """{"error":{"message":"double refused"}}""".getBytes(UTF_8)
          ex.sendResponseHeaders(500, e.length.toLong)
          e
        } else {
          assert(req.path("temperature").asDouble() == 0.0)
          assert(req.path("model").asText() == "graft-test-model")
          assert(ex.getRequestHeaders.getFirst("Authorization") == "Bearer sk-double")
          val prompt = req.path("messages").path(0).path("content").asText()
          val content = inner.complete(prompt)
          val body =
            s"""{"id":"cc-double","choices":[{"index":0,"message":{"role":"assistant","content":${graft.util.Json.quote(content)}}}]}"""
              .getBytes(UTF_8)
          ex.sendResponseHeaders(200, body.length.toLong)
          body
        }
      val os = ex.getResponseBody
      try os.write(resp) finally os.close()
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val http = new HttpLlmClient(url, "graft-test-model", Some("sk-double"))

      val trees = (1 to 6).map { i =>
        ArchiTree.fromString(s"(ROOT (S (ENT::name p$i) (ENT::age ${20 + i})))")
      }
      val forest = Forest.fromTrees(spark, trees)
      val cfg = LlmRewrite.Config(maxTokens = 100000)
      val viaHttp = Forest.collectTrees(LlmRewrite.rewrite(forest, http, cfg))
        .map(_.render).sorted
      val viaLocal = Forest.collectTrees(LlmRewrite.rewrite(forest, new GroupifyLlmClient, cfg))
        .map(_.render).sorted
      assert(viaHttp == viaLocal, "HTTP round trip changed the rewrite result")
      assert(requests.get() >= 1)

      // endpoint failure → complete throws → the loop's fallback keeps
      // the original trees, so a broken endpoint is a no-op not a loss
      failAll = true
      val fallback = Forest.collectTrees(LlmRewrite.rewrite(forest, http, cfg))
      assert(fallback.map(_.render).sorted ==
        Forest.collectTrees(forest).map(_.render).sorted)
      failAll = false

      // transport-level error detail surfaces on the direct call
      failAll = true
      val err = intercept[IllegalStateException](http.complete("1. {}"))
      assert(err.getMessage.contains("500"))
    } finally server.stop(0)
  }

  test("canned real chat-completions payloads: full shape, finish_reason variants, error body") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.nio.charset.StandardCharsets.UTF_8
    // fixtures transcribed from the openly documented chat-completions
    // response contract — the exact field set (incl. everything the
    // client must IGNORE: usage, logprobs, system_fingerprint) and the
    // vendor variants the loopback double above never exercises
    val fullStop =
      """{"id":"chatcmpl-9x1AbCdEfGh","object":"chat.completion","created":1719874041,
        |"model":"gpt-4o-2024-05-13","system_fingerprint":"fp_4e2b2da518",
        |"choices":[{"index":0,
        |  "message":{"role":"assistant","content":"1. {\"label\":\"ROOT\"}"},
        |  "logprobs":null,"finish_reason":"stop"}],
        |"usage":{"prompt_tokens":57,"completion_tokens":17,"total_tokens":74}}""".stripMargin
    val lengthTruncated =
      """{"id":"chatcmpl-9x1Truncat","object":"chat.completion","created":1719874042,
        |"model":"gpt-4o-2024-05-13",
        |"choices":[{"index":0,
        |  "message":{"role":"assistant","content":"1. {\"label\":\"RO"},
        |  "logprobs":null,"finish_reason":"length"}],
        |"usage":{"prompt_tokens":57,"completion_tokens":4096,"total_tokens":4153}}""".stripMargin
    // a tool-calling model answering with tool_calls and NULL content —
    // the client must fail loudly, not return the string "null"
    val toolCalls =
      """{"id":"chatcmpl-9x1ToolCal","object":"chat.completion","created":1719874043,
        |"model":"gpt-4o-2024-05-13",
        |"choices":[{"index":0,
        |  "message":{"role":"assistant","content":null,
        |    "tool_calls":[{"id":"call_abc123","type":"function",
        |      "function":{"name":"rewrite_trees","arguments":"{\"trees\":[]}"}}]},
        |  "logprobs":null,"finish_reason":"tool_calls"}],
        |"usage":{"prompt_tokens":57,"completion_tokens":21,"total_tokens":78}}""".stripMargin
    // the documented error envelope (here: a 429 rate limit)
    val rateLimited =
      """{"error":{"message":"Rate limit reached for gpt-4o in organization org-x on tokens per min",
        |"type":"tokens","param":null,"code":"rate_limit_exceeded"}}""".stripMargin

    @volatile var fixture: (Int, String) = (200, fullStop)
    val server = HttpServer.create(
      new java.net.InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val b = fixture._2.getBytes(UTF_8)
      ex.sendResponseHeaders(fixture._1, b.length.toLong)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val http = new HttpLlmClient(url, "graft-test-model")

      assert(http.complete("p") == "1. {\"label\":\"ROOT\"}")

      fixture = (200, lengthTruncated)
      // truncation is caller-visible through the (partial) text; the
      // rewrite loop's parse-failure fallback handles it per tree
      assert(http.complete("p") == "1. {\"label\":\"RO")

      fixture = (200, toolCalls)
      val e1 = intercept[IllegalStateException](http.complete("p"))
      assert(e1.getMessage.contains("choices[0].message.content"), e1.getMessage)

      fixture = (429, rateLimited)
      val e2 = intercept[IllegalStateException](http.complete("p"))
      assert(e2.getMessage.contains("429") &&
        e2.getMessage.contains("rate_limit_exceeded"), e2.getMessage)
    } finally server.stop(0)
  }

  test("labelling: proposals + broadcast rename application") {
    val schema = GraftSchema.fromDescription(
      groups = Set(graft.model.Group("t1", Set("id", "email"))),
      relations = Set.empty,
      collections = false)
    val client = new LlmClient {
      def complete(prompt: String): String =
        if (prompt.contains("Current Name: t1")) "user accounts" else "x"
    }
    val renames = Labelling.groupLabelling(schema, client)
    assert(renames == Set(Labelling.Renaming(NodeType.Group, "t1", "USER_ACCOUNTS")))

    val forest = Forest.fromTrees(spark,
      Seq(ArchiTree.fromString("(ROOT (GROUP::t1 (ENT::id 1)) (GROUP::other (ENT::id 2)))")))
    val renamed = Forest.collectTrees(Labelling.applyRenaming(forest, renames)).head
    assert(renamed.childTrees.map(_.label.render) ==
      Vector("GROUP::USER_ACCOUNTS", "GROUP::other"))
  }
}
