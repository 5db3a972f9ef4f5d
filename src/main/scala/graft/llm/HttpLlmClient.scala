package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import graft.util.Json.quote

/** Live [[LlmClient]] over an OpenAI-compatible chat-completions HTTP
  * endpoint — the wire client behind the reference's langchain chat
  * model (simplification/llm.py:50-92 invokes a `BaseChatModel`; the
  * dominant self-hosted serving surface for that seam is the openly
  * documented `POST /v1/chat/completions` JSON contract, which this
  * speaks with the JDK's `HttpClient`, no SDK).
  *
  * Request: `{model, messages:[{role:"user", content: prompt}],
  * temperature: 0}` (temperature 0 because the protocol's parser
  * expects deterministic numbered-list output). Response:
  * `choices[0].message.content`. Errors — non-2xx status, malformed
  * JSON, missing content — throw, and the rewrite loop's existing
  * fallback keeps the ORIGINAL trees for the failed batch, so a flaky
  * endpoint degrades to a no-op rather than corrupting the forest.
  *
  * Serializable like every [[LlmClient]] (batches complete on
  * executors): only the coordinates serialize; the socket pool is
  * per-JVM (`@transient lazy`).
  */
final class HttpLlmClient(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    timeout: Duration = Duration.ofSeconds(120),
) extends LlmClient {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def complete(prompt: String): String = {
    val body =
      s"""{"model":${quote(model)},"temperature":0,"messages":[{"role":"user","content":${quote(prompt)}}]}"""
    val builder = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"LLM endpoint returned ${resp.statusCode()}: ${resp.body().take(200)}")
    val root = mapper.readTree(resp.body())
    val content = root.path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || !content.isTextual)
      throw new IllegalStateException(
        s"LLM endpoint response has no choices[0].message.content: ${resp.body().take(200)}")
    content.asText()
  }
}
