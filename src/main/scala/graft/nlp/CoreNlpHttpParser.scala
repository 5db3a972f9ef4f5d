package graft.nlp

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import graft.core.ArchiTree

/** Live [[SentenceParser]] backend over a Stanford CoreNLP SERVER —
  * the reference's `CoreNLPParser` (nlp/parser/corenlp.py:19-45) drives
  * the same server through nltk; the server's protocol is openly
  * documented: `POST <url>/?properties=<url-encoded JSON>` with the
  * raw sentence as the body, JSON response carrying one Penn-bracket
  * `parse` string per sentence. The bracket string parses directly
  * through the repo's S-expression tree reader, and — mirroring the
  * reference's `next(tree)[0]` — the sentence tree is the FIRST child
  * of the returned ROOT.
  *
  * Spark-side: one parser instance serializes to each task by
  * coordinates only (`@transient lazy` HTTP pool), and `parseBatch`'s
  * per-partition batches are where the round trips amortize. A down or
  * erroring server throws — a corpus silently parsed to nothing is
  * worse than a failed job — while an empty/defective parse for ONE
  * sentence returns None and the pipeline drops that sentence, like
  * the reference's per-sentence error handling.
  */
final class CoreNlpHttpParser(
    url: String,
    timeout: Duration = Duration.ofSeconds(60),
) extends SentenceParser {

  override def name: String = "corenlp"

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def parse(sentence: String, language: String): Option[ArchiTree] = {
    val properties =
      s"""{"annotators":"tokenize,ssplit,pos,parse","outputFormat":"json","tokenize.language":${graft.util.Json.quote(language)}}"""
    val uri = URI.create(
      s"$url/?properties=${URLEncoder.encode(properties, UTF_8)}")
    val req = HttpRequest.newBuilder(uri)
      .timeout(timeout)
      .header("Content-Type", "text/plain; charset=utf-8")
      .POST(HttpRequest.BodyPublishers.ofString(sentence, UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"CoreNLP server returned ${resp.statusCode()}: ${resp.body().take(200)}")
    val sentences = mapper.readTree(resp.body()).path("sentences")
    if (!sentences.isArray || sentences.size() == 0) return None
    val bracket = sentences.path(0).path("parse")
    if (!bracket.isTextual || bracket.asText().isEmpty) return None
    try {
      val root = ArchiTree.fromString(bracket.asText())
      // CoreNLP wraps the sentence in (ROOT …); the reference takes the
      // first child as the sentence tree
      root.childTrees.headOption.orElse(Some(root))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
