package graft.ui

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Drives the whole UI surface over real HTTP — the counterpart of the
  * reference's streamlit pages (ui/page modules): import → metrics → schema →
  * instances → labelling → simplify → export → clear, against the
  * sf0.001 customer snapshot.
  */
class UiServerSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private var running: UiServer.Running = _
  private lazy val client = HttpClient.newHttpClient()
  private def base = s"http://127.0.0.1:${running.port}"

  override def beforeAll(): Unit = {
    super.beforeAll()
    running = UiServer.start(spark)
  }
  override def afterAll(): Unit = {
    if (running != null) running.stop()
    super.afterAll()
  }

  private def get(path: String): String =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
  private def post(path: String): String =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  test("page serves and metrics start empty") {
    val page = get("/")
    assert(page.contains("<h1>graft</h1>"))
    assert(page.contains("/api/import/relational"))
    assert(get("/api/metrics").contains(""""trees":0"""))
  }

  test("mutations before import report the missing-data error") {
    val r = post("/api/rewrite")
    assert(r.contains("no data loaded"))
  }

  test("relational import populates the metric header") {
    val r = post("/api/import/relational?dir=/root/testdata/sf0.001&db=customer")
    assert(r.contains(""""ok":true"""), r)
    assert(r.contains(""""trees":150"""), r)
    // deltas: previous snapshot was the empty state
    assert(r.contains(""""previous":{"entities":0"""), r)
  }

  test("schema endpoint exposes groups, relations, and productions") {
    val s = get("/api/schema")
    assert(s.contains(""""customer":["""), s)
    assert(s.contains("customer<->nation"), s)
    assert(s.contains("GROUP::customer ->"), s)
  }

  test("instance preview returns capped group rows") {
    val d = get("/api/instances?group=customer&limit=7")
    assert(d.contains(""""columns":["""), d)
    assert(d.split("\\{").length - 1 <= 9, d) // ≤ 7 rows + columns obj + root
    assert(d.contains("c_name") || d.contains("c_custkey"), d)
  }

  test("manual rename rewrites the forest and refreshes the schema") {
    val r = post("/api/rename?type=GROUP&old=customer&new=client")
    assert(r.contains(""""ok":true"""), r)
    val s = get("/api/schema")
    assert(s.contains(""""client":["""), s)
    assert(!s.contains(""""customer":["""), s)
    // rename back so later tests see the canonical names
    post("/api/rename?type=GROUP&old=client&new=customer")
  }

  test("llm labelling applies seam proposals (uppercase client)") {
    val r = post("/api/labelling/llm")
    assert(r.contains(""""ok":true"""), r)
    val s = get("/api/schema")
    assert(s.contains(""""CUSTOMER":["""), s)
    // restore the canonical snapshot for the remaining tests
    post("/api/import/relational?dir=/root/testdata/sf0.001&db=customer")
  }

  test("export endpoints emit scripts and jsonl round-trips") {
    val cy = get("/api/export/cypher?limit=50")
    assert(cy.contains("MERGE"), cy.take(200))
    val sql = get("/api/export/sql")
    assert(sql.contains("CREATE TABLE"), sql.take(200))
    val out = java.nio.file.Files.createTempDirectory("ui-jsonl").resolve("f.jsonl")
    assert(post(s"/api/export/jsonl?path=$out").contains(""""ok":true"""))
    val r = post(s"/api/import/jsonl?path=$out")
    assert(r.contains(""""trees":150"""), r)
  }

  test("rewrite endpoint converges and updates metrics with deltas") {
    val r = post("/api/rewrite?epochs=2&tau=0.7")
    assert(r.contains(""""ok":true"""), r)
    assert(r.contains("epochsToConverge"), r)
    assert(r.contains(""""trees":150"""), r)
  }

  test("clear empties the state and records the previous snapshot") {
    val r = post("/api/clear")
    assert(r.contains(""""trees":0"""), r)
    assert(r.contains(""""previous":{"entities":"""), r)
    assert(get("/api/schema").contains("no data loaded"))
  }

  test("unknown routes 404") {
    assert(get("/api/nope").contains("no route"))
  }
}
