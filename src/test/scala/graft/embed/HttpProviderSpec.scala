package graft.embed

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkT
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** K8 remote-provider plumbing against a LOCAL mock embedding server (the
  * container is offline; what rots if never exercised is the batch /
  * per-partition client lifecycle / retry / error-propagation machinery,
  * which is provider-independent — ref embeddings error_handling_test.rs).
  *
  * The mock speaks the OpenAI-compatible wire shape and computes
  * DETERMINISTIC vectors (a function of the text), so distributed results
  * are comparable against a local reimplementation.
  */
class HttpProviderSpec extends AnyFunSuite with BeforeAndAfterAll {

  import SparkT.spark.implicits._

  private val om = new ObjectMapper()
  private var server: HttpServer = _
  private def endpoint(path: String) = s"http://127.0.0.1:${server.getAddress.getPort}$path"

  // server-side embedding definition, reimplemented in tests for comparison
  private def refVec(text: String): Array[Float] = {
    val cps = text.codePoints().toArray
    Array(text.length.toFloat, (cps.sum % 997).toFloat,
      (if (cps.isEmpty) 0 else cps.max).toFloat, 1.0f)
  }
  private val Dim = 4

  // request log + scripted failure counters (thread-safe: executors hit the
  // server concurrently)
  private val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  private val flakyRemaining = new java.util.concurrent.atomic.AtomicInteger(0)
  private val requestCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private def readTexts(ex: HttpExchange): Seq[String] = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val input = om.readTree(body).get("input")
    (0 until input.size()).map(input.get(_).asText())
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def okResponse(texts: Seq[String]): String = {
    val root = om.createObjectNode()
    val data = root.putArray("data")
    texts.foreach { t =>
      val emb = data.addObject().putArray("embedding")
      refVec(t).foreach(emb.add)
    }
    om.writeValueAsString(root)
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      requestCount.incrementAndGet()
      val texts = readTexts(ex)
      batchSizes.add(texts.size)
      respond(ex, 200, okResponse(texts))
    })
    server.createContext("/auth", (ex: HttpExchange) => {
      val texts = readTexts(ex)
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val extra = ex.getRequestHeaders.getFirst("x-api-key")
      if (auth == "Bearer sk-test" && extra == "k2")
        respond(ex, 200, okResponse(texts))
      else respond(ex, 401, "unauthorized")
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      requestCount.incrementAndGet()
      val texts = readTexts(ex)
      if (flakyRemaining.getAndDecrement() > 0) respond(ex, 503, "busy")
      else respond(ex, 200, okResponse(texts))
    })
    server.createContext("/down", (ex: HttpExchange) => {
      requestCount.incrementAndGet()
      readTexts(ex)
      respond(ex, 503, "down")
    })
    server.createContext("/reject", (ex: HttpExchange) => {
      requestCount.incrementAndGet()
      readTexts(ex)
      respond(ex, 400, "bad request")
    })
    server.createContext("/garbage", (ex: HttpExchange) => {
      requestCount.incrementAndGet()
      readTexts(ex)
      respond(ex, 200, "definitely }{ not json")
    })
    server.createContext("/nonnumeric", (ex: HttpExchange) => {
      val texts = readTexts(ex)
      val root = om.createObjectNode()
      val data = root.putArray("data")
      texts.foreach { _ =>
        val emb = data.addObject().putArray("embedding")
        (1 to Dim).foreach(i => emb.add(s"x$i")) // right dim, wrong type
      }
      respond(ex, 200, om.writeValueAsString(root))
    })
    server.createContext("/shortdim", (ex: HttpExchange) => {
      val texts = readTexts(ex)
      val root = om.createObjectNode()
      val data = root.putArray("data")
      texts.foreach { _ => data.addObject().putArray("embedding").add(1.0f) }
      respond(ex, 200, om.writeValueAsString(root))
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def provider(path: String, retries: Int = 3) =
    Embeddings.HttpProvider(endpoint(path), "test-model", Dim,
      maxRetries = retries, baseBackoffMs = 1)

  test("configured headers reach the request (authenticated endpoints, ADVICE r8)") {
    // without credentials: 401 is a non-retryable 4xx → fails fast
    intercept[IllegalArgumentException] {
      provider("/auth").embedBatch(Seq("x"))
    }
    // with headers: authenticated round-trip; Content-Type stays ours
    val p = Embeddings.HttpProvider(endpoint("/auth"), "test-model", Dim,
      maxRetries = 0, baseBackoffMs = 1,
      headers = Map("Authorization" -> "Bearer sk-test", "x-api-key" -> "k2",
        "content-type" -> "text/evil"))
    assert(p.embedBatch(Seq("alpha")).head.toSeq === refVec("alpha").toSeq)
  }

  test("embedBatch round-trips the wire shape and preserves input order") {
    val texts = Seq("alpha", "beta gamma", "", "Ω emoji 😀")
    val got = provider("/v1/embeddings").embedBatch(texts)
    assert(got.map(_.toSeq) === texts.map(refVec(_).toSeq))
  }

  test("embedStage: one request per batch, per-partition client, results match") {
    batchSizes.clear()
    val texts = (1 to 10).map(i => s"doc number $i")
    val df = texts.toDF("text").repartition(1)
    // capture only the (Serializable) provider value in the factory
    // closure — capturing `this` would drag the HttpServer into the task
    val p = provider("/v1/embeddings")
    val out = Embeddings.embedStage(df, "text", "emb", () => p, batchSize = 4)
    val byText = out.select("text", "emb").as[(String, Seq[Float])]
      .collect().toMap
    texts.foreach(t => assert(byText(t) === refVec(t).toSeq, t))
    // 10 rows in one partition at batchSize 4 → requests of 4, 4, 2
    assert(batchSizes.toArray(Array.empty[Integer]).map(_.toInt).sorted.toSeq
      === Seq(2, 4, 4))
  }

  test("transient 429/5xx responses are retried with backoff until success") {
    flakyRemaining.set(2)
    requestCount.set(0)
    val got = provider("/flaky").embedBatch(Seq("persist"))
    assert(got.head.toSeq === refVec("persist").toSeq)
    assert(requestCount.get() === 3) // 2 failures + 1 success
  }

  test("persistent 5xx propagates the final error after exhausting retries") {
    requestCount.set(0)
    val e = intercept[java.io.IOException] {
      provider("/down", retries = 2).embedBatch(Seq("x"))
    }
    assert(e.getMessage.contains("after 3 attempts"), e.getMessage)
    assert(String.valueOf(e.getCause.getMessage).contains("503"))
    assert(requestCount.get() === 3)
  }

  test("non-retryable 4xx fails fast without burning the retry budget") {
    requestCount.set(0)
    val e = intercept[IllegalArgumentException] {
      provider("/reject").embedBatch(Seq("x"))
    }
    assert(e.getMessage.contains("400"), e.getMessage)
    assert(requestCount.get() === 1)
  }

  test("a 200 with a malformed body is a protocol error, not retried") {
    // Jackson's parse exceptions extend IOException — without the rewrap
    // they would be retried as transport errors and burn the backoff budget
    requestCount.set(0)
    val e = intercept[IllegalStateException] {
      provider("/garbage").embedBatch(Seq("x"))
    }
    assert(e.getMessage.contains("malformed"), e.getMessage)
    assert(requestCount.get() === 1)
  }

  test("a 200 with non-numeric embedding elements is a protocol error, not a zero vector") {
    // JsonNode.floatValue() returns 0.0 for non-numeric nodes — accepting
    // them would emit exactly the silent zero vectors the policy forbids
    val e = intercept[IllegalStateException] {
      provider("/nonnumeric").embedBatch(Seq("x"))
    }
    assert(e.getMessage.contains("not numeric"), e.getMessage)
  }

  test("a 200 with the wrong dimension is a protocol error, not retried") {
    val e = intercept[IllegalStateException] {
      provider("/shortdim").embedBatch(Seq("x"))
    }
    assert(e.getMessage.contains("dimension"), e.getMessage)
  }
}
