package graft.embed

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Model-id dispatch parity with the reference's `create_model`
  * (embeddings/src/model/mod.rs:128-205): prefix routing, strict-vs-
  * passthrough validation, catalog dims/max-lens, API-key checks,
  * first-response dimension discovery, and pre-truncation. */
class ModelRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  import ModelRegistry._

  // ---- resolve: prefix grammar (mod.rs:135-178) ----

  test("colon prefix routes to the provider in passthrough mode") {
    val r = resolve("openai:my-custom-model")
    assert(r.provider.map(_.name).contains("openai"))
    assert(r.model == "my-custom-model")
    assert(!r.strict)
  }

  test("slash prefix routes to the provider in strict mode") {
    for ((id, p, m) <- Seq(
        ("openai/text-embedding-3-small", "openai", "text-embedding-3-small"),
        ("voyage/voyage-3.5", "voyage", "voyage-3.5"),
        ("jina/jina-embeddings-v3", "jina", "jina-embeddings-v3"))) {
      val r = resolve(id)
      assert(r.provider.map(_.name).contains(p) && r.model == m && r.strict)
    }
  }

  test("unprefixed id falls through to a local artifact path (mod.rs:180)") {
    val r = resolve("/models/my-bert.graft")
    assert(r.isLocal && r.model == "/models/my-bert.graft")
  }

  // ---- create: validation (openai.rs:15-18, voyage.rs:15-21, 25-37) ----

  test("strict mode rejects a model absent from the built-in list") {
    val e = intercept[IllegalArgumentException](
      create("voyage/voyage-99-imaginary", apiKey = "k"))
    assert(e.getMessage.contains("Invalid model"))
  }

  test("passthrough mode accepts any model name") {
    val p = create("voyage:voyage-99-imaginary", apiKey = "k", dim = Some(8))
    assert(p.isInstanceOf[Embeddings.HttpProvider])
  }

  test("API key basic validation: empty and whitespace-wrapped keys refused") {
    intercept[IllegalArgumentException](create("openai:m", apiKey = "", dim = Some(4)))
    val e = intercept[IllegalArgumentException](
      create("openai:m", apiKey = " sk-x ", dim = Some(4)))
    assert(e.getMessage.contains("whitespace"))
  }

  test("local model without an explicit dim is refused") {
    intercept[IllegalArgumentException](create("/tmp/nope.graft"))
  }

  // ---- catalogs (openai.rs:85-90/:222, voyage.rs:86-99/:250-260,
  //      jina.rs:96-108/:335-348) ----

  test("known dims and endpoints come from the per-provider catalog") {
    val p = create("openai/text-embedding-3-large", apiKey = "sk")
      .asInstanceOf[Embeddings.HttpProvider]
    assert(p.dim == 3072)
    assert(p.endpoint == "https://api.openai.com/v1/embeddings")
    assert(p.headers("Authorization") == "Bearer sk")

    val v = create("voyage/voyage-code-2", apiKey = "sk")
      .asInstanceOf[Embeddings.HttpProvider]
    assert(v.dim == 1536)
    assert(v.endpoint == "https://api.voyageai.com/v1/embeddings")

    val j = create("jina/jina-embeddings-v4", apiKey = "sk")
      .asInstanceOf[Embeddings.HttpProvider]
    assert(j.dim == 2048)
    assert(j.endpoint == "https://api.jina.ai/v1/embeddings")
  }

  test("explicit dim overrides the catalog (matryoshka-truncated serving)") {
    val p = create("voyage/voyage-3.5", apiKey = "sk", dim = Some(256))
      .asInstanceOf[Embeddings.HttpProvider]
    assert(p.dim == 256)
  }

  test("max input length per model, with per-provider defaults") {
    assert(maxInputLen("openai/text-embedding-3-small") == 8192)
    assert(maxInputLen("voyage/voyage-3-large") == 32000)
    assert(maxInputLen("voyage/voyage-law-2") == 16000)
    assert(maxInputLen("voyage:unknown-model") == 8192)
    assert(maxInputLen("jina/jina-embeddings-v4") == 32000)
    assert(maxInputLen("jina/jina-embeddings-v3") == 8192)
    assert(maxInputLen("/models/local.graft") == LocalDefaultMaxInputLen)
  }

  // ---- pre-truncation (utils.rs:4-19) ----

  test("preTruncate: short text passes through unchanged") {
    assert(preTruncate("hello", 512) == "hello")
  }

  test("preTruncate: ASCII text cuts at maxSeqLen*8 bytes") {
    val long = "a" * 100000
    val out = preTruncate(long, 512)
    assert(out.length == 512 * 8)
  }

  test("preTruncate: never splits a codepoint (utf-8 boundary cut)") {
    // 4-byte emoji: limit lands mid-codepoint unless boundary-aware
    val emojis = "😀" * 10000 // U+1F600, 4 UTF-8 bytes each
    val out = preTruncate(emojis, 512)
    assert(out.getBytes(StandardCharsets.UTF_8).length <= 512 * 8)
    assert(out.length % 2 == 0, "must not split the surrogate pair")
    // still a whole number of emoji
    assert(out.codePoints().toArray.forall(_ == 0x1F600))
  }

  test("preTruncate: multi-byte text respects the byte budget, not chars") {
    val cjk = "世" * 3000 // 3 UTF-8 bytes each
    val out = preTruncate(cjk, 512)
    assert(out.getBytes(StandardCharsets.UTF_8).length <= 512 * 8)
    assert(out.length == 4096 / 3) // floor(4096/3) whole chars
  }

  test("LocalModelProvider pre-truncates when maxInputLen is set") {
    val dir = java.nio.file.Files.createTempDirectory("mrspec").toFile
    val path = new java.io.File(dir, "m.graft").getAbsolutePath
    Embeddings.LocalModel.writeArtifact(path,
      Embeddings.LocalModel.gaussianWeights(64, 4, seed = 7))
    val full = Embeddings.LocalModelProvider(path, 4)
    val capped = Embeddings.LocalModelProvider(path, 4, maxInputLen = Some(1))
    // 8-byte budget: "aaaa bbbb cccc" truncates to "aaaa bbb" — different tokens
    val t = "aaaa bbbb cccc"
    val vFull = full.embedBatch(Seq(t)).head
    val vCap = capped.embedBatch(Seq(t)).head
    assert(!vFull.sameElements(vCap))
    val vRef = full.embedBatch(Seq("aaaa bbb")).head
    assert(vCap.sameElements(vRef))
  }

  // ---- dimension discovery (openai.rs:207, :215-219) ----

  private val om = new ObjectMapper()
  private var server: HttpServer = _
  private val ServerDim = 5

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val input = om.readTree(body).get("input")
      val root = om.createObjectNode()
      val data = root.putArray("data")
      (0 until input.size()).foreach { i =>
        val emb = data.addObject().putArray("embedding")
        val t = input.get(i).asText()
        (0 until ServerDim).foreach(d => emb.add((t.length + d).toFloat))
      }
      val bytes = om.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def local = s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings"

  test("unknown passthrough model discovers its dim from the first response") {
    val p = create("openai:mystery-model", apiKey = "sk",
      apiUrl = Some(local))
    assert(p.isInstanceOf[DiscoveringProvider])
    intercept[IllegalStateException](p.dim) // before discovery: loud failure
    val vecs = p.embedBatch(Seq("ab", "cdef"))
    assert(vecs.map(_.length) == Seq(ServerDim, ServerDim))
    assert(p.dim == ServerDim) // pinned
    // later batches validate against the pinned dim via HttpProvider
    assert(p.embedBatch(Seq("x")).head.length == ServerDim)
  }

  test("known-model create talks the real wire shape end to end") {
    val p = create("openai:known-here", apiKey = "sk",
      apiUrl = Some(local), dim = Some(ServerDim))
    val v = p.embedBatch(Seq("hey")).head
    assert(v.toSeq == Seq(3f, 4f, 5f, 6f, 7f))
  }

  test("validateApiKey probes with a minimal request (openai.rs:226-231)") {
    validateApiKey(create("openai:m", apiKey = "sk",
      apiUrl = Some(local), dim = Some(ServerDim))) // no throw
    val bad = create("openai:m", apiKey = "sk",
      apiUrl = Some(s"http://127.0.0.1:${server.getAddress.getPort}/missing"),
      dim = Some(ServerDim), timeoutMs = 500)
    intercept[Exception](validateApiKey(bad))
  }
}
