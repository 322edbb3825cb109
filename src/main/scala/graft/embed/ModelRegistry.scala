package graft.embed

import graft.embed.Embeddings.{HttpProvider, LocalModelProvider, TextToEmbeddings}

/** Model-id dispatch — the engine's analog of the reference's
  * `create_model` (embeddings/src/model/mod.rs:128-205): one string names a
  * model, the registry picks the provider, validates the configuration, and
  * returns a ready [[Embeddings.TextToEmbeddings]].
  *
  * Dispatch grammar (mod.rs:135-178):
  *   - `openai:<model>` / `voyage:<model>` / `jina:<model>` — remote
  *     provider, PASSTHROUGH validation (any model name; the service is the
  *     authority). Output dimension comes from the known-models catalog or,
  *     for unknown names, is DISCOVERED from the first response and pinned
  *     (openai.rs:207 `hidden_size_cache`);
  *   - `openai/<model>` / `voyage/<model>` / `jina/<model>` — same
  *     providers, STRICT validation against the built-in model list
  *     (openai.rs:15-18, voyage.rs:15-21, jina.rs:15-27);
  *   - anything else — a LOCAL model artifact path
  *     ([[Embeddings.LocalModelProvider]]; mod.rs:180-204 falls through to
  *     candle/ONNX local inference — here the engine's file-backed
  *     projection artifact, the documented offline stand-in).
  *
  * Per-provider catalogs carry the published endpoint, known model →
  * hidden-size map, and per-model max input length (in tokens) exactly as
  * the reference hard-codes them (openai.rs:85-90/:222-224,
  * voyage.rs:86-99/:250-260, jina.rs:96-108/:335-348). API keys get the
  * same basic validation (non-empty, no surrounding whitespace —
  * voyage.rs:25-37) at construction; `validateApiKey()` mirrors the
  * minimal-request probe (openai.rs:226-231).
  *
  * 100 TB note: `create` runs on the DRIVER (cheap string work); the
  * returned provider is a config-only case class shipped to executors,
  * where [[Embeddings.embedStage]] builds one warm handle per partition.
  */
object ModelRegistry {

  /** One remote provider family's catalog entry. */
  final case class ProviderInfo(
      name: String,
      defaultEndpoint: String,
      /** strict-mode allow-list → hidden size (None = allowed, dim unknown
        * — cannot happen in the shipped catalogs but keeps shape honest). */
      knownDims: Map[String, Int],
      /** strict-mode model allow-list (superset of knownDims' keys when a
        * model is allowed but its dim is discovered). */
      allowedModels: Set[String],
      /** per-model max input length (tokens); `defaultMaxInputLen` for the
        * rest. */
      maxInputLens: Map[String, Int],
      defaultMaxInputLen: Int)

  /** openai.rs:15-18 (models), :85-90 (dims), :104 (endpoint), :222-224
    * (max len — flat 8192). */
  val OpenAI: ProviderInfo = ProviderInfo(
    name = "openai",
    defaultEndpoint = "https://api.openai.com/v1/embeddings",
    knownDims = Map(
      "text-embedding-ada-002" -> 1536,
      "text-embedding-3-small" -> 1536,
      "text-embedding-3-large" -> 3072),
    allowedModels = Set(
      "text-embedding-ada-002", "text-embedding-3-small",
      "text-embedding-3-large"),
    maxInputLens = Map.empty,
    defaultMaxInputLen = 8192)

  /** voyage.rs:15-21 (models), :86-99 (dims), :109 (endpoint), :250-260
    * (max lens). */
  val Voyage: ProviderInfo = ProviderInfo(
    name = "voyage",
    defaultEndpoint = "https://api.voyageai.com/v1/embeddings",
    knownDims = Map(
      "voyage-3-large" -> 1024, "voyage-3.5" -> 1024,
      "voyage-3.5-lite" -> 1024, "voyage-code-3" -> 1024,
      "voyage-finance-2" -> 1024, "voyage-law-2" -> 1024,
      "voyage-code-2" -> 1536),
    allowedModels = Set(
      "voyage-3-large", "voyage-3.5", "voyage-3.5-lite", "voyage-code-3",
      "voyage-finance-2", "voyage-law-2", "voyage-code-2"),
    maxInputLens = Map(
      "voyage-3-large" -> 32000, "voyage-3.5" -> 32000,
      "voyage-3.5-lite" -> 32000, "voyage-code-3" -> 32000,
      "voyage-finance-2" -> 32000, "voyage-law-2" -> 16000,
      "voyage-code-2" -> 16000),
    defaultMaxInputLen = 8192)

  /** jina.rs:15-27 (models), :96-108 (dims), :122 (endpoint), :335-348
    * (max lens). */
  val Jina: ProviderInfo = ProviderInfo(
    name = "jina",
    defaultEndpoint = "https://api.jina.ai/v1/embeddings",
    knownDims = Map(
      "jina-embeddings-v4" -> 2048, "jina-clip-v2" -> 1024,
      "jina-embeddings-v3" -> 1024, "jina-colbert-v2" -> 128,
      "jina-clip-v1" -> 768, "jina-colbert-v1-en" -> 128,
      "jina-embeddings-v2-base-es" -> 768,
      "jina-embeddings-v2-base-code" -> 768,
      "jina-embeddings-v2-base-de" -> 768,
      "jina-embeddings-v2-base-zh" -> 768,
      "jina-embeddings-v2-base-en" -> 768),
    allowedModels = Set(
      "jina-embeddings-v4", "jina-clip-v2", "jina-embeddings-v3",
      "jina-colbert-v2", "jina-clip-v1", "jina-colbert-v1-en",
      "jina-embeddings-v2-base-es", "jina-embeddings-v2-base-code",
      "jina-embeddings-v2-base-de", "jina-embeddings-v2-base-zh",
      "jina-embeddings-v2-base-en"),
    maxInputLens = Map("jina-embeddings-v4" -> 32000),
    defaultMaxInputLen = 8192)

  private val providers = Seq(OpenAI, Voyage, Jina)

  /** A parsed model id, pre-construction. */
  final case class Resolved(provider: Option[ProviderInfo], model: String,
                            strict: Boolean) {
    def isLocal: Boolean = provider.isEmpty
  }

  /** Prefix dispatch (mod.rs:135-178): `name:` = passthrough, `name/` =
    * strict; no recognized prefix = local artifact path. */
  def resolve(modelId: String): Resolved = {
    providers.iterator.flatMap { p =>
      if (modelId.startsWith(p.name + ":"))
        Some(Resolved(Some(p), modelId.drop(p.name.length + 1), strict = false))
      else if (modelId.startsWith(p.name + "/"))
        Some(Resolved(Some(p), modelId.drop(p.name.length + 1), strict = true))
      else None
    }.nextOption().getOrElse(Resolved(None, modelId, strict = false))
  }

  /** voyage.rs:25-37 — non-empty, no surrounding whitespace; real
    * validation is the [[validateApiKey]] probe. */
  private[embed] def validateApiKeyBasic(apiKey: String): Unit = {
    if (apiKey.isEmpty)
      throw new IllegalArgumentException("API key is required")
    if (apiKey.trim != apiKey)
      throw new IllegalArgumentException(
        "API key must not have leading or trailing whitespace")
  }

  /** Max input length (tokens) for a model id — remote models answer from
    * the catalog; local models from the artifact-backed provider's
    * construction-time default (ref utils.rs `get_max_input_length` reads
    * it from the model config). */
  def maxInputLen(modelId: String): Int = {
    val r = resolve(modelId)
    r.provider match {
      case Some(p) => p.maxInputLens.getOrElse(r.model, p.defaultMaxInputLen)
      case None => LocalDefaultMaxInputLen
    }
  }

  /** Local artifacts carry no tokenizer config in this engine; 512 is the
    * BERT-family default the reference falls back to (utils.rs:23-60). */
  val LocalDefaultMaxInputLen: Int = 512

  /** Construct a provider from a model id (mod.rs `create_model`).
    *
    * @param apiKey  required for remote models (basic-validated);
    *                ignored for local artifacts.
    * @param apiUrl  endpoint override (None = provider default).
    * @param dim     required when a passthrough model id is unknown to the
    *                catalog AND discovery is not wanted up-front; when None
    *                for such a model, the returned provider discovers its
    *                dimension from the first response and pins it
    *                (openai.rs:207).
    */
  def create(modelId: String, apiKey: String = "",
             apiUrl: Option[String] = None,
             timeoutMs: Long = 10000,
             dim: Option[Int] = None): TextToEmbeddings = {
    // `transformer:<path>` — a BERT-family checkpoint directory (or
    // .safetensors file) run through the pure-JVM encoder forward
    // (Transformer.scala; ref local.rs behind mod.rs:180-204's local
    // fallthrough). dim, when given, is validated against the
    // checkpoint's hidden size at load.
    if (modelId.startsWith("transformer:")) {
      return Embeddings.TransformerProvider(
        modelId.stripPrefix("transformer:"),
        maxInputLen = Some(LocalDefaultMaxInputLen), declaredDim = dim)
    }
    // `decoder:<path>[#last|#mean]` — a GPT-2-layout decoder checkpoint
    // directory (or .safetensors file) run through the pure-JVM CAUSAL
    // forward (Decoder.scala; r15 VERDICT #4 closes the reference's
    // model-shape dispatch, mod.rs:65-70 — local.rs serves decoder
    // checkpoints through the same loader). The optional fragment
    // overrides the pooling (config.json's "pooling" key otherwise;
    // default last-token, the decoder-embedder convention).
    if (modelId.startsWith("decoder:")) {
      val spec = modelId.stripPrefix("decoder:")
      val (path, pool) = spec.indexOf('#') match {
        case -1 => (spec, None)
        case i => (spec.take(i), Some(spec.drop(i + 1)))
      }
      return Embeddings.DecoderProvider(path, pooling = pool,
        maxInputLen = Some(LocalDefaultMaxInputLen), declaredDim = dim)
    }
    // `safetensors:<path>[#<tensor>]` — a real weight file in the public
    // interchange format; tensor name defaults to "embedding".
    if (modelId.startsWith("safetensors:")) {
      val spec = modelId.stripPrefix("safetensors:")
      val (path, tensor) = spec.indexOf('#') match {
        case -1 => (spec, "embedding")
        case i => (spec.take(i), spec.drop(i + 1))
      }
      return Embeddings.SafetensorsProvider(path, tensor,
        dim.getOrElse(throw new IllegalArgumentException(
          s"safetensors model '$modelId' needs an explicit dim")),
        maxInputLen = Some(LocalDefaultMaxInputLen))
    }
    val r = resolve(modelId)
    r.provider match {
      case None =>
        // an unprefixed id naming a checkpoint DIRECTORY is a transformer
        // checkpoint (the sentence-transformers on-disk layout: a folder
        // with model.safetensors) — ref mod.rs:180-204 falls local paths
        // through to candle the same way
        val f = new java.io.File(r.model)
        if (f.isDirectory && new java.io.File(f, "model.safetensors").isFile)
          return Embeddings.TransformerProvider(r.model,
            maxInputLen = Some(LocalDefaultMaxInputLen), declaredDim = dim)
        LocalModelProvider(r.model, dim.getOrElse(
          throw new IllegalArgumentException(
            s"local model '$modelId' needs an explicit dim (the artifact is " +
              "validated against it at load)")),
          maxInputLen = Some(LocalDefaultMaxInputLen))
      case Some(p) =>
        if (r.strict && !p.allowedModels.contains(r.model))
          throw new IllegalArgumentException(
            s"Invalid model: ${r.model}")
        validateApiKeyBasic(apiKey)
        val resolvedDim = dim.orElse(p.knownDims.get(r.model))
        val http = (d: Int) => HttpProvider(
          endpoint = apiUrl.getOrElse(p.defaultEndpoint),
          model = r.model, dim = d, timeoutMs = timeoutMs,
          headers = Map("Authorization" -> s"Bearer $apiKey"))
        resolvedDim match {
          case Some(d) => http(d)
          case None => DiscoveringProvider(http)
        }
    }
  }

  /** Minimal-request key probe (openai.rs:226-231 — `predict(["test"])`).
    * Throws the provider's error on a bad key / unreachable endpoint. */
  def validateApiKey(provider: TextToEmbeddings): Unit = {
    provider.embedBatch(Seq("test"))
    ()
  }

  /** Passthrough model with unknown dimension: the first successful batch
    * pins the dimension (ref `hidden_size_cache` OnceLock, openai.rs:207);
    * every later batch is validated against it by the wrapped
    * [[HttpProvider]]. `dim` before discovery is a construction-order bug
    * and fails loudly (openai.rs:215-219 `expect`).
    *
    * Discovery happens independently per partition (per warm handle); all
    * partitions talk to the same model, so they pin the same value —
    * protocol drift mid-job surfaces as the wrapped provider's dimension
    * error.
    */
  final case class DiscoveringProvider(
      makeHttp: Int => HttpProvider) extends TextToEmbeddings {

    // NOT @transient: a provider discovered on the driver ships pinned to
    // executors (the closest a distributed setting gets to the reference's
    // process-wide OnceLock); an undiscovered one discovers per handle.
    private var discovered: Option[HttpProvider] = None
    @volatile private var knownDim: Int = -1

    def dim: Int = {
      if (knownDim < 0)
        throw new IllegalStateException(
          "model dimension not yet discovered — embed a batch first or pass " +
            "dim explicitly")
      knownDim
    }

    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = synchronized {
      discovered match {
        case Some(p) => p.embedBatch(texts)
        case None =>
          // First batch: fetch with an unpinned probe (dim = -1 disables
          // the per-vector dimension check only for this one call), infer
          // the dimension, then build the pinned provider for the rest of
          // this handle's life.
          val probe = makeHttp(-1)
          val vecs = probe.embedBatch(texts)
          val d = vecs.headOption.map(_.length).getOrElse(
            throw new IllegalStateException(
              "cannot discover model dimension from an empty batch"))
          if (d <= 0 || vecs.exists(_.length != d))
            throw new IllegalStateException(
              s"inconsistent embedding dimensions in discovery batch " +
                s"(${vecs.map(_.length).distinct.mkString(",")})")
          knownDim = d
          discovered = Some(makeHttp(d))
          vecs
      }
    }
  }

  /** Pre-truncation before tokenization (utils.rs:4-19): cap raw text at
    * `maxSeqLen * 8` UTF-8 BYTES (8 = worst-case bytes/token), cutting at
    * a char boundary — never mid-codepoint, never mid-surrogate-pair. The
    * tokenizer's own limit remains the final guarantee; this just stops
    * pathological inputs from melting the tokenizer. */
  def preTruncate(text: String, maxSeqLen: Int): String = {
    val byteLimit = math.min(
      maxSeqLen.toLong * BytesPerTokenUpperBound, Int.MaxValue).toInt
    // Cheap accept: UTF-8 length >= UTF-16 length is false in general
    // (a 2-byte char is one UTF-16 unit), but every char is at MOST 3
    // UTF-8 bytes per UTF-16 unit, and at LEAST 1 — so a string of
    // text.length <= byteLimit/3 chars always fits without encoding.
    if (text.length.toLong * 3 <= byteLimit) return text
    var bytes = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val w = utf8Width(cp)
      if (bytes + w > byteLimit) return text.substring(0, i)
      bytes += w
      i += Character.charCount(cp)
    }
    text
  }

  /** utils.rs:6 — worst-case bytes per BPE token. */
  val BytesPerTokenUpperBound: Int = 8

  private def utf8Width(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
}
