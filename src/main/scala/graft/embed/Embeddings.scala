package graft.embed

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Text→embedding stage (K8) — the Spark-native analog of the reference's
  * embeddings cdylib (embeddings/src/ffi.rs:78; provider trait shape
  * embeddings/src/model/mod.rs:65-70: batch of texts → batch of vectors).
  *
  * Providers are pluggable; the container is offline, so the default is a
  * DETERMINISTIC feature-hashing provider (bucket = rolling polynomial hash
  * of the token mod dim, weight = token count) — honest about being a stub
  * for the remote/ONNX providers the reference dlopens
  * (knn/embeddings.cpp:75-146), while exercising the real distributed
  * plumbing: one provider instance per partition (the model-handle pattern),
  * batched invocation, schema evolution.
  *
  * 100 TB design: the stage is mapPartitions — no shuffle, no driver
  * round-trips; provider construction cost is amortized per partition, and
  * batches bound peak memory the way the reference's rayon batches do.
  */
object Embeddings {

  /** Provider contract (ref model/mod.rs:65-70). Implementations must be
    * constructible on executors (the factory is shipped, not the model). */
  trait TextToEmbeddings extends Serializable {
    def dim: Int
    def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Shared token→bucket kernel: the same rolling polynomial hash as
    * TextFunctions.fingerprint (and the q_embed_stub oracle SQL replays it)
    * — one definition so providers and oracle can never silently diverge.
    * Hashes CODEPOINTS (not UTF-16 code units): DuckDB's `unicode(c)` and
    * fingerprintScala both see codepoints, so a supplementary-plane
    * character (emoji) must not split into two surrogate units here. */
  private[embed] def hashBucket(token: String, buckets: Int): Int = {
    var acc = 0L
    val it = token.codePoints().iterator()
    while (it.hasNext) {
      acc = (acc * 31 + it.next().toLong) % 1000000007L
    }
    (acc % buckets).toInt
  }

  /** Deterministic offline provider: feature-hashed token counts.
    * `normalize=false` keeps exact integer counts (oracle-comparable);
    * `normalize=true` gives unit vectors (similarity-ready). */
  /** In-place L2 normalization (no-op on the zero vector) — ONE
    * definition for every float-array provider (review r18-7; the
    * double-pooled analog lives in pooledToFloat). */
  private def l2NormalizeInPlace(v: Array[Float]): Unit = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n > 0) {
      var i = 0
      while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 }
    }
  }

  /** The bag-of-buckets x projection kernel shared by the local-matrix
    * providers (review r18-7): weighted sum of the counted rows. */
  private def projectCounts(w: Array[Array[Float]], dim: Int,
                            counts: scala.collection.mutable.LongMap[Int])
      : Array[Float] = {
    val v = new Array[Float](dim)
    counts.foreach { case (b, c) =>
      val row = w(b.toInt)
      var i = 0
      while (i < dim) { v(i) += c * row(i); i += 1 }
    }
    v
  }

  final case class HashingProvider(dim: Int, normalize: Boolean = true)
      extends TextToEmbeddings {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Float](dim)
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        v(hashBucket(tok, dim)) += 1.0f
      }
      if (normalize) l2NormalizeInPlace(v)
      v
    }
  }

  /** Deterministic offline provider #2: seeded random-projection embeddings
    * — a dense, model-like vector space (the Johnson-Lindenstrauss classic:
    * token-count vectors over `vocabDim` hash buckets projected through a
    * seeded Gaussian matrix into `dim` dims, unit-normalized). The matrix
    * is the "model weights": built lazily ONCE per provider instance — i.e.
    * once per partition in [[embedStage]], the same model-handle lifecycle
    * a real ONNX/remote provider needs (ref model/mod.rs:65-70). Cosine
    * structure of the sparse token space is approximately preserved, so
    * downstream similarity search behaves like it would with a real model.
    */
  final case class RandomProjectionProvider(dim: Int, vocabDim: Int = 4096,
                                            seed: Long = 42L,
                                            normalize: Boolean = true)
      extends TextToEmbeddings {
    // ONE definition of each kernel: the matrix is LocalModel's Gaussian
    // init and the projection is the shared bag-of-buckets kernel — a fix
    // to either must not miss this provider (r19 review)
    @transient private lazy val proj: Array[Array[Float]] =
      LocalModel.gaussianWeights(vocabDim, dim, seed)
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val counts = scala.collection.mutable.LongMap.empty[Int]
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val b = hashBucket(tok, vocabDim)
        counts(b) = counts.getOrElse(b.toLong, 0) + 1
      }
      val v = projectCounts(proj, dim, counts)
      if (normalize) l2NormalizeInPlace(v)
      v
    }
  }

  /** Remote HTTP embedding provider — the reference treats remote models as
    * first-class providers (embeddings/src/model/mod.rs:65-70:
    * OpenAI/Voyage/Jina behind the same trait; batch/retry logic tested
    * in-crate, error_handling_test.rs). Speaks the common embeddings wire
    * shape those services share:
    * {{{
    *   POST endpoint   {"model": m, "input": [text, ...]}
    *   200             {"data": [{"embedding": [f, ...]}, ...]}   // input order
    * }}}
    * Lifecycle matches [[embedStage]]'s model-handle contract: the case
    * class (config only) is shipped to executors; the HttpClient is built
    * lazily ONCE per instance — i.e. once per partition — and every batch
    * reuses it (connection pooling).
    *
    * Failure policy (ref error_handling_test.rs shapes):
    *  - 429 / 5xx / transport errors: exponential backoff
    *    (`baseBackoffMs << attempt`), up to `maxRetries` retries, then the
    *    last error propagates and FAILS THE TASK — a silent zero-vector
    *    would poison every downstream similarity join;
    *  - other 4xx: fail fast, no retry (a malformed request never succeeds
    *    on retry);
    *  - a 200 whose vector count or dimension disagrees with the request
    *    is a protocol error, not retried.
    */
  /** `headers` carries authentication (`Authorization: Bearer …` /
    * `x-api-key: …` — the OpenAI/Voyage/Jina wire shapes all authenticate
    * via a request header, ref embeddings/src/model/mod.rs provider
    * configs); Content-Type is always set by the provider itself and
    * cannot be overridden. */
  final case class HttpProvider(endpoint: String, model: String, dim: Int,
                                maxRetries: Int = 3, baseBackoffMs: Long = 50,
                                timeoutMs: Long = 10000,
                                headers: Map[String, String] = Map.empty,
                                maxBackoffMs: Long = 10000)
      extends TextToEmbeddings {

    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
        .build()
    @transient private lazy val om =
      new com.fasterxml.jackson.databind.ObjectMapper()

    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      if (texts.isEmpty) return Nil
      val body = {
        val root = om.createObjectNode()
        root.put("model", model)
        val arr = root.putArray("input")
        texts.foreach(arr.add)
        om.writeValueAsString(root)
      }
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
      headers.toSeq.sortBy(_._1)
        .filterNot(_._1.equalsIgnoreCase("Content-Type"))
        .foreach { case (k, v) => builder.header(k, v) }
      val req = builder
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      var attempt = 0
      var lastErr: Throwable = null
      while (attempt <= maxRetries) {
        // cap the shift (a pathological maxRetries would overflow the long
        // shift into a negative sleep, ADVICE r8) AND the computed sleep
        // itself (ADVICE r9: base << 20 is ~14.6 h at the 50 ms default —
        // a stalled endpoint should fail the task in seconds, not hang it)
        if (attempt > 0)
          Thread.sleep(math.min(
            baseBackoffMs << math.min(attempt - 1, 20), maxBackoffMs))
        try {
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 =>
              // a 200 whose body does not parse is a PROTOCOL error like
              // the wrong-count/wrong-dim cases — Jackson's exceptions
              // extend IOException, so without this rewrap the retry loop
              // below would burn the whole backoff budget re-sending a
              // request whose response will never parse
              return try parse(resp.body(), texts.size) catch {
                case e: com.fasterxml.jackson.core.JacksonException =>
                  throw new IllegalStateException(
                    s"malformed embedding response: ${String.valueOf(e.getMessage).take(200)}", e)
              }
            case code if code == 429 || code >= 500 =>
              lastErr = new java.io.IOException(
                s"embedding endpoint $endpoint returned $code (attempt ${attempt + 1})")
            case code =>
              throw new IllegalArgumentException(
                s"embedding endpoint $endpoint rejected request: $code ${resp.body().take(200)}")
          }
        } catch {
          case e: java.io.IOException => lastErr = e
          case e: InterruptedException => throw e
        }
        attempt += 1
      }
      throw new java.io.IOException(
        s"embedding request failed after ${maxRetries + 1} attempts", lastErr)
    }

    private def parse(body: String, expected: Int): Seq[Array[Float]] = {
      val data = om.readTree(body).get("data")
      if (data == null || !data.isArray || data.size() != expected)
        throw new IllegalStateException(
          s"embedding response has ${if (data == null) "no" else data.size()} " +
            s"vectors for $expected inputs")
      (0 until expected).map { i =>
        val emb = data.get(i).get("embedding")
        // dim <= 0 = UNPINNED (ModelRegistry's discovery probe): accept any
        // per-vector dimension here; the registry infers + pins from the
        // result and every later batch goes through a pinned instance.
        if (emb == null || !emb.isArray || (dim > 0 && emb.size() != dim))
          throw new IllegalStateException(
            s"embedding $i has dimension ${if (emb == null) "none" else emb.size()}, expected $dim")
        val width = if (dim > 0) dim else emb.size()
        val v = new Array[Float](width)
        var j = 0
        while (j < width) {
          val el = emb.get(j)
          // JsonNode.floatValue() returns 0.0 for non-numeric nodes — the
          // silent zero-vector this whole error policy exists to prevent
          if (el == null || !el.isNumber)
            throw new IllegalStateException(
              s"embedding $i element $j is not numeric: ${String.valueOf(el).take(40)}")
          v(j) = el.floatValue(); j += 1
        }
        v
      }
    }
  }

  /** The weights-artifact format behind [[LocalModelProvider]] — the
    * engine's stand-in for an ONNX/safetensors file (the reference's local
    * models load weight files from disk, embeddings/src/model/local.rs;
    * real inference libs aren't in this container, so the "model" is a
    * dense (vocabDim × dim) float32 projection with a validated header,
    * making the LIFECYCLE — file artifact → load once per executor → warm
    * handle — fully real). Layout: magic, version, vocabDim, dim, then
    * vocabDim·dim big-endian float32 weights. */
  object LocalModel {
    private val Magic = 0x47524654 // "GRFT"

    /** Disk loads performed in this JVM — the spec's load-once
      * instrumentation (one increment per actual artifact read). */
    val loadCount = new java.util.concurrent.atomic.AtomicLong(0)

    /** JVM-wide weight cache: the reference daemon builds ONE model handle
      * and every worker thread shares it (text_model_wrapper.rs hands a
      * single `ModelHandle` across the FFI; threads fan in). The Spark
      * analog is executor-scoped: the first partition to need an artifact
      * loads it, the other `spark.executor.cores` partitions reuse the
      * matrix — at 32 cores that is a 32× cut in both load IO and resident
      * weight memory. `computeIfAbsent` holds concurrent partitions on the
      * same key, so exactly one disk read happens per (path, dim) per JVM.
      * Strong references by design (the daemon keeps its model for its
      * lifetime); [[evictShared]] is the seam for artifact hot-swap. */
    private val shared =
      new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[Array[Float]]]()

    private[embed] def sharedWeights(path: String, expectDim: Int): Array[Array[Float]] =
      shared.computeIfAbsent((path, expectDim), _ => load(path, expectDim))

    /** Drop a cached artifact (all dims) — call after overwriting the file
      * so the next handle reloads. Returns how many entries were dropped. */
    def evictShared(path: String): Int = {
      val keys = shared.keySet().iterator()
      var n = 0
      while (keys.hasNext) {
        if (keys.next()._1 == path) { keys.remove(); n += 1 }
      }
      n
    }

    /** Serialize trained weights to `path` (driver-side, once). */
    def writeArtifact(path: String, weights: Array[Array[Float]]): Unit = {
      require(weights.nonEmpty, "empty weight matrix")
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path)))
      try {
        out.writeInt(Magic); out.writeInt(1)
        out.writeInt(weights.length); out.writeInt(weights.head.length)
        weights.foreach { row =>
          require(row.length == weights.head.length, "ragged weight matrix")
          row.foreach(out.writeFloat)
        }
      } finally out.close()
    }

    /** Seeded Gaussian init — the model-like weight distribution
      * ([[RandomProjectionProvider]]'s matrix, persisted). */
    def gaussianWeights(vocabDim: Int, dim: Int, seed: Long): Array[Array[Float]] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(vocabDim)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    }

    /** Load + validate an artifact. `expectDim` is the provider's declared
      * output dimension — a mismatched artifact fails HERE, at handle
      * construction, not as silently-wrong vectors downstream (the same
      * dim-validation contract as [[HttpProvider.parse]]). A relative
      * `path` absent from the local FS falls back to
      * `SparkFiles.get` — the idiomatic way a cluster ships a model
      * artifact to every executor (`SparkContext.addFile`). */
    private[embed] def load(path: String, expectDim: Int): Array[Array[Float]] = {
      val f = new java.io.File(path)
      val resolved =
        if (f.isFile) f
        else new java.io.File(org.apache.spark.SparkFiles.get(f.getName))
      if (!resolved.isFile)
        throw new java.io.FileNotFoundException(
          s"model artifact not found at $path (also tried SparkFiles '${f.getName}')")
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(resolved)))
      try {
        val magic = in.readInt()
        if (magic != Magic) throw new IllegalStateException(
          s"$path is not a graft model artifact (magic ${magic.toHexString})")
        val version = in.readInt()
        if (version != 1) throw new IllegalStateException(
          s"unsupported model artifact version $version at $path")
        val vocabDim = in.readInt()
        val dim = in.readInt()
        if (dim != expectDim) throw new IllegalStateException(
          s"model artifact $path has dim $dim, provider declared $expectDim")
        if (vocabDim <= 0 || dim <= 0) throw new IllegalStateException(
          s"corrupt model artifact $path: vocabDim=$vocabDim dim=$dim")
        val w = Array.ofDim[Float](vocabDim, dim)
        var b = 0
        while (b < vocabDim) {
          var i = 0
          while (i < dim) { w(b)(i) = in.readFloat(); i += 1 }
          b += 1
        }
        loadCount.incrementAndGet()
        w
      } finally in.close()
    }
  }

  /** Local file-backed model provider — the reference's local-inference
    * lifecycle (embeddings/src/model/local.rs behind the mod.rs:65-70
    * trait): the case class ships CONFIG only (path + declared dim); the
    * weight matrix resolves lazily through the EXECUTOR-SHARED cache
    * ([[LocalModel.sharedWeights]] — one disk load per (path, dim) per
    * JVM, every partition's handle reuses it, the daemon's
    * one-model-many-threads shape) with header/dimension validation at
    * load. Inference is the token-count × projection kernel of
    * [[RandomProjectionProvider]], reading the weights from the artifact
    * instead of deriving them from a seed. */
  /** `maxInputLen` (tokens), when set, pre-truncates each text to
    * `maxInputLen * 8` UTF-8 bytes before the token loop — the reference's
    * local models guard their tokenizer the same way
    * (local.rs:1011 `pre_truncate_text`, utils.rs:4-19); None preserves the
    * full text (the oracle-compared gate path). */
  final case class LocalModelProvider(modelPath: String, dim: Int,
                                      normalize: Boolean = false,
                                      maxInputLen: Option[Int] = None)
      extends TextToEmbeddings {
    @transient private lazy val weights: Array[Array[Float]] =
      LocalModel.sharedWeights(modelPath, dim)
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val w = weights
      val vocabDim = w.length
      texts.map { t0 =>
        val t = maxInputLen.fold(t0)(ModelRegistry.preTruncate(t0, _))
        val counts = scala.collection.mutable.LongMap.empty[Int]
        t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
          val b = hashBucket(tok, vocabDim)
          counts(b) = counts.getOrElse(b.toLong, 0) + 1
        }
        val v = projectCounts(w, dim, counts)
        if (normalize) l2NormalizeInPlace(v)
        v
      }
    }
  }

  /** SAFETENSORS-backed provider: real inference against a real weight
    * file in the public interchange format ([[Safetensors]] — pure-JVM
    * parse, F32). The kernel is the same hash-bucket bag-of-tokens ×
    * projection as [[LocalModelProvider]], with the matrix loaded ONCE per
    * executor from the named tensor (vocab-buckets × dim, row-major).
    * Dimension is validated against the tensor's second axis at load. */
  /** With `vocabPath` set, tokens come from the real [[WordPiece]]
    * tokenizer and the token ID indexes the matrix row DIRECTLY — true
    * embedding-table lookup over the exported artifact pair
    * (vocab.txt + safetensors); without it, whitespace tokens hash into
    * the rows (the bag-of-buckets kernel). */
  final case class SafetensorsProvider(modelPath: String, tensor: String,
                                       dim: Int, normalize: Boolean = false,
                                       maxInputLen: Option[Int] = None,
                                       vocabPath: Option[String] = None)
      extends TextToEmbeddings {
    @transient private lazy val weights: Array[Array[Float]] = {
      val w = Safetensors.sharedMatrix(modelPath, tensor)
      require(w.length > 0 && w(0).length == dim,
        s"safetensors '$modelPath' tensor '$tensor' is " +
          s"${w.length}x${if (w.isEmpty) 0 else w(0).length}, " +
          s"provider declared dim $dim")
      vocabPath.foreach { vp =>
        val v = WordPiece.sharedVocab(vp)
        // ids are line numbers and can be SPARSE (blank vocab lines), so
        // the bound is the greatest id, not the token count
        require(w.length > v.maxId,
          s"safetensors '$modelPath' has ${w.length} rows but vocab '$vp' " +
            s"ids reach ${v.maxId} — every id must index a row")
      }
      w
    }
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val w = weights
      val vocab = vocabPath.map(WordPiece.sharedVocab)
      val vocabDim = w.length
      texts.map { t0 =>
        val t = maxInputLen.fold(t0)(ModelRegistry.preTruncate(t0, _))
        val counts = scala.collection.mutable.LongMap.empty[Int]
        vocab match {
          case Some(v) =>
            WordPiece.tokenize(t, v).foreach { id =>
              counts(id) = counts.getOrElse(id.toLong, 0) + 1
            }
          case None =>
            t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
              val b = hashBucket(tok, vocabDim)
              counts(b) = counts.getOrElse(b.toLong, 0) + 1
            }
        }
        val v = projectCounts(w, dim, counts)
        if (normalize) l2NormalizeInPlace(v)
        v
      }
    }
  }

  /** TRANSFORMER checkpoint provider — the reference's local-inference
    * capability itself, not a stand-in (embeddings/src/model/local.rs:
    * safetensors → tokenize → BERT forward → mean pool → L2 normalize),
    * run by the pure-JVM [[Transformer]] encoder. `modelPath` is a
    * checkpoint directory (model.safetensors + optional config.json +
    * optional vocab.txt) or a .safetensors file. With a vocab the real
    * [[WordPiece]] tokenizer runs, wrapped in `[CLS]`/`[SEP]` when the
    * vocab carries them (the BERT input convention); without one,
    * whitespace tokens hash into the embedding rows (the engine's
    * oracle-replayable tokenizer family). Load-once-per-JVM handle
    * lifecycle; sequences truncate to min(maxInputLen, position table). */
  final case class TransformerProvider(modelPath: String,
                                       normalize: Boolean = true,
                                       maxInputLen: Option[Int] = None,
                                       declaredDim: Option[Int] = None)
      extends TextToEmbeddings {
    @transient private lazy val loaded: Transformer.Loaded = {
      val l = Transformer.sharedModel(modelPath)
      declaredDim.foreach(d => require(d == l.model.hidden,
        s"checkpoint $modelPath has hidden size ${l.model.hidden}, " +
          s"caller declared $d"))
      l
    }
    def dim: Int = loaded.model.hidden
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val m = loaded.model
      val cap = math.min(
        maxInputLen.getOrElse(ModelRegistry.LocalDefaultMaxInputLen),
        m.maxPositions)
      texts.map { t0 =>
        val t = ModelRegistry.preTruncate(t0, cap)
        val ids: Array[Int] = loaded.vocab match {
          case Some(v) =>
            val cls = v.ids.get("[CLS]")
            val sep = v.ids.get("[SEP]")
            val budget = cap - cls.size - sep.size
            val core = WordPiece.tokenize(t, v).take(budget)
            (cls.iterator ++ core.iterator ++ sep.iterator).toArray
          case None =>
            t.trim.split("\\s+").iterator.filter(_.nonEmpty).take(cap)
              .map(tok => hashBucket(tok, m.vocabRows)).toArray
        }
        pooledToFloat(Transformer.forward(m, ids), normalize)
      }
    }
  }

  /** The pooled-double → float32 output tail shared by the transformer
    * and decoder providers: L2-normalize (a zero vector stays zero) or
    * plain cast — ONE definition (review r16-6). */
  private[embed] def pooledToFloat(pooled: Array[Double],
                                   normalize: Boolean): Array[Float] = {
    val out = new Array[Float](pooled.length)
    if (normalize) {
      var s = 0.0
      var i = 0
      while (i < pooled.length) { s += pooled(i) * pooled(i); i += 1 }
      val nrm = math.sqrt(s)
      if (nrm > 0) {
        i = 0
        while (i < pooled.length) { out(i) = (pooled(i) / nrm).toFloat; i += 1 }
      }
    } else {
      var i = 0
      while (i < pooled.length) { out(i) = pooled(i).toFloat; i += 1 }
    }
    out
  }

  /** [[TransformerProvider]]'s DECODER twin (r15 VERDICT #4): a GPT-2
    * layout checkpoint served through [[graft.embed.Decoder]]'s pure-JVM
    * causal forward — pre-LN blocks, learned positions, last-token (or
    * mean) pooling, then the same normalize/float32 contract. Tokenization
    * mirrors the encoder provider minus the [CLS]/[SEP] wrap (decoders
    * have no special-token sandwich): vocab.txt → WordPiece ids directly;
    * absent → whitespace hash buckets over the wte rows. */
  final case class DecoderProvider(modelPath: String,
                                   pooling: Option[String] = None,
                                   normalize: Boolean = true,
                                   maxInputLen: Option[Int] = None,
                                   declaredDim: Option[Int] = None)
      extends TextToEmbeddings {
    @transient private lazy val loaded: Decoder.Loaded = {
      val l = Decoder.sharedModel(modelPath, pooling)
      declaredDim.foreach(d => require(d == l.model.hidden,
        s"checkpoint $modelPath has hidden size ${l.model.hidden}, " +
          s"caller declared $d"))
      l
    }
    def dim: Int = loaded.model.hidden
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val m = loaded.model
      val cap = math.min(
        maxInputLen.getOrElse(ModelRegistry.LocalDefaultMaxInputLen),
        m.maxPositions)
      texts.map { t0 =>
        val t = ModelRegistry.preTruncate(t0, cap)
        val ids: Array[Int] = loaded.spm match {
          case Some(sp) => sp.encode(t).take(cap)
          case None => loaded.vocab match {
            case Some(v) => WordPiece.tokenize(t, v).take(cap).toArray
            case None =>
              t.trim.split("\\s+").iterator.filter(_.nonEmpty).take(cap)
                .map(tok => hashBucket(tok, m.vocabRows)).toArray
          }
        }
        pooledToFloat(Decoder.forward(m, ids), normalize)
      }
    }
  }

  /** Provider registry — the seam where remote/local model providers plug in
    * (ref ffi.rs GetLibFuncs). Offline container ships the deterministic
    * stubs; [[HttpProvider]] and [[LocalModelProvider]] are constructed
    * explicitly (they need endpoint/artifact config, not just
    * (dim, normalize)). */
  val providers: Map[String, (Int, Boolean) => TextToEmbeddings] = Map(
    "hash" -> ((dim, norm) => HashingProvider(dim, norm)),
    "randproj" -> ((dim, norm) => RandomProjectionProvider(dim, normalize = norm))
  )

  /** Append `outCol: array<float>` by embedding `textCol`. One provider per
    * partition, invoked in batches of `batchSize`. */
  def embedStage(df: DataFrame, textCol: String, outCol: String,
                 provider: () => TextToEmbeddings,
                 batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(FloatType)))
    val textIdx = df.schema.fieldIndex(textCol)
    // Width must come from cores, not from however few splits the input
    // had (the bandedFrame rule, guide §2): the forward pass is the
    // compute-bound kernel of every transformer/decoder gate, and the
    // sf0.1 documents scan yields 5 splits — the r21 probe measured the
    // decoder-spm forward at 3.6 s wall on 5 tasks (3.7 s task-time sum)
    // on a 32-core box. Round-robin also balances document-length skew.
    // At cluster scale the input partition count normally exceeds
    // defaultParallelism and the repartition is a cheap rebalance of the
    // rows being embedded anyway (they cross the wire once, before the
    // expensive stage — guide §8's "move heavy bytes once" is preserved:
    // the embedding column doesn't exist yet). Streaming micro-batches
    // keep their stateless per-batch shape (no shuffle injected), and a
    // caller that repartitioned explicitly anywhere upstream has expressed
    // a layout opinion the stage must respect (logical-plan check only —
    // no execution).
    val callerPartitioned = df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      case r: org.apache.spark.sql.catalyst.plans.logical
        .RepartitionByExpression => r
    }.isDefined
    val batchDf =
      if (df.isStreaming || callerPartitioned) df
      else df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    batchDf.mapPartitions { it =>
      val p = provider() // one model handle per partition
      it.grouped(batchSize).flatMap { batch =>
        val vecs = p.embedBatch(batch.map(r =>
          Option(r.getString(textIdx)).getOrElse("")))
        // a provider returning the wrong count must fail LOUDLY: lazyZip
        // truncates to the shorter side, silently dropping the trailing
        // rows of every batch (review r18-7; HttpProvider self-validates,
        // the trait is public)
        require(vecs.size == batch.size,
          s"embedBatch returned ${vecs.size} vectors for ${batch.size} " +
            "texts -- a provider must emit exactly one vector per input")
        batch.lazyZip(vecs).map { (r, v) =>
          Row.fromSeq(r.toSeq :+ (v.toSeq: Seq[Float]))
        }
      }
    }(Encoders.row(schema))
  }
}
