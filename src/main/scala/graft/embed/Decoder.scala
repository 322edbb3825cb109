package graft.embed

/** Pure-JVM GPT-style DECODER forward pass — the second local model shape
  * behind the reference's model dispatch (embeddings/src/model/mod.rs:65-70
  * routes to candle/ONNX for whatever architecture the checkpoint declares;
  * local.rs's loader is shape-agnostic). [[Transformer]] covers the
  * BERT-family encoder; this covers the decoder family — causal
  * self-attention, PRE-LayerNorm blocks, learned positions, last-token (or
  * mean) pooling — so a user with a GPT-style embedding checkpoint runs it
  * locally the same way (r15 VERDICT #4, the last reference-capability gap).
  *
  * Checkpoint layout (the public HuggingFace GPT-2 safetensors export,
  * with or without a leading `transformer.` prefix):
  * {{{
  *   wte.weight                 [vocab, hidden]    token embeddings
  *   wpe.weight                 [maxPos, hidden]   learned positions
  *   h.{i}.ln_1.{weight,bias}                      pre-attention LayerNorm
  *   h.{i}.attn.c_attn.{weight,bias}   [hidden, 3*hidden]  fused Q|K|V
  *   h.{i}.attn.c_proj.{weight,bias}   [hidden, hidden]
  *   h.{i}.ln_2.{weight,bias}                      pre-FFN LayerNorm
  *   h.{i}.mlp.c_fc.{weight,bias}      [hidden, inner]
  *   h.{i}.mlp.c_proj.{weight,bias}    [inner, hidden]
  *   ln_f.{weight,bias}                            final LayerNorm
  * }}}
  * GPT-2's linear layers are `Conv1D` — weights stored `[in, out]`, the
  * TRANSPOSE of the `nn.Linear` convention [[Transformer.Linear]] uses —
  * so the loader transposes once at load (and splits `c_attn`'s fused
  * output into Q/K/V thirds, the HF split order).
  *
  * Config (`config.json` beside the weights): `n_head` (or
  * `num_attention_heads`), `layer_norm_epsilon` (default 1e-5 — GPT-2's,
  * not BERT's 1e-12), optional `"pooling": "mean"` (default last-token —
  * the decoder-embedder convention: the last position is the only one that
  * attended to the whole sequence). Head count absent both config and
  * override fails loudly, as in [[Transformer.load]].
  *
  * POSITIONS: learned table (GPT-2, the default) or ROTARY
  * (`"position_embedding_type": "rotary"` — the GPT-NeoX/LLaMA mechanism,
  * Su et al. RoFormer): no wpe tensor; each head's Q/K pairs rotate by
  * angle pos·10000^(-2d/headDim) right after the projections, so relative
  * positions enter attention as rotation differences and the position cap
  * is config-only (`n_positions`), not a table length. The PAIRING is the
  * config's `rope_style`: `"interleaved"` (default — the paper's
  * (2d, 2d+1) pairs) or `"half"` (the HuggingFace GPT-NeoX/LLaMA
  * rotate-half convention, pairs (d, d+headDim/2)); a checkpoint
  * converted from an HF rotary export must declare `"half"` or its
  * embeddings are silently wrong.
  *
  * Forward (the published GPT-2 block, pre-LN):
  * {{{
  *   x_p   = wte[id_p] + wpe[p]                       (no embedding LN)
  *   a     = causalAttn(ln_1(x));  x = x + c_proj(a)
  *   h     = c_proj(gelu(c_fc(ln_2(x))));  x = x + h
  *   out   = ln_f(x);  pool = out[last]  (or mean)
  * }}}
  * Causality: position p attends to positions j <= p only — pinned by
  * DecoderSpec's prefix-invariance test (hidden states of a prefix are
  * unchanged by appended tokens; the encoder twin fails this by design).
  *
  * Numerics mirror [[Transformer]]: float32 weights, double arithmetic,
  * float32 pooled output — so the q_embed_decoder oracle's double-math SQL
  * replay lands on the same float32 bits. GELU is the same published tanh
  * approximation (GPT-2's `gelu_new` IS that formula).
  *
  * 100 TB design: identical to the encoder's — one checkpoint load per JVM
  * ([[sharedModel]]), served through [[Embeddings.embedStage]]'s
  * mapPartitions; no shuffle, no driver round-trips.
  */
object Decoder {

  import Transformer.{Linear, Norm, gelu, layerNorm}

  final case class Block(ln1: Norm, q: Linear, k: Linear, v: Linear,
                         attnProj: Linear, ln2: Norm,
                         fcIn: Linear, fcOut: Linear)

  /** `wpe` empty ⇔ `rope` — rotary positions need no learned table (the
    * GPT-NeoX/LLaMA family layout: positions enter as Q/K rotations in
    * attention, `maxPositions` comes from config `n_positions`). */
  final case class Model(wte: Array[Array[Float]], wpe: Array[Array[Float]],
                         blocks: Array[Block], lnF: Norm,
                         heads: Int, eps: Double, meanPool: Boolean,
                         rope: Boolean = false, maxPos: Int = 0,
                         ropeHalf: Boolean = false) {
    val hidden: Int = wte.headOption.map(_.length).getOrElse(0)
    def vocabRows: Int = wte.length
    def maxPositions: Int = if (rope) maxPos else wpe.length
    require(hidden > 0, "empty token embedding matrix")
    require(heads > 0 && hidden % heads == 0,
      s"hidden $hidden not divisible by $heads heads")
    require(rope == wpe.isEmpty,
      "exactly one position mechanism: wpe table XOR rotary")
    require(!rope || (hidden / heads) % 2 == 0,
      s"rotary positions need an even head dim (hidden $hidden / $heads heads)")
  }

  // ---------------------------------------------------------------- load

  def load(path: String, headsOverride: Option[Int] = None,
           poolOverride: Option[String] = None): Model = {
    val (weightsFile, dir) = Transformer.resolveLayout(path)
    val ts = Safetensors.readAll(weightsFile.toString)
    val prefix =
      if (ts.contains("wte.weight")) ""
      else if (ts.contains("transformer.wte.weight")) "transformer."
      else throw new IllegalStateException(
        s"$weightsFile has no wte.weight — not a GPT-2-layout decoder " +
          s"checkpoint (tensors: ${ts.keys.toSeq.sorted.take(8).mkString(", ")}…)")
    val rd = new Safetensors.CheckpointReader(weightsFile.toString, ts, prefix)
    def mat(name: String): Array[Array[Float]] = rd.mat(name)
    def vec(name: String): Array[Float] = rd.vec(name)
    // gamma/beta tolerance now matches the Transformer loader (r18-7)
    def norm(base: String): Norm = {
      val (w, b) = rd.normPair(base); Norm(w, b)
    }
    // Conv1D [in, out] → Linear [out][in]
    def transposed(m: Array[Array[Float]]): Array[Array[Float]] =
      Array.tabulate(m.head.length, m.length)((o, i) => m(i)(o))
    def conv1d(base: String): Linear =
      Linear(transposed(mat(base + ".weight")), vec(base + ".bias"))

    val wte = mat("wte.weight")
    val hidden = wte.head.length
    val cfg = readDecoderConfig(dir)
    // position mechanism: a ROTARY config (GPT-NeoX/LLaMA family —
    // "position_embedding_type": "rotary") ships no wpe table; positions
    // enter as per-position Q/K rotations inside attention. Otherwise the
    // GPT-2 learned table is required.
    val rope = cfg._4.contains("rotary")
    val wpe =
      if (rope) {
        require(!ts.contains(prefix + "wpe.weight"),
          s"$weightsFile declares rotary positions but ships a wpe table " +
            "— exactly one position mechanism")
        Array.empty[Array[Float]]
      } else mat("wpe.weight")
    if (!rope) require(wpe.head.length == hidden,
      s"position embeddings are ${wpe.head.length}-wide, hidden is $hidden")
    val nBlocks = Iterator.from(0)
      .takeWhile(i => ts.contains(s"${prefix}h.$i.attn.c_attn.weight"))
      .size
    require(nBlocks > 0, s"$weightsFile has no h.0 decoder blocks")
    val blocks = Array.tabulate(nBlocks) { i =>
      val p = s"h.$i"
      val fused = conv1d(s"$p.attn.c_attn") // [3*hidden][hidden] after transpose
      require(fused.w.length == 3 * hidden,
        s"block $i c_attn produces ${fused.w.length} outputs, " +
          s"expected ${3 * hidden} (fused Q|K|V)")
      def slice(part: Int): Linear = Linear(
        java.util.Arrays.copyOfRange(fused.w, part * hidden,
          (part + 1) * hidden),
        java.util.Arrays.copyOfRange(fused.b, part * hidden,
          (part + 1) * hidden))
      val b = Block(
        ln1 = norm(s"$p.ln_1"),
        q = slice(0), k = slice(1), v = slice(2),
        attnProj = conv1d(s"$p.attn.c_proj"),
        ln2 = norm(s"$p.ln_2"),
        fcIn = conv1d(s"$p.mlp.c_fc"),
        fcOut = conv1d(s"$p.mlp.c_proj"))
      require(b.attnProj.outDim == hidden && b.fcOut.outDim == hidden,
        s"block $i output dims disagree with hidden $hidden")
      b
    }
    val heads = cfg._1.orElse(headsOverride)
      .getOrElse(throw new IllegalStateException(
        s"checkpoint at $dir has no config.json with n_head/" +
          "num_attention_heads; the head count cannot be inferred from " +
          "tensor shapes — pass headsOverride or add config.json"))
    val eps = cfg._2.getOrElse(1e-5) // GPT-2's layer_norm_epsilon default
    val meanPool = poolOverride.orElse(cfg._3) match {
      case Some("mean") => true
      case Some("last") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"unknown pooling '$other' (expected 'last' or 'mean')")
    }
    // rotary checkpoints carry no position table — the cap comes from
    // config (n_positions), defaulting to the tokenizer-budget default
    val maxPos = cfg._5.getOrElse(
      graft.embed.ModelRegistry.LocalDefaultMaxInputLen)
    // PAIRING convention (review r18-7): the paper (Su et al.) rotates
    // the INTERLEAVED pairs (2d, 2d+1) -- this layout's default -- while
    // HuggingFace GPT-NeoX/LLaMA exports are trained for ROTATE-HALF
    // pairs (d, d + headDim/2); serving an HF-converted checkpoint with
    // the wrong pairing produces silently-wrong embeddings, so the
    // convention is an explicit config field, not a guess
    val ropeHalf = cfg._6 match {
      case Some("half") => true
      case Some("interleaved") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"unknown rope_style '$other' (expected 'interleaved' or 'half')")
    }
    if (!rope) require(cfg._6.isEmpty,
      "rope_style is only meaningful with position_embedding_type rotary")
    Model(wte, wpe, blocks, norm("ln_f"), heads, eps, meanPool,
      rope = rope, maxPos = maxPos, ropeHalf = ropeHalf)
  }

  /** (heads, eps, pooling, position type, n_positions) from config.json —
    * the GPT-2 key names with the HF-generic fallbacks. */
  private def readDecoderConfig(dir: java.io.File)
      : (Option[Int], Option[Double], Option[String], Option[String],
         Option[Int], Option[String]) = {
    val f = new java.io.File(dir, "config.json")
    if (!f.isFile) return (None, None, None, None, None, None)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(f.toPath))
    def num(k: String): Option[Double] =
      Option(root.get(k)).filter(_.isNumber).map(_.asDouble())
    def str(k: String): Option[String] =
      Option(root.get(k)).filter(_.isTextual).map(_.asText())
    val heads = num("n_head").orElse(num("num_attention_heads")).map(_.toInt)
    val eps = num("layer_norm_epsilon").orElse(num("layer_norm_eps"))
    val posType = str("position_embedding_type")
    val nPos = num("n_positions").orElse(num("max_position_embeddings"))
      .map(_.toInt)
    (heads, eps, str("pooling"), posType, nPos, str("rope_style"))
  }

  // ------------------------------------------------------------- forward

  /** All post-`ln_f` hidden states — the spec surface (DecoderSpec pins
    * causal prefix-invariance on these). [[forward]] pools them. */
  private[embed] def states(m: Model, ids: Array[Int]): Array[Array[Double]] = {
    val h = m.hidden
    if (ids.isEmpty) return Array.empty
    require(ids.length <= m.maxPositions,
      s"sequence of ${ids.length} tokens exceeds ${m.maxPositions} positions" +
        " — truncate before forward")
    val n = ids.length
    var x = Array.tabulate(n) { p =>
      val id = ids(p)
      require(id >= 0 && id < m.vocabRows,
        s"token id $id outside vocab rows ${m.vocabRows}")
      val w = m.wte(id)
      val e = new Array[Double](h)
      var i = 0
      while (i < h) {
        e(i) = w(i).toDouble +
          (if (m.rope) 0.0 else m.wpe(p)(i).toDouble)
        i += 1
      }
      e
    }
    val headDim = h / m.heads
    val scale = 1.0 / math.sqrt(headDim.toDouble)
    // RoPE (Su et al., the GPT-NeoX/LLaMA position mechanism): rotate each
    // head's (2d, 2d+1) pair of Q and K by angle pos·θ_d,
    // θ_d = 10000^(-2d/headDim) — relative positions enter attention as
    // the rotation difference; no learned table, no length-tied rows.
    // Applied IN PLACE right after the Q/K projections, per block
    // (projections see unrotated inputs, exactly the published recipe).
    // The angle depends only on (position, pair index) — the cos/sin
    // tables compute ONCE and serve every head, every block, and both Q
    // and K (review r16-4: trig in the per-head loop was 12× redundant at
    // real widths).
    val ropeCos: Array[Array[Double]] =
      if (!m.rope) null
      else Array.tabulate(n, headDim / 2)((p, d) =>
        math.cos(p * math.pow(10000.0, -2.0 * d / headDim)))
    val ropeSin: Array[Array[Double]] =
      if (!m.rope) null
      else Array.tabulate(n, headDim / 2)((p, d) =>
        math.sin(p * math.pow(10000.0, -2.0 * d / headDim)))
    def applyRope(rows: Array[Array[Double]]): Unit = {
      var p = 0
      while (p < rows.length) {
        val r = rows(p)
        val cs = ropeCos(p); val sn = ropeSin(p)
        var head = 0
        while (head < m.heads) {
          val off = head * headDim
          val half = headDim / 2
          var d = 0
          while (d < half) {
            val c = cs(d); val s = sn(d)
            // interleaved (paper): pair (2d, 2d+1); rotate-half (the HF
            // GPT-NeoX/LLaMA convention): pair (d, d + headDim/2) --
            // both at angle pos*10000^(-2d/headDim)
            val i0 = if (m.ropeHalf) off + d else off + 2 * d
            val i1 = if (m.ropeHalf) off + half + d else off + 2 * d + 1
            val a0 = r(i0); val a1 = r(i1)
            r(i0) = a0 * c - a1 * s
            r(i1) = a0 * s + a1 * c
            d += 1
          }
          head += 1
        }
        p += 1
      }
    }
    m.blocks.foreach { blk =>
      // pre-LN attention: a = ln_1(x); causal softmax(QK^T/√d)·V
      val a = x.map(layerNorm(_, blk.ln1, m.eps))
      val q = blk.q.applyAll(a)
      val k = blk.k.applyAll(a)
      val v = blk.v.applyAll(a)
      if (m.rope) { applyRope(q); applyRope(k) }
      val ctx = Array.fill(n)(new Array[Double](h))
      var head = 0
      while (head < m.heads) {
        val off = head * headDim
        var p = 0
        while (p < n) {
          // CAUSAL: position p attends to j <= p only
          val lim = p + 1
          val scores = new Array[Double](lim)
          var mx = Double.NegativeInfinity
          var j = 0
          while (j < lim) {
            var s = 0.0
            var d = 0
            while (d < headDim) { s += q(p)(off + d) * k(j)(off + d); d += 1 }
            s *= scale
            scores(j) = s
            if (s > mx) mx = s
            j += 1
          }
          var z = 0.0
          j = 0
          while (j < lim) {
            scores(j) = math.exp(scores(j) - mx); z += scores(j); j += 1
          }
          j = 0
          while (j < lim) {
            val w = scores(j) / z
            var d = 0
            while (d < headDim) { ctx(p)(off + d) += w * v(j)(off + d); d += 1 }
            j += 1
          }
          p += 1
        }
        head += 1
      }
      val attnOut = blk.attnProj.applyAll(ctx)
      val afterAttn = Array.tabulate(n) { p =>
        val o = new Array[Double](h)
        var i = 0
        while (i < h) { o(i) = x(p)(i) + attnOut(p)(i); i += 1 }
        o
      }
      // pre-LN FFN: x = x + c_proj(gelu(c_fc(ln_2(x))))
      val mids = blk.fcIn.applyAll(afterAttn.map(layerNorm(_, blk.ln2, m.eps)))
      var pp = 0
      while (pp < n) {
        val mid = mids(pp)
        var i = 0
        while (i < mid.length) { mid(i) = gelu(mid(i)); i += 1 }
        pp += 1
      }
      val outs = blk.fcOut.applyAll(mids)
      x = Array.tabulate(n) { p =>
        val o = new Array[Double](h)
        var i = 0
        while (i < h) { o(i) = afterAttn(p)(i) + outs(p)(i); i += 1 }
        o
      }
    }
    x.map(layerNorm(_, m.lnF, m.eps))
  }

  /** Pooled (UNnormalized, double) embedding: the last position's post-ln_f
    * state — the only one that attended to the whole sequence — or the
    * positional mean when the model asked for it. Empty input → zero. */
  def forward(m: Model, ids: Array[Int]): Array[Double] = {
    val st = states(m, ids)
    if (st.isEmpty) return new Array[Double](m.hidden)
    if (!m.meanPool) st.last
    else {
      val h = m.hidden
      val pooled = new Array[Double](h)
      var p = 0
      while (p < st.length) {
        var i = 0
        while (i < h) { pooled(i) += st(p)(i); i += 1 }
        p += 1
      }
      var i = 0
      while (i < h) { pooled(i) /= st.length; i += 1 }
      pooled
    }
  }

  // ------------------------------------------------- executor-shared cache

  final case class Loaded(model: Model, vocab: Option[WordPiece.Vocab],
                          spm: Option[SentencePiece.Model] = None)

  private[embed] val loadCount = new java.util.concurrent.atomic.AtomicLong
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[String, Loaded]()

  /** One load per (path, pooling override) per JVM — same warm-handle
    * lifecycle as [[Transformer.sharedModel]]. The checkpoint's OWN
    * tokenizer loads beside the weights (the reference loads a local
    * checkpoint's tokenizer the same way, embeddings/src/model/local.rs):
    * a `tokenizer.json` flips to the SentencePiece UNIGRAM family (r17 —
    * the tokenizer the RoPE checkpoint family actually ships); else a
    * `vocab.txt` flips to real WordPiece WITHOUT the [CLS]/[SEP] wrap
    * (decoders have no special-token sandwich); absent both, the
    * whitespace hash-bucket tokenizer addresses wte rows directly. */
  // default pooling per checkpoint dir (tiny config read, memoized) --
  // the cache key below uses the EFFECTIVE pooling so "decoder:/m#last"
  // and "decoder:/m" (config default last) share ONE resident copy of
  // the weights instead of loading the checkpoint twice (review r18-7)
  private val poolDefaults =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[embed] def sharedModel(path: String,
                                 pool: Option[String]): Loaded = {
    val eff = pool.getOrElse(poolDefaults.getOrElseUpdate(path,
      readDecoderConfig(Transformer.resolveLayout(path)._2)._3
        .getOrElse("last")))
    shared.computeIfAbsent(s"$path#$eff", _ => {
      loadCount.incrementAndGet()
      val m = load(path, poolOverride = Some(eff))
      val dir = Transformer.resolveLayout(path)._2
      val tj = new java.io.File(dir, "tokenizer.json")
      // a NON-Unigram tokenizer.json (BPE-type is common beside GPT-2
      // checkpoints) is not an error — the checkpoint falls back to its
      // vocab.txt / hash tokenization (review r17-1)
      val spm =
        if (tj.isFile) {
          val json = java.nio.file.Files.readString(tj.toPath)
          if (SentencePiece.isUnigramJson(json))
            Some(SentencePiece.parseTokenizerJson(json))
          else None
        } else None
      spm.foreach(sp => require(m.vocabRows > sp.maxId,
        s"checkpoint $path has ${m.vocabRows} embedding rows but unigram " +
          s"ids reach ${sp.maxId}"))
      val vf = new java.io.File(dir, "vocab.txt")
      val vocab =
        if (spm.isEmpty && vf.isFile) Some(WordPiece.loadVocab(vf.toString))
        else None
      vocab.foreach(v => require(m.vocabRows > v.maxId,
        s"checkpoint $path has ${m.vocabRows} embedding rows but vocab ids " +
          s"reach ${v.maxId}"))
      Loaded(m, vocab, spm)
    })
  }

  def evictShared(path: String): Boolean = {
    val keys = shared.keySet().iterator()
    var removed = false
    while (keys.hasNext) {
      if (keys.next().startsWith(path + "#")) { keys.remove(); removed = true }
    }
    // the default-pooling memo is part of the checkpoint's identity: a
    // hot-swapped artifact whose config.json changes pooling would
    // otherwise reload under the STALE default and silently pool wrong
    // (r19 review)
    poolDefaults.remove(path)
    removed
  }
}
