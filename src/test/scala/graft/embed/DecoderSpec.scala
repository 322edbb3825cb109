package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** The GPT-style decoder forward (r16 — Decoder.scala): GPT-2 safetensors
  * layout round-trip (Conv1D transpose, fused c_attn split), a scalar-math
  * twin of the pre-LN causal forward, the CAUSALITY pin (prefix hidden
  * states are invariant to appended tokens — the property that separates a
  * decoder from the encoder), pooling modes, and the `decoder:` dispatch. */
class DecoderSpec extends AnyFunSuite {

  private val H = 4; private val Heads = 2; private val L = 2; private val I = 8
  private val MaxPos = 16; private val V = 8

  private def dy(x: Int): Float = (x % 19 - 9) / 32.0f

  /** Write a deterministic GPT-2-layout checkpoint; returns its dir. */
  private def artifact(poolKey: String = ""): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dec").toFile
    val ts = Seq.newBuilder[(String, Safetensors.Tensor)]
    def t2(name: String, m: Array[Array[Float]]): Unit =
      ts += name -> Safetensors.Tensor(Seq(m.length, m.head.length), m.flatten)
    def t1(name: String, v: Array[Float]): Unit =
      ts += name -> Safetensors.Tensor(Seq(v.length), v)
    // Linear-convention [out][in] → Conv1D storage [in][out]
    def conv1d(name: String, linW: Array[Array[Float]]): Unit =
      t2(name, Array.tabulate(linW.head.length, linW.length)((i, o) => linW(o)(i)))
    def mat(r: Int, c: Int, s: Int) = Array.tabulate(r, c)((o, i) => dy(s + o * 7 + i * 3))
    def vecb(n: Int, s: Int) = Array.tabulate(n)(o => dy(s + o * 5))
    t2("wte.weight", mat(V, H, 1))
    t2("wpe.weight", mat(MaxPos, H, 2))
    (0 until L).foreach { l =>
      val p = s"h.$l"
      t1(s"$p.ln_1.weight", Array.tabulate(H)(i => 1.0f + dy(l + i * 3)))
      t1(s"$p.ln_1.bias", vecb(H, l * 3 + 1))
      conv1d(s"$p.attn.c_attn.weight",
        mat(H, H, l * 11 + 3) ++ mat(H, H, l * 11 + 4) ++ mat(H, H, l * 11 + 5))
      t1(s"$p.attn.c_attn.bias",
        vecb(H, l * 5 + 1) ++ vecb(H, l * 5 + 2) ++ vecb(H, l * 5 + 3))
      conv1d(s"$p.attn.c_proj.weight", mat(H, H, l * 11 + 6))
      t1(s"$p.attn.c_proj.bias", vecb(H, l * 5 + 4))
      t1(s"$p.ln_2.weight", Array.tabulate(H)(i => 1.0f + dy(l + i * 5)))
      t1(s"$p.ln_2.bias", vecb(H, l * 3 + 2))
      conv1d(s"$p.mlp.c_fc.weight", mat(I, H, l * 13 + 1))
      t1(s"$p.mlp.c_fc.bias", vecb(I, l * 7 + 1))
      conv1d(s"$p.mlp.c_proj.weight", mat(H, I, l * 13 + 2))
      t1(s"$p.mlp.c_proj.bias", vecb(H, l * 7 + 2))
    }
    t1("ln_f.weight", Array.tabulate(H)(i => 1.0f + dy(i * 7)))
    t1("ln_f.bias", vecb(H, 9))
    Safetensors.write(new java.io.File(dir, "model.safetensors").toString,
      ts.result())
    java.nio.file.Files.write(new java.io.File(dir, "config.json").toPath,
      (s"""{"model_type":"gpt2","n_head":$Heads,"n_layer":$L,""" +
        s""""n_embd":$H,"layer_norm_epsilon":1e-5,"n_positions":$MaxPos""" +
        poolKey + "}").getBytes("UTF-8"))
    dir.toString
  }

  private lazy val dir = artifact()
  private lazy val m = Decoder.load(dir)

  test("GPT-2 layout round-trip: shapes, head count, eps, default last-token pooling") {
    assert(m.hidden === H)
    assert(m.heads === Heads)
    assert(m.blocks.length === L)
    assert(m.eps === 1e-5)
    assert(!m.meanPool)
    assert(m.vocabRows === V && m.maxPositions === MaxPos)
    // the Conv1D transpose-back: block 0's q row 0 equals the generator's
    val want = Array.tabulate(H)(i => dy(3 + i * 3))
    assert(m.blocks(0).q.w(0).toSeq === want.toSeq)
  }

  test("scalar twin: forward matches an independent naive reimplementation") {
    val ids = Array(3, 1, 4, 1, 5, 0, 2)
    def ln(x: Array[Double], g: Array[Float], b: Array[Float]): Array[Double] = {
      val mu = x.sum / x.length
      val vr = x.map(c => (c - mu) * (c - mu)).sum / x.length
      val inv = 1.0 / math.sqrt(vr + m.eps)
      x.indices.toArray.map(i => (x(i) - mu) * inv * g(i) + b(i))
    }
    def lin(w: Array[Array[Float]], b: Array[Float], x: Array[Double]) =
      w.indices.toArray.map(o =>
        b(o).toDouble + w(o).indices.map(i => w(o)(i).toDouble * x(i)).sum)
    def gelu(x: Double) =
      0.5 * x * (1 + math.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
    var xs = ids.zipWithIndex.map { case (id, p) =>
      Array.tabulate(H)(i => m.wte(id)(i).toDouble + m.wpe(p)(i).toDouble)
    }
    val hd = H / Heads
    m.blocks.foreach { blk =>
      val a = xs.map(ln(_, blk.ln1.g, blk.ln1.b))
      val q = a.map(lin(blk.q.w, blk.q.b, _))
      val k = a.map(lin(blk.k.w, blk.k.b, _))
      val v = a.map(lin(blk.v.w, blk.v.b, _))
      val ctx = xs.indices.map { p =>
        val out = new Array[Double](H)
        (0 until Heads).foreach { hh =>
          val off = hh * hd
          val sc = (0 to p).map(j =>
            (0 until hd).map(d => q(p)(off + d) * k(j)(off + d)).sum /
              math.sqrt(hd.toDouble))
          val mx = sc.max
          val es = sc.map(s => math.exp(s - mx))
          val z = es.sum
          (0 to p).foreach { j =>
            (0 until hd).foreach(d => out(off + d) += es(j) / z * v(j)(off + d))
          }
        }
        out
      }.toArray
      val afterAttn = xs.indices.toArray.map { p =>
        val pr = lin(blk.attnProj.w, blk.attnProj.b, ctx(p))
        Array.tabulate(H)(i => xs(p)(i) + pr(i))
      }
      xs = afterAttn.map { x =>
        val g = lin(blk.fcIn.w, blk.fcIn.b, ln(x, blk.ln2.g, blk.ln2.b))
          .map(gelu)
        val pr = lin(blk.fcOut.w, blk.fcOut.b, g)
        Array.tabulate(H)(i => x(i) + pr(i))
      }
    }
    val want = ln(xs.last, m.lnF.g, m.lnF.b) // last-token pooling
    val got = Decoder.forward(m, ids)
    want.indices.foreach(i =>
      assert(math.abs(got(i) - want(i)) < 1e-12,
        s"dim $i: ${got(i)} vs ${want(i)}"))
  }

  test("CAUSALITY: prefix hidden states are invariant to appended tokens") {
    val full = Array(3, 1, 4, 1, 5, 0, 2, 6)
    val prefix = full.take(4)
    val sFull = Decoder.states(m, full)
    val sPre = Decoder.states(m, prefix)
    prefix.indices.foreach { p =>
      assert(sFull(p).toSeq === sPre(p).toSeq,
        s"position $p changed when tokens were appended — causal mask broken")
    }
    // and last-token pooling of the prefix IS state 3 of the full run
    assert(Decoder.forward(m, prefix).toSeq === sFull(3).toSeq)
  }

  test("mean pooling via override and via config key") {
    val st = Decoder.states(m, Array(1, 2, 3))
    val mean = Array.tabulate(H)(i => st.map(_(i)).sum / st.length)
    val mm = Decoder.load(dir, poolOverride = Some("mean"))
    assert(Decoder.forward(mm, Array(1, 2, 3)).toSeq === mean.toSeq)
    val cfgDir = artifact(poolKey = ""","pooling":"mean"""")
    assert(Decoder.load(cfgDir).meanPool)
    intercept[IllegalArgumentException] {
      Decoder.load(dir, poolOverride = Some("bogus"))
    }
  }

  test("decoder: model-id dispatch, provider normalization, empty text") {
    val p = graft.embed.ModelRegistry.create(s"decoder:$dir")
    assert(p.isInstanceOf[Embeddings.DecoderProvider])
    assert(p.dim === H)
    val vecs = p.embedBatch(Seq("a b c", ""))
    // non-empty: unit norm; empty: zero vector
    val n0 = math.sqrt(vecs(0).map(x => x.toDouble * x).sum)
    assert(math.abs(n0 - 1.0) < 1e-6)
    assert(vecs(1).forall(_ == 0.0f))
    val pm = graft.embed.ModelRegistry.create(s"decoder:$dir#mean")
      .asInstanceOf[Embeddings.DecoderProvider]
    assert(pm.pooling === Some("mean"))
    // fails loudly on a BERT checkpoint (wrong layout)
    intercept[IllegalStateException] {
      Decoder.load(bertishDir)
    }
  }

  test("ROPE: rotary checkpoint loads without wpe, matches a scalar rotation twin, stays causal") {
    val dir = artifact(poolKey = ""","position_embedding_type":"rotary"""")
    // drop the wpe tensor (rotary layout ships none): rewrite the file
    val wf = new java.io.File(dir, "model.safetensors")
    val ts = Safetensors.readAll(wf.toString).filterNot(_._1 == "wpe.weight")
    Safetensors.write(wf.toString, ts.toSeq)
    val mr = Decoder.load(dir)
    assert(mr.rope && mr.wpe.isEmpty && mr.maxPositions === MaxPos)
    val ids = Array(3, 1, 4, 1, 5, 0)
    // scalar twin with explicit rotations (independent formulation)
    def ln(x: Array[Double], g: Array[Float], b: Array[Float]): Array[Double] = {
      val mu = x.sum / x.length
      val vr = x.map(c => (c - mu) * (c - mu)).sum / x.length
      val inv = 1.0 / math.sqrt(vr + mr.eps)
      x.indices.toArray.map(i => (x(i) - mu) * inv * g(i) + b(i))
    }
    def lin(w: Array[Array[Float]], b: Array[Float], x: Array[Double]) =
      w.indices.toArray.map(o =>
        b(o).toDouble + w(o).indices.map(i => w(o)(i).toDouble * x(i)).sum)
    def gelu(x: Double) =
      0.5 * x * (1 + math.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
    val hd = H / Heads
    def rot(r: Array[Double], p: Int): Array[Double] = {
      val o = r.clone()
      (0 until Heads).foreach { hh =>
        val off = hh * hd
        var d = 0
        while (d * 2 < hd) {
          val ang = p * math.pow(10000.0, -2.0 * d / hd)
          val c = math.cos(ang); val s = math.sin(ang)
          val a0 = o(off + 2 * d); val a1 = o(off + 2 * d + 1)
          o(off + 2 * d) = a0 * c - a1 * s
          o(off + 2 * d + 1) = a0 * s + a1 * c
          d += 1
        }
      }
      o
    }
    var xs = ids.map(id => Array.tabulate(H)(i => mr.wte(id)(i).toDouble))
    mr.blocks.foreach { blk =>
      val a = xs.map(ln(_, blk.ln1.g, blk.ln1.b))
      val q = a.zipWithIndex.map { case (v, p) => rot(lin(blk.q.w, blk.q.b, v), p) }
      val k = a.zipWithIndex.map { case (v, p) => rot(lin(blk.k.w, blk.k.b, v), p) }
      val v = a.map(lin(blk.v.w, blk.v.b, _))
      val ctx = xs.indices.map { p =>
        val out = new Array[Double](H)
        (0 until Heads).foreach { hh =>
          val off = hh * hd
          val sc = (0 to p).map(j =>
            (0 until hd).map(d => q(p)(off + d) * k(j)(off + d)).sum /
              math.sqrt(hd.toDouble))
          val mx = sc.max
          val es = sc.map(s => math.exp(s - mx))
          val z = es.sum
          (0 to p).foreach { j =>
            (0 until hd).foreach(d => out(off + d) += es(j) / z * v(j)(off + d))
          }
        }
        out
      }.toArray
      val afterAttn = xs.indices.toArray.map { p =>
        val pr = lin(blk.attnProj.w, blk.attnProj.b, ctx(p))
        Array.tabulate(H)(i => xs(p)(i) + pr(i))
      }
      xs = afterAttn.map { x =>
        val g = lin(blk.fcIn.w, blk.fcIn.b, ln(x, blk.ln2.g, blk.ln2.b)).map(gelu)
        val pr = lin(blk.fcOut.w, blk.fcOut.b, g)
        Array.tabulate(H)(i => x(i) + pr(i))
      }
    }
    val want = ln(xs.last, mr.lnF.g, mr.lnF.b)
    val got = Decoder.forward(mr, ids)
    want.indices.foreach(i =>
      assert(math.abs(got(i) - want(i)) < 1e-12,
        s"dim $i: ${got(i)} vs ${want(i)}"))
    // rotations do not break the causal mask
    val sFull = Decoder.states(mr, ids)
    val sPre = Decoder.states(mr, ids.take(3))
    (0 until 3).foreach(p => assert(sFull(p).toSeq === sPre(p).toSeq))
    // declaring rotary while shipping a wpe table fails loudly
    val both = artifact(poolKey = ""","position_embedding_type":"rotary"""")
    val e = intercept[IllegalArgumentException] { Decoder.load(both) }
    assert(e.getMessage.contains("one position mechanism"))
  }

  test("ROPE rotate-half pairing (rope_style half): matches a scalar " +
      "rotate-half twin, differs from interleaved (r18 review)") {
    val dir = artifact(poolKey =
      ""","position_embedding_type":"rotary","rope_style":"half"""")
    // headDim must exceed 2 for the pairings to differ (at headDim 2 the
    // interleaved pair (0,1) IS the half pair): single-head -> headDim 4
    def oneHead(d: String): Unit = {
      val cf = new java.io.File(d, "config.json").toPath
      java.nio.file.Files.writeString(cf, java.nio.file.Files
        .readString(cf).replace("\"n_head\":" + Heads, "\"n_head\":1"))
    }
    oneHead(dir)
    val wf = new java.io.File(dir, "model.safetensors")
    val ts = Safetensors.readAll(wf.toString).filterNot(_._1 == "wpe.weight")
    Safetensors.write(wf.toString, ts.toSeq)
    val mh = Decoder.load(dir)
    assert(mh.rope && mh.ropeHalf && mh.heads == 1)
    val ids = Array(3, 1, 4, 1, 5, 0)
    // interleaved twin checkpoint (same weights, default pairing)
    val dir2 = artifact(poolKey = ""","position_embedding_type":"rotary"""")
    oneHead(dir2)
    val wf2 = new java.io.File(dir2, "model.safetensors")
    Safetensors.write(wf2.toString,
      Safetensors.readAll(wf2.toString).filterNot(_._1 == "wpe.weight").toSeq)
    val mi = Decoder.load(dir2)
    assert(!mi.ropeHalf)
    val hGot = Decoder.forward(mh, ids)
    val iGot = Decoder.forward(mi, ids)
    // the two pairings genuinely differ on a multi-position input
    assert(hGot.toSeq !== iGot.toSeq)
    // at position 0 every rotation is identity: the pairings agree
    assert(Decoder.forward(mh, ids.take(1)).toSeq ===
      Decoder.forward(mi, ids.take(1)).toSeq)
    // scalar spot-check of the half pairing: pair (0, hd/2) at angle 2
    val hd = H // single head
    def rotHalf(r: Array[Double], p: Int): Array[Double] = {
      val o = r.clone()
      (0 until 1).foreach { hh =>
        val off = hh * hd
        val half = hd / 2
        var d = 0
        while (d < half) {
          val ang = p * math.pow(10000.0, -2.0 * d / hd)
          val c = math.cos(ang); val sn = math.sin(ang)
          val a0 = o(off + d); val a1 = o(off + half + d)
          o(off + d) = a0 * c - a1 * sn
          o(off + half + d) = a0 * sn + a1 * c
          d += 1
        }
      }
      o
    }
    val v = Array.tabulate(H)(i => (i + 1).toDouble)
    val viaHalf = rotHalf(v, 2)
    val c0 = math.cos(2.0); val s0 = math.sin(2.0)
    assert(math.abs(viaHalf(0) - (v(0) * c0 - v(hd / 2) * s0)) < 1e-12)
    assert(math.abs(viaHalf(hd / 2) - (v(0) * s0 + v(hd / 2) * c0)) < 1e-12)
    // unknown style fails loudly
    val bad = artifact(poolKey =
      ""","position_embedding_type":"rotary","rope_style":"diagonal"""")
    val wfb = new java.io.File(bad, "model.safetensors")
    Safetensors.write(wfb.toString,
      Safetensors.readAll(wfb.toString).filterNot(_._1 == "wpe.weight").toSeq)
    val e = intercept[IllegalArgumentException] { Decoder.load(bad) }
    assert(e.getMessage.contains("rope_style"))
  }

  private lazy val bertishDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-decb").toFile
    Safetensors.write(new java.io.File(dir, "model.safetensors").toString,
      Seq("embeddings.word_embeddings.weight" ->
        Safetensors.Tensor(Seq(2, 2), Array(1f, 2f, 3f, 4f))))
    dir.toString
  }
}
