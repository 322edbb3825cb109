package graft.embed

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM transformer encoder: parity against an independently-written
  * scalar twin, checkpoint load lifecycle, tokenizer modes, dispatch. */
class TransformerSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // ------------------------------------------------------------ fixtures

  /** Write a random BERT-layout checkpoint (hidden, heads, layers, inter)
    * and return its directory. Weights ~N(0, 0.25²) via a fixed seed. */
  private def writeCheckpoint(hidden: Int, heads: Int, layers: Int,
                              inter: Int, maxPos: Int, vocabRows: Int,
                              seed: Long, vocab: Option[Seq[String]] = None,
                              bertPrefix: Boolean = false): String = {
    val rnd = new scala.util.Random(seed)
    def m(r: Int, c: Int) = Array.fill(r * c)(rnd.nextGaussian().toFloat * 0.25f)
    def v(n: Int) = Array.fill(n)(rnd.nextGaussian().toFloat * 0.25f)
    def ones(n: Int) = Array.fill(n)(1.0f + rnd.nextGaussian().toFloat * 0.1f)
    val p = if (bertPrefix) "bert." else ""
    val ts = Seq.newBuilder[(String, Safetensors.Tensor)]
    ts += s"${p}embeddings.word_embeddings.weight" ->
      Safetensors.Tensor(Seq(vocabRows, hidden), m(vocabRows, hidden))
    ts += s"${p}embeddings.position_embeddings.weight" ->
      Safetensors.Tensor(Seq(maxPos, hidden), m(maxPos, hidden))
    ts += s"${p}embeddings.token_type_embeddings.weight" ->
      Safetensors.Tensor(Seq(2, hidden), m(2, hidden))
    ts += s"${p}embeddings.LayerNorm.weight" ->
      Safetensors.Tensor(Seq(hidden), ones(hidden))
    ts += s"${p}embeddings.LayerNorm.bias" ->
      Safetensors.Tensor(Seq(hidden), v(hidden))
    (0 until layers).foreach { l =>
      val b = s"${p}encoder.layer.$l"
      Seq("query", "key", "value").foreach { n =>
        ts += s"$b.attention.self.$n.weight" ->
          Safetensors.Tensor(Seq(hidden, hidden), m(hidden, hidden))
        ts += s"$b.attention.self.$n.bias" ->
          Safetensors.Tensor(Seq(hidden), v(hidden))
      }
      ts += s"$b.attention.output.dense.weight" ->
        Safetensors.Tensor(Seq(hidden, hidden), m(hidden, hidden))
      ts += s"$b.attention.output.dense.bias" ->
        Safetensors.Tensor(Seq(hidden), v(hidden))
      ts += s"$b.attention.output.LayerNorm.weight" ->
        Safetensors.Tensor(Seq(hidden), ones(hidden))
      ts += s"$b.attention.output.LayerNorm.bias" ->
        Safetensors.Tensor(Seq(hidden), v(hidden))
      ts += s"$b.intermediate.dense.weight" ->
        Safetensors.Tensor(Seq(inter, hidden), m(inter, hidden))
      ts += s"$b.intermediate.dense.bias" ->
        Safetensors.Tensor(Seq(inter), v(inter))
      ts += s"$b.output.dense.weight" ->
        Safetensors.Tensor(Seq(hidden, inter), m(hidden, inter))
      ts += s"$b.output.dense.bias" ->
        Safetensors.Tensor(Seq(hidden), v(hidden))
      ts += s"$b.output.LayerNorm.weight" ->
        Safetensors.Tensor(Seq(hidden), ones(hidden))
      ts += s"$b.output.LayerNorm.bias" ->
        Safetensors.Tensor(Seq(hidden), v(hidden))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-tf").toFile
    Safetensors.write(new java.io.File(dir, "model.safetensors").toString,
      ts.result())
    java.nio.file.Files.write(new java.io.File(dir, "config.json").toPath,
      (s"""{"model_type":"bert","num_attention_heads":$heads,""" +
        s""""num_hidden_layers":$layers,"hidden_size":$hidden,""" +
        s""""layer_norm_eps":1e-12,"max_position_embeddings":$maxPos}""")
        .getBytes("UTF-8"))
    vocab.foreach { lines =>
      java.nio.file.Files.write(new java.io.File(dir, "vocab.txt").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir.toString
  }

  // ------------------------------------------- independent scalar twin

  /** A second, independently-structured implementation of the same BERT
    * encoder math (functional style, different summation orders) — the
    * parity reference for [[Transformer.forward]]. */
  private def twinForward(m: Transformer.Model, ids: Seq[Int]): Seq[Double] = {
    val h = m.hidden
    if (ids.isEmpty) return Seq.fill(h)(0.0)
    def ln(x: Seq[Double], n: Transformer.Norm): Seq[Double] = {
      val mu = x.sum / x.size
      val vr = x.map(c => (c - mu) * (c - mu)).sum / x.size
      x.zipWithIndex.map { case (c, i) =>
        (c - mu) / math.sqrt(vr + m.eps) * n.g(i) + n.b(i)
      }
    }
    def lin(l: Transformer.Linear, x: Seq[Double]): Seq[Double] =
      l.w.toSeq.zip(l.b.toSeq).map { case (row, b) =>
        b + row.toSeq.zip(x).map { case (w, c) => w.toDouble * c }.sum
      }
    val emb = ids.zipWithIndex.map { case (id, p) =>
      ln((0 until h).map(i => m.wordEmb(id)(i).toDouble +
        m.posEmb(p)(i).toDouble + m.typeEmb.fold(0.0)(_(i).toDouble)), m.lnEmb)
    }
    val hd = h / m.heads
    val out = m.layers.foldLeft(emb) { (x, layer) =>
      val q = x.map(lin(layer.query, _))
      val k = x.map(lin(layer.key, _))
      val v = x.map(lin(layer.value, _))
      val ctx = x.indices.map { p =>
        (0 until m.heads).flatMap { head =>
          val o = head * hd
          val raw = x.indices.map(j =>
            (0 until hd).map(d => q(p)(o + d) * k(j)(o + d)).sum /
              math.sqrt(hd.toDouble))
          val mx = raw.max
          val es = raw.map(s => math.exp(s - mx))
          val z = es.sum
          (0 until hd).map(d =>
            x.indices.map(j => es(j) / z * v(j)(o + d)).sum)
        }
      }
      val attn = x.indices.map { p =>
        ln(lin(layer.attnOut, ctx(p)).zip(x(p)).map(t => t._1 + t._2),
          layer.lnAttn)
      }
      attn.indices.map { p =>
        val mid = lin(layer.inter, attn(p)).map(Transformer.gelu)
        ln(lin(layer.out, mid).zip(attn(p)).map(t => t._1 + t._2),
          layer.lnOut)
      }
    }
    (0 until h).map(i => out.map(_(i)).sum / out.size)
  }

  // --------------------------------------------------------------- tests

  test("forward matches the independent scalar twin (multi-head, multi-layer)") {
    val dir = writeCheckpoint(hidden = 8, heads = 2, layers = 3, inter = 16,
      maxPos = 16, vocabRows = 32, seed = 7)
    val m = Transformer.load(dir).ensuring(_.heads == 2)
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { c =>
      val n = 1 + rnd.nextInt(12)
      val ids = Array.fill(n)(rnd.nextInt(32))
      val got = Transformer.forward(m, ids)
      val want = twinForward(m, ids.toSeq)
      got.toSeq.lazyZip(want).foreach { (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"case $c ids=${ids.toSeq}: $g vs $w")
      }
    }
    // empty → zero vector
    assert(Transformer.forward(m, Array.empty).forall(_ == 0.0))
  }

  test("BERT-mini-shaped checkpoint: parity holds at realistic width, batch embeds briskly") {
    // hidden 64, 4 heads, 4 layers, intermediate 256 — the small end of
    // real exported encoders; parity vs the twin at this width pins the
    // head-slicing and FFN math where toy dims could hide index bugs
    val dir = writeCheckpoint(hidden = 64, heads = 4, layers = 4,
      inter = 256, maxPos = 64, vocabRows = 128, seed = 29)
    val m = Transformer.load(dir)
    assert(m.heads === 4 && m.hidden === 64)
    val rnd = new scala.util.Random(31)
    (0 until 3).foreach { c =>
      val ids = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(128))
      val got = Transformer.forward(m, ids)
      val want = twinForward(m, ids.toSeq)
      got.toSeq.lazyZip(want).foreach { (g, w) =>
        assert(math.abs(g - w) < 1e-8, s"case $c")
      }
    }
    // throughput smoke: a 200-doc batch embeds in seconds, not minutes
    // (scalar JVM forward — the provider seam is where SIMD would go)
    val p = Embeddings.TransformerProvider(dir)
    val texts = (0 until 200).map(i => s"tok$i alpha beta gamma delta " * 8)
    val t0 = System.nanoTime()
    val out = p.embedBatch(texts)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.size === 200 && out.head.length === 64)
    assert(sec < 30.0, f"200 docs took $sec%.1f s")
  }

  test("single-head path and bert.-prefixed tensor names load and agree") {
    val a = writeCheckpoint(hidden = 6, heads = 1, layers = 1, inter = 12,
      maxPos = 8, vocabRows = 16, seed = 3)
    val ma = Transformer.load(a)
    val ids = Array(4, 9, 1)
    val got = Transformer.forward(ma, ids)
    val want = twinForward(ma, ids.toSeq)
    got.toSeq.lazyZip(want).foreach((g, w) => assert(math.abs(g - w) < 1e-9))
    val b = writeCheckpoint(hidden = 6, heads = 1, layers = 1, inter = 12,
      maxPos = 8, vocabRows = 16, seed = 3, bertPrefix = true)
    val mb = Transformer.load(b)
    assert(Transformer.forward(mb, ids).toSeq === got.toSeq)
  }

  test("provider: WordPiece + [CLS]/[SEP] wrap, unit norm, load-once lifecycle") {
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world",
      "##s", "deep")
    val dir = writeCheckpoint(hidden = 8, heads = 2, layers = 2, inter = 16,
      maxPos = 16, vocabRows = 8, seed = 5, vocab = Some(vocab))
    val before = Transformer.loadCount.get()
    val p = Embeddings.TransformerProvider(dir)
    assert(p.dim === 8)
    val out = p.embedBatch(Seq("hello worlds", "deep hello")).map(_.toSeq)
    // unit norm
    out.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-6)
    }
    // replay: [CLS] hello world ##s [SEP] = ids 2,4,5,6,3
    val m = Transformer.sharedModel(dir).model
    val pooled = twinForward(m, Seq(2, 4, 5, 6, 3))
    val nrm = math.sqrt(pooled.map(x => x * x).sum)
    out.head.lazyZip(pooled.map(_ / nrm)).foreach { (g, w) =>
      assert(math.abs(g - w) < 1e-6)
    }
    // one artifact read per JVM across providers and batches
    p.embedBatch(Seq("again"))
    Embeddings.TransformerProvider(dir).embedBatch(Seq("more"))
    assert(Transformer.loadCount.get() === before + 1)
  }

  test("hash-tokenizer mode (no vocab.txt): empty text → zero vector; distributed stage") {
    val dir = writeCheckpoint(hidden = 4, heads = 2, layers = 1, inter = 8,
      maxPos = 16, vocabRows = 64, seed = 13)
    val df = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "alpha beta gamma"))
      .toDF("id", "text")
    val out = Embeddings.embedStage(df.repartition(3), "text", "e",
        () => graft.embed.ModelRegistry.create(s"transformer:$dir"))
      .select($"id", $"e").as[(Long, Seq[Float])].collect().toMap
    assert(out(2L).forall(_ == 0.0f))
    assert(out(1L) === out(3L))
    assert(math.abs(math.sqrt(
      out(1L).map(x => x.toDouble * x).sum) - 1.0) < 1e-6)
    // bare-directory model id dispatches to the transformer provider too
    val p = graft.embed.ModelRegistry.create(dir)
    assert(p.isInstanceOf[Embeddings.TransformerProvider])
    assert(p.embedBatch(Seq("alpha beta gamma")).head.toSeq === out(1L))
  }

  test("sequences truncate to the position table; bad checkpoints fail loudly") {
    val dir = writeCheckpoint(hidden = 4, heads = 1, layers = 1, inter = 8,
      maxPos = 4, vocabRows = 16, seed = 17)
    val p = Embeddings.TransformerProvider(dir)
    // 10 tokens into a 4-position table: truncated, not an error
    val long = (0 until 10).map(i => s"tok$i").mkString(" ")
    val short = (0 until 4).map(i => s"tok$i").mkString(" ")
    assert(p.embedBatch(Seq(long)).head.toSeq ===
      p.embedBatch(Seq(short)).head.toSeq)
    // declared-dim mismatch fails at first use
    val bad = Embeddings.TransformerProvider(dir, declaredDim = Some(8))
    intercept[IllegalArgumentException](bad.embedBatch(Seq("x")))
    // a directory without model.safetensors is not a transformer checkpoint
    val empty = java.nio.file.Files.createTempDirectory("graft-tf-empty")
    intercept[java.io.FileNotFoundException](
      Transformer.load(empty.toString))
    // missing encoder tensors fail loudly
    val broken = java.nio.file.Files.createTempDirectory("graft-tf-bad").toFile
    Safetensors.write(new java.io.File(broken, "model.safetensors").toString,
      Seq("embeddings.word_embeddings.weight" ->
        Safetensors.Tensor(Seq(4, 4), Array.fill(16)(0.1f))))
    val e = intercept[IllegalStateException](Transformer.load(broken.toString))
    assert(e.getMessage.contains("missing tensor") ||
      e.getMessage.contains("encoder.layer.0"))
    // a checkpoint WITHOUT config.json must fail loudly: the head count
    // is not recoverable from tensor shapes, and a guessed value produces
    // silently-wrong embeddings (MiniLM: hidden 384 = 12 heads, not 6)
    val noCfg = writeCheckpoint(hidden = 6, heads = 1, layers = 1,
      inter = 12, maxPos = 8, vocabRows = 16, seed = 3)
    assert(new java.io.File(noCfg, "config.json").delete())
    val h = intercept[IllegalStateException](Transformer.load(noCfg))
    assert(h.getMessage.contains("num_attention_heads"))
  }
}
