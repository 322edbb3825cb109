package graft.embed

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM safetensors reader/writer + the provider running real
  * inference against the public interchange format. */
class SafetensorsSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-st")
      .resolve(name).toString

  test("byte layout matches the published format, not just our own round trip") {
    val path = tmp("layout.safetensors")
    val t = Safetensors.Tensor(Seq(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f))
    Safetensors.write(path, Seq("embedding" -> t))
    val bytes = java.nio.file.Files.readAllBytes(new java.io.File(path).toPath)
    // first 8 bytes: LE header length; then the JSON header itself
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hlen = bb.getLong()
    val json = new String(bytes, 8, hlen.toInt, "UTF-8")
    assert(json.contains("\"dtype\":\"F32\""), json)
    assert(json.contains("\"shape\":[2,3]"), json)
    assert(json.contains("\"data_offsets\":[0,24]"), json)
    assert(bytes.length === 8 + hlen + 24)
    // first float after the header is 1.0, little-endian
    val f0 = java.nio.ByteBuffer.wrap(bytes, 8 + hlen.toInt, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat()
    assert(f0 === 1f)
  }

  test("write → read round trip, multiple tensors, matrix shape checks") {
    val path = tmp("multi.safetensors")
    val a = Safetensors.Tensor(Seq(2, 2), Array(1f, 2f, 3f, 4f))
    val b = Safetensors.Tensor(Seq(3), Array(7f, 8f, 9f))
    Safetensors.write(path, Seq("a" -> a, "b" -> b))
    assert(Safetensors.readTensor(path, "a").data.toSeq === a.data.toSeq)
    assert(Safetensors.readTensor(path, "b").data.toSeq === b.data.toSeq)
    assert(Safetensors.matrix(path, "a").map(_.toSeq).toSeq ===
      Seq(Seq(1f, 2f), Seq(3f, 4f)))
    // 1-D tensor is not a matrix; unknown names name what IS there
    val e1 = intercept[IllegalArgumentException](Safetensors.matrix(path, "b"))
    assert(e1.getMessage.contains("expected a matrix"))
    val e2 = intercept[IllegalArgumentException](
      Safetensors.readTensor(path, "nope"))
    assert(e2.getMessage.contains("a") && e2.getMessage.contains("b"))
    // truncated file fails loudly
    val trunc = tmp("trunc.safetensors")
    java.nio.file.Files.write(new java.io.File(trunc).toPath,
      java.nio.file.Files.readAllBytes(new java.io.File(path).toPath).take(20))
    intercept[IllegalArgumentException](Safetensors.readTensor(trunc, "a"))
  }

  test("provider inference matches the in-memory kernel; loads once per JVM") {
    val vocab = 32; val dim = 8
    val w = Array.tabulate(vocab, dim)((b, i) => (((b * 31 + i) % 97) - 48) / 16.0f)
    val path = tmp("model.safetensors")
    Safetensors.write(path, Seq("embedding" ->
      Safetensors.Tensor(Seq(vocab, dim), w.flatten)))
    Safetensors.evictShared(path)
    val before = Safetensors.loadCount.get()
    val p = Embeddings.SafetensorsProvider(path, "embedding", dim)
    val texts = Seq("alpha beta beta", "gamma", "")
    val got = p.embedBatch(texts)
    // manual kernel replay
    val want = texts.map { t =>
      val v = new Array[Float](dim)
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val row = w(Embeddings.hashBucket(tok, vocab))
        (0 until dim).foreach(i => v(i) += row(i))
      }
      v.toSeq
    }
    assert(got.map(_.toSeq) === want)
    // a second provider instance on the same path reuses the loaded matrix
    Embeddings.SafetensorsProvider(path, "embedding", dim)
      .embedBatch(Seq("again"))
    assert(Safetensors.loadCount.get() === before + 1)
    // declared-dim mismatch fails at first use
    intercept[IllegalArgumentException](
      Embeddings.SafetensorsProvider(path, "embedding", dim + 1)
        .embedBatch(Seq("x")))
  }

  test("F16 tensors decode bit-exactly (normals, subnormals, zero, inf, max)") {
    val halves = Seq(0x3C00, 0xC000, 0x3800, 0x0001, 0x8000, 0x7C00,
      0x7BFF).map(_.toShort)
    val want = Seq(1.0f, -2.0f, 0.5f, 5.9604645e-8f, -0.0f,
      Float.PositiveInfinity, 65504.0f)
    val header = """{"h":{"dtype":"F16","shape":[7],""" +
      s""""data_offsets":[0,14]}}"""
    val hb = header.getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(8 + hb.length + 14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(hb.length.toLong).put(hb)
    halves.foreach(bb.putShort)
    val path = tmp("half.safetensors")
    java.nio.file.Files.write(new java.io.File(path).toPath, bb.array())
    val got = Safetensors.readTensor(path, "h").data.toSeq
    assert(got === want)
    // -0.0 keeps its sign bit
    assert(java.lang.Float.floatToIntBits(got(4)) ===
      java.lang.Float.floatToIntBits(-0.0f))
  }

  test("BF16 tensors decode bit-exactly (truncated-float32 semantics)") {
    // BF16 bits = float32's top 16 bits; decoding shifts them back — a
    // value representable in BF16 round-trips to the identical float32
    val vals = Seq(1.0f, -2.5f, 0.0f, -0.0f, 3.140625f,
      java.lang.Float.intBitsToFloat(0x7F800000), // +inf
      java.lang.Float.intBitsToFloat(0x00010000)) // tiny (subnormal-ish)
    val shorts = vals.map(v =>
      ((java.lang.Float.floatToRawIntBits(v) >>> 16) & 0xFFFF).toShort)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val header = om.createObjectNode()
    val nd = header.putObject("b")
    nd.put("dtype", "BF16")
    nd.putArray("shape").add(vals.size)
    val offs = nd.putArray("data_offsets")
    offs.add(0); offs.add(vals.size * 2)
    val hb = om.writeValueAsBytes(header)
    val bb = java.nio.ByteBuffer.allocate(8 + hb.length + vals.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(hb.length.toLong).put(hb)
    shorts.foreach(bb.putShort)
    val path = tmp("bf16.safetensors")
    java.nio.file.Files.write(new java.io.File(path).toPath, bb.array())
    val got = Safetensors.readTensor(path, "b").data.toSeq
    got.lazyZip(vals).foreach { (g, w) =>
      assert(java.lang.Float.floatToRawIntBits(g) ===
        java.lang.Float.floatToRawIntBits(w), s"$g vs $w")
    }
  }

  test("WordPiece: greedy longest-match, ## continuations, all-or-nothing UNK") {
    val v = WordPiece.parseVocab(Seq("[UNK]", "un", "##aff", "##able",
      "aff", "hello", "##o"))
    def toks(w: String) = WordPiece.tokenizeWord(w, v)
    assert(toks("unaffable") === Seq(1, 2, 3))   // un ##aff ##able
    assert(toks("affable") === Seq(4, 3))        // aff ##able
    assert(toks("hello") === Seq(5))
    assert(toks("helloo") === Seq(5, 6))         // hello ##o
    assert(toks("xyz") === Seq(0))               // no prefix → [UNK]
    assert(toks("unxyz") === Seq(0))             // dead end mid-word → [UNK]
    assert(WordPiece.tokenize(" unaffable  hello ", v) === Seq(1, 2, 3, 5))
    intercept[IllegalArgumentException](WordPiece.parseVocab(Seq("a", "b")))
    // duplicate tokens fail loudly instead of silently keeping the last id
    val dup = intercept[IllegalArgumentException](
      WordPiece.parseVocab(Seq("[UNK]", "un", "un")))
    assert(dup.getMessage.contains("duplicate"))
  }

  test("vocab-backed provider: token id indexes the matrix row directly") {
    val vocabLines = Seq("[UNK]", "un", "##aff", "##able", "hello")
    val dim = 3
    val w = Array.tabulate(vocabLines.size, dim)((r, c) => (r * 10 + c).toFloat)
    val dir = java.nio.file.Files.createTempDirectory("graft-wp")
    val mPath = dir.resolve("m.safetensors").toString
    val vPath = dir.resolve("vocab.txt").toString
    Safetensors.write(mPath, Seq("embedding" ->
      Safetensors.Tensor(Seq(vocabLines.size, dim), w.flatten)))
    java.nio.file.Files.write(new java.io.File(vPath).toPath,
      vocabLines.mkString("\n").getBytes("UTF-8"))
    val p = Embeddings.SafetensorsProvider(mPath, "embedding", dim,
      vocabPath = Some(vPath))
    // "unaffable hello" → rows 1+2+3+4 summed
    val got = p.embedBatch(Seq("unaffable hello")).head.toSeq
    val want = (0 until dim).map(c => Seq(1, 2, 3, 4).map(r => w(r)(c)).sum)
    assert(got === want)
    // out-of-vocab word contributes the [UNK] row
    assert(p.embedBatch(Seq("zzz")).head.toSeq === w(0).toSeq)
    // a vocab larger than the matrix is rejected at load
    val small = dir.resolve("small.safetensors").toString
    Safetensors.write(small, Seq("embedding" ->
      Safetensors.Tensor(Seq(2, dim), w.flatten.take(2 * dim))))
    intercept[IllegalArgumentException](
      Embeddings.SafetensorsProvider(small, "embedding", dim,
        vocabPath = Some(vPath)).embedBatch(Seq("x")))
  }

  test("model-id dispatch: safetensors:<path>#<tensor> routes to the provider") {
    val vocab = 16; val dim = 4
    val w = Array.tabulate(vocab, dim)((b, i) => (b + i).toFloat)
    val path = tmp("route.safetensors")
    Safetensors.write(path, Seq("emb" ->
      Safetensors.Tensor(Seq(vocab, dim), w.flatten)))
    val p = ModelRegistry.create(s"safetensors:$path#emb", dim = Some(dim))
    assert(p.isInstanceOf[Embeddings.SafetensorsProvider])
    assert(p.embedBatch(Seq("tok")).head.length === dim)
    intercept[IllegalArgumentException](
      ModelRegistry.create(s"safetensors:$path#emb")) // dim required
    // and it runs inside embedStage like any provider
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val out = Embeddings.embedStage(df, "text", "emb",
      () => ModelRegistry.create(s"safetensors:$path#emb", dim = Some(dim)))
    assert(out.select(size(col("emb"))).as[Int].head() === dim)
  }
}
