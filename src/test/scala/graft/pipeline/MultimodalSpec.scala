package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal convention: pack/decode round trip, metadata pushdown. */
class MultimodalSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private def packed = Seq((1L, "abc"), (2L, ""), (3L, "zz"))
    .toDF("id", "text")
    .withColumn("blob", Multimodal.packBlob(
      col("text").cast("binary"), lit("txt"), length(col("text")), lit(1)))

  test("pack → decode round trip produces exact byte statistics") {
    // "abc" = 97+98+99
    val rows = Multimodal.decodeStage(packed, "blob", "feat",
        Multimodal.ByteStatsDecoder)
      .select($"id", $"feat.byte_sum", $"feat.byte_min", $"feat.byte_max")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows(1L) === ((294L, 97, 99)))
    assert(rows(2L) === ((0L, 0, 0)))
    assert(rows(3L) === ((244L, 122, 122)))
  }

  test("metadata size_bytes equals payload length and filters push on it") {
    val df = packed.filter($"blob.meta.size_bytes" > 0)
    assert(df.count() === 2)
    assert(df.select(sum($"blob.meta.size_bytes")).head.getLong(0) === 5L)
  }

  test("resize stage rewrites payload and meta in place; stages chain (schema-less rows)") {
    val resized = Multimodal.resizeStage(packed, "blob",
      Multimodal.StrideResizer(2))
    val metas = resized.select($"id", $"blob.payload", $"blob.meta.width",
        $"blob.meta.size_bytes")
      .collect().map(r => r.getLong(0) ->
        (new String(r.getAs[Array[Byte]](1)), r.getInt(2), r.getLong(3))).toMap
    assert(metas(1L) === (("ac", 2, 2L)))  // "abc" stride 2 → bytes a, c
    assert(metas(2L) === (("", 0, 0L)))    // empty payload stays empty
    // a second stage consumes the first stage's constructed rows
    val framed = Multimodal.frameSampleStage(resized, "blob", "frames",
      frameBytes = 1, every = 2)
    val counts = framed.select($"id", size($"frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) === 1) // frames "a","c" → keep every 2nd → "a"
    assert(counts(2L) === 0)
    // and decode sees the resized bytes
    val sums = Multimodal.decodeStage(framed, "blob", "feat",
        Multimodal.ByteStatsDecoder)
      .select($"id", $"feat.byte_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(1L) === ('a'.toLong + 'c'.toLong))
  }

  // --- real format decoders (pure-JVM parseable formats) ---

  /** Synthesize an uncompressed 24-bpp BMP: w×h pixels, every channel byte
    * = `fill`. Standard 54-byte header + 4-byte-aligned rows. */
  private def bmpBytes(w: Int, h: Int, fill: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until h).foreach { _ =>
      (0 until w * 3).foreach(_ => b.put(fill.toByte))
      (w * 3 until stride).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  /** Synthesize a PCM WAV: 16-bit mono square wave of constant amplitude
    * (RMS = amplitude exactly). */
  private def wavBytes(rate: Int, nSamples: Int, amp: Short): Array[Byte] = {
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    (0 until nSamples).foreach(i =>
      b.putShort(if (i % 2 == 0) amp else (-amp).toShort))
    b.array()
  }

  test("BMP decoder parses real headers and exact pixel means; rejects non-BMP") {
    val rows = Seq(
      (1L, bmpBytes(5, 3, 200)),           // real BMP, all channels 200
      (2L, bmpBytes(7, 2, 0)),             // black image
      (3L, "not an image".getBytes),       // garbage → NULL features
      (4L, bmpBytes(4, 4, 255).patch(28, Seq(8.toByte), 1)) // 8bpp → NULL
    ).toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        col("payload"), lit("bmp"), lit(0), lit(0)))
    val got = Multimodal.decodeStage(rows, "blob", "img", Multimodal.BmpDecoder)
      .select($"id", $"img.width", $"img.height", $"img.mean_channel_milli")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) === ((Some(5), Some(3), Some(200000L))))
    assert(got(2L) === ((Some(7), Some(2), Some(0L))))
    assert(got(3L) === ((None, None, None)))
    assert(got(4L) === ((None, None, None)))
  }

  test("crafted media headers decode to NULL, never crash the task (review r12-3)") {
    // BMP with 'BM' magic + pixel offset 0xFFFFFFFF (= -1 signed): the
    // unguarded parse read b(-1); huge declared dims would overflow the
    // Int stride arithmetic the same way
    val badOff = bmpBytes(4, 2, 9).clone()
    (10 until 14).foreach(i => badOff(i) = 0xFF.toByte)
    val hugeDims = bmpBytes(4, 2, 9).clone()
    (18 until 22).foreach(i => hugeDims(i) = 0x7F.toByte)
    // WAV with a chunk length near Int.MaxValue: the Int cursor wrapped
    // negative and tag() threw
    val wrapWav = wavBytes(8000, 4, 100).clone()
    wrapWav(16) = 0xF8.toByte; wrapWav(17) = 0xFF.toByte
    wrapWav(18) = 0xFF.toByte; wrapWav(19) = 0x7F.toByte
    val rows = Seq((1L, badOff), (2L, hugeDims), (3L, wrapWav))
      .toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        col("payload"), lit("?"), lit(0), lit(0)))
    val bmp = Multimodal.decodeStage(rows, "blob", "img", Multimodal.BmpDecoder)
      .select($"id", $"img.width").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bmp(1L).isEmpty && bmp(2L).isEmpty)
    val wav = Multimodal.decodeStage(rows, "blob", "au", Multimodal.WavDecoder)
      .select($"id", $"au.sample_rate").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(wav(3L).isEmpty)
    // the resizer passes the crafted payloads through untouched
    val rz = Multimodal.resizeStage(rows, "blob",
        Multimodal.BmpNearestResizer(2, 2))
      .select($"id", length($"blob.payload")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rz(1L) === badOff.length && rz(2L) === hugeDims.length)
  }

  test("BMP resizer emits a valid BMP at the target size; non-BMP passes through") {
    val rows = Seq(
      (1L, bmpBytes(8, 6, 120)),
      (2L, "plain text".getBytes))
      .toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        col("payload"), lit("bmp"), lit(8), lit(6)))
    val resized = Multimodal.resizeStage(rows, "blob",
      Multimodal.BmpNearestResizer(3, 2))
    // decode the RESIZED payloads with the real parser: target dims, and
    // a constant-fill image keeps its exact mean through resampling
    val got = Multimodal.decodeStage(resized, "blob", "img",
        Multimodal.BmpDecoder)
      .select($"id", $"img.width", $"img.height", $"img.mean_channel_milli",
        $"blob.meta.width", $"blob.meta.height")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getInt(4), r.getInt(5))).toMap
    assert(got(1L) === ((Some(3), Some(2), Some(120000L), 3, 2)))
    // non-BMP: payload untouched, meta dims preserved, decoder says NULL
    assert(got(2L) === ((None, None, None, 8, 6)))
    val passthrough = resized.filter($"id" === 2L)
      .select($"blob.payload").as[Array[Byte]].head()
    assert(new String(passthrough) === "plain text")
  }

  test("WAV decoder parses fmt/data chunks, exact duration and RMS; rejects non-PCM") {
    val rows = Seq(
      (1L, wavBytes(8000, 8000, 1000)),    // 1 s, square amp 1000 → RMS 1000
      (2L, wavBytes(16000, 4000, 0)),      // 250 ms of silence
      (3L, "RIFFxxxxJUNK".getBytes)        // malformed → NULL features
    ).toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        col("payload"), lit("wav"), lit(0), lit(0)))
    val got = Multimodal.decodeStage(rows, "blob", "au", Multimodal.WavDecoder)
      .select($"id", $"au.sample_rate", $"au.channels", $"au.duration_ms", $"au.rms")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L) === ((Some(8000), Some(1), Some(1000L), Some(1000L))))
    assert(got(2L) === ((Some(16000), Some(1), Some(250L), Some(0L))))
    assert(got(3L) === ((None, None, None, None)))
  }

  test("ImageIO decoder: PNG/GIF/BMP exact means, JPEG within bucket, malformed → NULL") {
    // lossless formats reproduce the fill exactly
    Seq("png", "gif", "bmp").foreach { f =>
      val img = Multimodal.syntheticImage(5, 3, 40, 80, 120, f)
      val Row0 = Multimodal.ImageIoDecoder.decodeBatch(Seq(img)).head
      assert(Row0.getInt(0) === 5 && Row0.getInt(1) === 3, f)
      assert(Row0.getLong(2) === (40L + 80 + 120) * 1000 / 3, f)
    }
    // JPEG: every mid-bucket gray decodes inside its 16-unit bucket
    (0 until 14).foreach { k =>
      val v = k * 16 + 8
      val img = Multimodal.syntheticImage(6, 4, v, v, v, "jpg")
      val r = Multimodal.ImageIoDecoder.decodeBatch(Seq(img)).head
      assert(r.getInt(0) === 6 && r.getInt(1) === 4)
      assert(r.getLong(2) / 16000 === k.toLong,
        s"gray $v decoded to ${r.getLong(2)} milli")
    }
    // malformed: truncated PNG, random bytes, empty — NULL, never a throw
    val png = Multimodal.syntheticImage(4, 4, 1, 2, 3, "png")
    Seq(png.take(10), Array.fill[Byte](64)(7), Array.empty[Byte])
      .foreach { bad =>
        val r = Multimodal.ImageIoDecoder.decodeBatch(Seq(bad)).head
        assert(r.get(0) == null && r.get(1) == null && r.get(2) == null)
      }
  }

  test("AudioIO decoder: WAV/AIFF/AU containers agree on the same samples; malformed → NULL") {
    val samples = Array.tabulate(480)(i =>
      (((i * 2657 + 991) % 8192) - 4096).toShort)
    val expect = {
      var ss = 0.0
      samples.foreach(s => ss += s.toDouble * s)
      math.sqrt(ss / samples.length).toLong
    }
    val stats = Seq("wav", "aiff", "au").map { c =>
      val bytes = Multimodal.syntheticAudio(samples, 8000, c)
      val r = Multimodal.AudioIoDecoder.decodeBatch(Seq(bytes)).head
      (c, r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))
    }
    stats.foreach { case (c, rate, ch, bits, durMs, rms) =>
      assert(rate === 8000 && ch === 1 && bits === 16, c)
      assert(durMs === 480 * 1000L / 8000, c)
      assert(rms === expect, c) // endianness-normalized: all three agree
    }
    // the hand-rolled WAV parser and the JDK reader agree on the same blob
    val wav = Multimodal.syntheticAudio(samples, 8000, "wav")
    val hand = Multimodal.WavDecoder.decodeBatch(Seq(wav)).head
    assert(hand.getInt(0) === 8000 && hand.getLong(4) === expect)
    // malformed/truncated → NULL
    Seq(wav.take(12), Array.fill[Byte](32)(1), Array.empty[Byte]).foreach { bad =>
      val r = Multimodal.AudioIoDecoder.decodeBatch(Seq(bad)).head
      assert((0 until 5).forall(r.get(_) == null))
    }
  }

  test("NULL blob structs flow through decode/resize/frame stages, never " +
      "an NPE (r18 review)") {
    val df = Seq((1L, Some("abc")), (2L, None)).toDF("id", "text")
      .withColumn("blob",
        when($"text".isNotNull, Multimodal.packBlob(
          $"text".cast("binary"), lit("txt"), length($"text"), lit(1))))
    val dec = Multimodal.decodeStage(df, "blob", "feat",
        Multimodal.ByteStatsDecoder)
      .select($"id", $"feat.byte_sum").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(dec(1L) === Some(294L))
    assert(dec(2L) === Some(0L)) // empty payload, not a crash
    val rs = Multimodal.resizeStage(df, "blob", Multimodal.StrideResizer(2))
    assert(rs.count() === 2) // null row passes through untouched
    assert(rs.filter($"id" === 2 && $"blob".isNull).count() === 1)
    val fr = Multimodal.frameSampleStage(df, "blob", "frames", 2, 1)
    assert(fr.filter($"id" === 2).select(size($"frames"))
      .head().getInt(0) === 0)
  }

  test("top-down BMPs (negative height) resize without a vertical flip " +
      "(r18 review)") {
    // two-row image: top row 200s, bottom row 50s, stored TOP-DOWN
    // (negative height). A correct 1x2 resize keeps top=200 / bottom=50.
    val w = 4; val h = 2
    val bottomUp = Multimodal.syntheticBmp(w, h, 0)
    // hand-build: patch height to -2 and write rows top-first
    val stride = ((w * 3 + 3) / 4) * 4
    val b = bottomUp.clone()
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -h)
    var i = 0
    while (i < w * 3) { b(54 + i) = 200.toByte; i += 1 }          // stored row 0 = TOP
    i = 0
    while (i < w * 3) { b(54 + stride + i) = 50.toByte; i += 1 }  // stored row 1 = BOTTOM
    val rows = Seq((1L, b)).toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        $"payload", lit("bmp"), lit(w), lit(h)))
    val out = Multimodal.resizeStage(rows, "blob",
        Multimodal.BmpNearestResizer(1, 2))
      .select($"blob.payload").head().getAs[Array[Byte]](0)
    // output is bottom-up: stored row 0 = BOTTOM (50), row 1 = TOP (200)
    val outStride = 4 // 1*3 padded to 4
    assert((out(54) & 0xFF) === 50, "bottom row must stay the 50s row")
    assert((out(54 + outStride) & 0xFF) === 200, "top row must stay 200s")
  }

  test("a truncated fmt chunk (declared len < 16) decodes to NULL, not " +
      "garbage fields (r18 review)") {
    // RIFF/WAVE with a fmt chunk declaring len=8: the rate/bits offsets
    // would fall inside the NEXT chunk's bytes
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(8)
      .putShort(1).putShort(1).putInt(8000) // only 8 declared bytes
    bb.put("data".getBytes).putInt(4).putInt(0)
    val rows = Seq((1L, bb.array())).toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        $"payload", lit("wav"), lit(0), lit(0)))
    val got = Multimodal.decodeStage(rows, "blob", "au", Multimodal.WavDecoder)
      .select($"au.sample_rate").head()
    assert(got.isNullAt(0), got)
  }

  test("oversized declared image dimensions decode to NULL under the " +
      "pixel-area cap (r18 review)") {
    // a valid small BMP whose header claims 100000x100000: the bounded
    // reader must refuse from the header alone (decompression-bomb guard)
    val b = Multimodal.syntheticBmp(4, 4, 10).clone()
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 100000); bb.putInt(22, 100000)
    val rows = Seq((1L, b)).toDF("id", "payload")
      .withColumn("blob", Multimodal.packBlob(
        $"payload", lit("bmp"), lit(4), lit(4)))
    val got = Multimodal.decodeStage(rows, "blob", "img",
        Multimodal.ImageIoDecoder)
      .select($"img.width").head()
    assert(got.isNullAt(0), got)
  }
}
