package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Multimodal column convention (LLM-pipeline brief): media travel as an
  * opaque `binary` payload plus a typed metadata struct — the schema shape a
  * 100 TB image/audio corpus uses, with decode/feature-extraction running as
  * a batched mapPartitions stage next to the data.
  *
  * The decode step is a pluggable `BlobDecoder`. REAL decoders cover what
  * the JDK itself parses: JPEG/PNG/GIF/BMP via `javax.imageio`
  * ([[ImageIoDecoder]]), WAV/AIFF/AU via `javax.sound.sampled`
  * ([[AudioIoDecoder]]), plus hand-rolled BMP/WAV parsers with hardened
  * header validation ([[BmpDecoder]], [[WavDecoder]]). Exotic codecs
  * (video containers, HEIC, Opus, …) stay behind the pluggable seam with
  * [[ByteStatsDecoder]] as the explicitly-marked deterministic stand-in.
  * The Spark-side plumbing (schema, partition-local batching, struct
  * metadata, predicate pushdown on metadata fields) is real and
  * oracle-tested throughout.
  */
object Multimodal {

  /** blob = struct(payload binary, meta struct(format, width, height,
    * size_bytes)). */
  def packBlob(payload: Column, format: Column, width: Column,
               height: Column): Column =
    struct(
      payload.as("payload"),
      struct(
        format.as("format"),
        width.cast("int").as("width"),
        height.cast("int").as("height"),
        length(payload).cast("long").as("size_bytes")
      ).as("meta"))

  /** Decoder contract: batch of payloads → batch of feature rows. A real
    * deployment plugs an image/audio decoder here. */
  trait BlobDecoder extends Serializable {
    def featureSchema: StructType
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row]
  }

  /** STUB decoder — deterministic byte statistics standing in for a real
    * media decode (image libs are absent in this container). Marked as such;
    * swap for a JNI/ONNX decoder in production. */
  object ByteStatsDecoder extends BlobDecoder {
    val featureSchema: StructType = StructType(Seq(
      StructField("byte_sum", LongType),
      StructField("byte_min", IntegerType),
      StructField("byte_max", IntegerType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      if (b.isEmpty) Row(0L, 0, 0)
      else {
        var s = 0L; var mn = 255; var mx = 0
        b.foreach { x => val u = x & 0xFF; s += u; mn = math.min(mn, u); mx = math.max(mx, u) }
        Row(s, mn, mx)
      }
    }
  }

  /** REAL image decoder for the one raster format a bare JVM parses with
    * no codec library: uncompressed 24-bpp BMP. Emits the parsed header
    * dimensions and the exact mean channel value over the pixel area
    * (integer milli-units — floor(1000·Σchannel / (w·h·3))). Payloads
    * that are not uncompressed 24-bpp BMP decode to NULL features (the
    * robust-at-scale contract: one bad blob must not kill a 100 TB job).
    * Codec formats (JPEG/PNG/…) stay behind the documented pluggable
    * seam. */
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Validated uncompressed-24bpp BMP geometry, or None for anything else
    * — INCLUDING crafted headers (negative/huge offsets or dimensions):
    * all arithmetic runs in Long before any index is trusted, so the
    * "malformed → NULL, never a crash" contract holds against adversarial
    * bytes, not just truncated ones (review r12-3). */
  /** (pixel offset, width, |height|, stride, topDown): a NEGATIVE stored
    * height means rows are stored top-first (review r18-6 -- discarding
    * the sign made the resizer vertically flip top-down BMPs; the
    * decoder's mean is order-invariant so only resizing cares). */
  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    // cap dimensions so stride/pixel arithmetic cannot overflow Int
    if (bpp != 24 || compression != 0 || off < 54 ||
        w <= 0 || w > (1 << 20) || h <= 0 || h > (1 << 20)) return None
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    if (off.toLong + stride * h > b.length) None
    else Some((off, w, h, stride.toInt, hRaw < 0))
  }

  /** The standard 54-byte bottom-up 24-bpp BMP header -- ONE definition
    * for the generator and the resizer (review r18-6). */
  private def putBmpHeader(bb: java.nio.ByteBuffer, w: Int, h: Int,
                           stride: Int): Unit = {
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
    bb.putInt(0).putInt(0)
  }

  object BmpDecoder extends BlobDecoder {
    val featureSchema: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bpp", IntegerType),
      StructField("mean_channel_milli", LongType)))
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      parseBmp(b) match {
        case None => Row(null, null, null, null)
        case Some((off, w, h, stride, _)) =>
          var sum = 0L
          var row = 0
          while (row < h) {
            val base = off + row * stride
            var i = 0
            val rowBytes = w * 3
            while (i < rowBytes) { sum += b(base + i) & 0xFF; i += 1 }
            row += 1
          }
          Row(w, h, 24, sum * 1000L / (w.toLong * h * 3))
      }
    }
  }

  /** Synthesize a real uncompressed 24-bpp BMP (standard 54-byte header,
    * 4-byte-aligned rows, every channel byte = `fill`) — the deterministic
    * generator the media gates use to exercise [[BmpDecoder]] end to end
    * with bytes a stock image viewer would open. */
  def syntheticBmp(w: Int, h: Int, fill: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && fill >= 0 && fill <= 255)
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    putBmpHeader(b, w, h, stride)
    var row = 0
    while (row < h) {
      var i = 0
      while (i < stride) {
        b.put(if (i < w * 3) fill.toByte else 0.toByte); i += 1
      }
      row += 1
    }
    b.array()
  }

  /** REAL codec-format image decoder via the JDK's OWN codecs —
    * `javax.imageio.ImageIO` ships JPEG/PNG/GIF/BMP readers in the bare
    * JRE, so the real-corpus formats (JPEG-first) decode with NO new
    * dependency. Emits the decoded dimensions and the exact mean channel
    * value over the RGB pixel area (integer milli-units, same convention
    * as [[BmpDecoder]]). Malformed/unsupported payloads → NULL features,
    * never a task failure. Pixel loop reads via getRGB (sRGB ints), so
    * indexed/gray sources normalize to the same 3-channel stats. */
  /** Pixel-area cap for JDK image decodes (decompression-bomb guard,
    * review r18-6): a kilobyte PNG declaring 50000x50000 in its header
    * would make ImageIO.read allocate ~10 GB and kill the task with an
    * OutOfMemoryError NonFatal never catches. The header dimensions are
    * read BEFORE pixel allocation; oversized images decode to NULL rows
    * / pass through the resizer. ~64M pixels = ~256 MB INT_RGB. */
  val MaxDecodePixels: Long = 64L << 20

  /** ImageIO read with the [[MaxDecodePixels]] header pre-check; None =
    * unreadable or over the cap. */
  private def boundedImageRead(
      b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val rd = readers.next()
      try {
        rd.setInput(in)
        val w = rd.getWidth(0)
        val h = rd.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
        else Option(rd.read(0))
      } finally rd.dispose()
    } finally if (in != null) in.close()
  }

  object ImageIoDecoder extends BlobDecoder {
    val featureSchema: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_channel_milli", LongType)))
    private val NullRow = Row(null, null, null)
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = {
      // no temp-file stream cache on executors
      javax.imageio.ImageIO.setUseCache(false)
      payloads.map { b =>
        try {
          boundedImageRead(b) match {
            case None => NullRow
            case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            Row(w, h, sum * 1000L / (w.toLong * h * 3))
          }
        } catch { case scala.util.control.NonFatal(_) => NullRow }
      }
      // (bounded read: header dims checked before any pixel allocation)
    }
  }

  /** Encode a solid-color image through the JDK's own writers ("png",
    * "jpg", "gif", "bmp") — the deterministic generator the codec gates
    * use. PNG/GIF/BMP are lossless here (solid color), so decoded stats
    * replay exactly; JPEG is lossy, so gates bucket its means. */
  def syntheticImage(w: Int, h: Int, r: Int, g: Int, b: Int,
                     format: String): Array[Byte] = {
    require(w >= 1 && h >= 1)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no JDK writer for image format '$format'")
    out.toByteArray
  }

  /** REAL multi-container audio decoder via the JDK's own
    * `javax.sound.sampled` readers (WAV, AIFF, AU in the bare JRE).
    * Emits the parsed format fields, exact duration, and for 16-bit PCM
    * the integer RMS (floor) — endianness-aware, so AIFF/AU (big-endian)
    * and WAV (little-endian) payloads produce identical stats for the
    * same samples. Malformed/unsupported → NULL features. */
  object AudioIoDecoder extends BlobDecoder {
    val featureSchema: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("duration_ms", LongType),
      StructField("rms", LongType)))
    private val NullRow = Row(null, null, null, null, null)
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val fmt = ais.getFormat
          val rate = math.round(fmt.getSampleRate)
          val frames = ais.getFrameLength
          if (rate <= 0 || frames < 0) NullRow
          else {
            val durMs = frames * 1000L / rate
            val pcm16 = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16
            val rms =
              if (!pcm16) null
              else {
                val data = ais.readAllBytes()
                val n = data.length & ~1
                if (n == 0) null
                else {
                  var ss = 0.0
                  var i = 0
                  if (fmt.isBigEndian)
                    while (i + 1 < n) {
                      val s = ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
                      ss += s.toDouble * s; i += 2
                    }
                  else
                    while (i + 1 < n) {
                      val s = ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
                      ss += s.toDouble * s; i += 2
                    }
                  math.sqrt(ss / (n / 2)).toLong
                }
              }
            Row(rate, fmt.getChannels, fmt.getSampleSizeInBits, durMs, rms)
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => NullRow }
    }
  }

  /** Encode mono 16-bit PCM samples into a real WAV/AIFF/AU container via
    * the JDK's own writers — the generator for [[AudioIoDecoder]] gates.
    * `container` ∈ {"wav", "aiff", "au"}. */
  def syntheticAudio(samples: Array[Short], sampleRate: Int,
                     container: String): Array[Byte] = {
    import javax.sound.sampled._
    val big = container != "wav" // AIFF/AU are big-endian containers
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (big) { bytes(2 * i) = (s >> 8).toByte; bytes(2 * i + 1) = s.toByte }
      else { bytes(2 * i) = s.toByte; bytes(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, big)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val tpe = container match {
      case "wav" => AudioFileFormat.Type.WAVE
      case "aiff" => AudioFileFormat.Type.AIFF
      case "au" => AudioFileFormat.Type.AU
      case other => throw new IllegalArgumentException(
        s"unknown audio container '$other'")
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  /** REAL audio decoder for the container a bare JVM parses with no codec
    * library: RIFF/WAVE PCM. Emits the fmt-chunk fields, the exact data
    * duration in milliseconds, and for 16-bit PCM the integer RMS over
    * all samples (floor). Non-PCM / malformed payloads decode to NULL
    * features; compressed audio stays behind the pluggable seam. */
  object WavDecoder extends BlobDecoder {
    val featureSchema: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("duration_ms", LongType),
      StructField("rms", LongType)))
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private val NullRow = Row(null, null, null, null, null)
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Row] = payloads.map { b =>
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") NullRow
      else {
        // chunk walk: fmt then data (any order, skip others). The cursor
        // advances in LONG arithmetic — a crafted chunk length near
        // Int.MaxValue must not wrap the offset negative and crash the
        // task (review r12-3); any inconsistency → NullRow, never a throw.
        var o = 12L
        var rate = -1; var ch = -1; var bits = -1; var byteRate = -1
        var dataOff = -1L; var dataLen = -1L
        while (o + 8 <= b.length && (rate < 0 || dataOff < 0)) {
          val id = tag(b, o.toInt); val len = le32(b, o.toInt + 4).toLong
          // the fmt fields span 16 declared bytes -- a truncated fmt chunk
          // (len < 16) would read the NEXT chunk's bytes as rate/bits and
          // emit plausible garbage instead of NULL (review r18-6)
          if (id == "fmt " && len >= 16 && o + 24 <= b.length) {
            if (le16(b, o.toInt + 8) == 1) { // PCM only
              ch = le16(b, o.toInt + 10); rate = le32(b, o.toInt + 12)
              byteRate = le32(b, o.toInt + 16); bits = le16(b, o.toInt + 22)
            }
          } else if (id == "data") { dataOff = o + 8; dataLen = len }
          if (len < 0) o = b.length.toLong // malformed length: stop the walk
          else o += 8 + len + (len & 1) // chunks are word-aligned
        }
        if (rate <= 0 || byteRate <= 0 || dataOff < 0 || dataLen < 0 ||
            dataOff + dataLen > b.length) NullRow
        else {
          val durMs = dataLen * 1000L / byteRate
          val rms =
            if (bits == 16 && dataLen >= 2) {
              // offsets fit Int here: dataOff + dataLen <= b.length
              var ss = 0.0; var i = dataOff.toInt
              val end = (dataOff + (dataLen & ~1L)).toInt
              while (i + 1 < end) {
                val s = le16(b, i).toShort.toDouble; ss += s * s; i += 2
              }
              math.sqrt(ss / ((dataLen & ~1L) / 2)).toLong
            } else null
          Row(rate, ch, bits, durMs, rms)
        }
      }
    }
  }

  /** Append `outCol: featureSchema` by decoding `blobCol.payload` in
    * partition-local batches (no shuffle; decoder instantiated per
    * partition). */
  def decodeStage(df: DataFrame, blobCol: String, outCol: String,
                  decoder: BlobDecoder, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField(outCol, decoder.featureSchema))
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map { r =>
          payloadOf(r.getStruct(blobIdx))
        })
        batch.lazyZip(feats).map { (r, f) => Row.fromSeq(r.toSeq :+ f) }
      }
    }(Encoders.row(schema))
  }

  // Positional accessors into the packBlob struct layout (payload=0,
  // meta=1; meta: format=0, width=1, height=2, size_bytes=3): rows built
  // inside a stage (plain GenericRow) carry no schema, so chained stages
  // must not rely on name lookup.
  // NULL-safe (review r18-6): a null blob struct (outer-join output, raw
  // ingest) must flow as an empty payload / pass-through row, never an
  // NPE that kills the task -- the one-bad-blob contract covers null
  // structs, not just malformed bytes.
  private def payloadOf(blob: Row): Array[Byte] =
    if (blob == null) Array.empty[Byte]
    else Option(blob.get(0)).map(_.asInstanceOf[Array[Byte]])
      .getOrElse(Array.empty[Byte])
  private def metaOf(blob: Row): Row =
    if (blob == null) null else blob.getStruct(1)

  /** Resizer contract (the brief's resize stage): payload + old meta →
    * resized payload + new (width, height). Real deployments plug an image
    * scaler; the shipped stub is a deterministic byte-stride downsample. */
  trait BlobResizer extends Serializable {
    def resize(payload: Array[Byte], width: Int,
               height: Int): (Array[Byte], Int, Int)
  }

  /** STUB resizer — keeps every `stride`-th byte and divides the declared
    * dimensions by `stride` (ceil). Deterministic stand-in for a pixel
    * scaler (media libs absent in this container); the schema/meta
    * bookkeeping is the real convention. */
  final case class StrideResizer(stride: Int) extends BlobResizer {
    require(stride >= 1)
    def resize(payload: Array[Byte], width: Int, height: Int): (Array[Byte], Int, Int) = {
      val out = new Array[Byte]((payload.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = payload(i * stride); i += 1 }
      (out, (width + stride - 1) / stride, (height + stride - 1) / stride)
    }
  }

  /** REAL image resizer for uncompressed 24-bpp BMP payloads:
    * nearest-neighbor sampling to `targetW`×`targetH`, re-emitting a VALID
    * BMP (54-byte header, 4-byte-aligned rows) — a stock viewer opens the
    * output. Non-BMP payloads pass through unchanged with their declared
    * dimensions (the robust-at-scale contract); codec formats stay behind
    * the pluggable seam. */
  final case class BmpNearestResizer(targetW: Int, targetH: Int)
      extends BlobResizer {
    require(targetW >= 1 && targetH >= 1)
    def resize(payload: Array[Byte], width: Int,
               height: Int): (Array[Byte], Int, Int) = {
      val b = payload
      val (off, w, h, stride, topDown) = parseBmp(b) match {
        case None => return (payload, width, height)
        case Some(g) => g
      }
      val newStride = ((targetW * 3 + 3) / 4) * 4
      val out = java.nio.ByteBuffer.allocate(54 + newStride * targetH)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      putBmpHeader(out, targetW, targetH, newStride)
      var y = 0
      while (y < targetH) {
        val syUp = (y.toLong * h / targetH).toInt
        // output is bottom-up: a top-down source's stored rows mirror
        val sy = if (topDown) h - 1 - syUp else syUp
        var x = 0
        while (x < targetW) {
          val sx = (x.toLong * w / targetW).toInt
          val sp = off + sy * stride + sx * 3
          out.put(b(sp)).put(b(sp + 1)).put(b(sp + 2))
          x += 1
        }
        var pad = targetW * 3
        while (pad < newStride) { out.put(0.toByte); pad += 1 }
        y += 1
      }
      (out.array(), targetW, targetH)
    }
  }

  /** REAL codec-format image resizer via the JDK's own raster pipeline:
    * decode with ImageIO, nearest-neighbor scale through Graphics2D, and
    * re-encode with the named JDK writer ("png"/"jpg"/"gif"/"bmp") — a
    * stock viewer opens the output. Non-image payloads pass through
    * unchanged with their declared dimensions (the robust-at-scale
    * contract, same as [[BmpNearestResizer]]). */
  final case class ImageIoResizer(targetW: Int, targetH: Int,
                                  format: String = "png")
      extends BlobResizer {
    require(targetW >= 1 && targetH >= 1)
    def resize(payload: Array[Byte], width: Int,
               height: Int): (Array[Byte], Int, Int) = {
      try {
        // bounded read: the decompression-bomb guard applies to the
        // resizer's decode too (review r18-6)
        val img = boundedImageRead(payload) match {
          case None => return (payload, width, height)
          case Some(i) => i
        }
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        // write() returns false (no exception) for a format with no JDK
        // writer — falling through would replace the image with an EMPTY
        // payload claiming the target dims; pass through instead
        if (!javax.imageio.ImageIO.write(out, format, baos))
          (payload, width, height)
        else (baos.toByteArray, targetW, targetH)
      } catch {
        case scala.util.control.NonFatal(_) => (payload, width, height)
      }
    }
  }

  /** Resize stage: rewrite `blobCol` IN PLACE (payload + meta.width/height/
    * size_bytes) through `resizer` — partition-local, no shuffle, schema
    * unchanged, so downstream stages and metadata pushdown are oblivious
    * to whether they run pre- or post-resize. */
  def resizeStage(df: DataFrame, blobCol: String,
                  resizer: BlobResizer): DataFrame = {
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { it =>
      it.map { r =>
        val blob = r.getStruct(blobIdx)
        val meta = metaOf(blob)
        // a null blob/meta or null dimensions passes through untouched
        // (the one-bad-blob contract; inventing dimensions would be worse)
        if (meta == null || meta.isNullAt(1) || meta.isNullAt(2)) r
        else {
          val (p2, w2, h2) = resizer.resize(payloadOf(blob),
            meta.getInt(1), meta.getInt(2))
          val newBlob = Row(p2,
            Row(meta.getString(0), w2, h2, p2.length.toLong))
          Row.fromSeq(r.toSeq.updated(blobIdx, newBlob))
        }
      }
    }(Encoders.row(df.schema))
  }

  /** Frame-sample stage (the brief's video stand-in): split the payload
    * into fixed `frameBytes` chunks ("frames") and keep every `every`-th
    * one, appending `outCol: array<binary>`. Deterministic, partition-
    * local; a real deployment plugs a container demuxer in front. */
  def frameSampleStage(df: DataFrame, blobCol: String, outCol: String,
                       frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes >= 1 && every >= 1)
    val schema = df.schema.add(StructField(outCol, ArrayType(BinaryType)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = payloadOf(r.getStruct(blobIdx))
        val frames = payload.grouped(frameBytes).zipWithIndex
          .collect { case (f, i) if i % every == 0 => f }.toSeq
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(Encoders.row(schema))
  }
}
