package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Multimodal column convention (LLM-pipeline brief): media travel as an
  * opaque `binary` payload plus a typed metadata struct — the schema shape a
  * 100 TB image/audio corpus uses, with decode/feature-extraction running as
  * a batched mapPartitions stage next to the data.
  *
  * The decode step itself is a pluggable `BlobDecoder`; this container has
  * no image/audio libraries, so the shipped decoder is an explicitly-marked
  * deterministic STUB (byte statistics) — the Spark-side plumbing (schema,
  * partition-local batching, struct metadata, predicate pushdown on metadata
  * fields) is real and oracle-tested.
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
  private def payloadOf(blob: Row): Array[Byte] =
    Option(blob.get(0)).map(_.asInstanceOf[Array[Byte]])
      .getOrElse(Array.empty[Byte])
  private def metaOf(blob: Row): Row = blob.getStruct(1)

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
        val (p2, w2, h2) = resizer.resize(payloadOf(blob),
          meta.getInt(1), meta.getInt(2))
        val newBlob = Row(p2, Row(meta.getString(0), w2, h2, p2.length.toLong))
        Row.fromSeq(r.toSeq.updated(blobIdx, newBlob))
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
