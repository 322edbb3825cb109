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
          val blob = r.getStruct(blobIdx)
          Option(blob.getAs[Array[Byte]]("payload")).getOrElse(Array.empty)
        })
        batch.lazyZip(feats).map { (r, f) => Row.fromSeq(r.toSeq :+ f) }
      }
    }(Encoders.row(schema))
  }
}
