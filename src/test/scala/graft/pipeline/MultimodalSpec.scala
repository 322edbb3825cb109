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
}
