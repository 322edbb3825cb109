package graft.embed

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding stage: determinism across partitionings/batch boundaries,
  * normalization, provider contract. */
class EmbedSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private val texts = (0 until 200).map(i =>
    (i.toLong, s"word$i common the a token${i % 7} tail"))

  test("embedding is deterministic across partition counts and batch sizes") {
    def run(parts: Int, batch: Int) =
      Embeddings.embedStage(texts.toDF("id", "text").repartition(parts),
          "text", "e", () => Embeddings.HashingProvider(8), batchSize = batch)
        .select($"id", $"e").as[(Long, Seq[Float])].collect().toMap
    val a = run(1, 64)
    val b = run(7, 3) // ragged batches, many partitions
    assert(a === b)
  }

  test("normalized embeddings are unit vectors; empty text is a zero vector") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "")).toDF("id", "text")
    val out = Embeddings.embedStage(df, "text", "e",
      () => Embeddings.HashingProvider(8)).select($"id", $"e")
      .as[(Long, Seq[Float])].collect().toMap
    val n1 = math.sqrt(out(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-6)
    assert(out(2L).forall(_ == 0.0f))
  }

  test("null text is treated as empty, not an NPE") {
    val df = Seq((1L, Some("x y z")), (2L, None: Option[String])).toDF("id", "text")
    val out = Embeddings.embedStage(df, "text", "e",
      () => Embeddings.HashingProvider(4)).select($"id", $"e")
      .as[(Long, Seq[Float])].collect().toMap
    assert(out(2L).forall(_ == 0.0f))
  }

  test("unnormalized counts sum to the token count") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val out = Embeddings.embedStage(df, "text", "e",
      () => Embeddings.HashingProvider(4, normalize = false))
      .select($"e").as[Seq[Float]].head()
    assert(out.map(_.toLong).sum === 7L)
  }
}
