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

  test("random-projection provider: deterministic across partitionings, unit norm") {
    def run(parts: Int) =
      Embeddings.embedStage(texts.toDF("id", "text").repartition(parts),
          "text", "e", () => Embeddings.RandomProjectionProvider(16))
        .select($"id", $"e").as[(Long, Seq[Float])].collect().toMap
    val a = run(1)
    val b = run(5)
    assert(a === b) // seeded matrix rebuilt identically per partition
    val n = math.sqrt(a(0L).map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("random projection approximately preserves cosine structure (JL)") {
    val p = Embeddings.RandomProjectionProvider(64)
    val near1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val near2 = near1.replace("theta", "iota")
    val far = "completely different words about storage engines and disks " * 4
    val Seq(a, b, c) = p.embedBatch(Seq(near1, near2, far))
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (u, v) => u.toDouble * v }.sum // unit vectors
    assert(cos(a, b) > cos(a, c) + 0.2,
      s"near=${cos(a, b)} far=${cos(a, c)}")
  }

  test("unnormalized counts sum to the token count") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val out = Embeddings.embedStage(df, "text", "e",
      () => Embeddings.HashingProvider(4, normalize = false))
      .select($"e").as[Seq[Float]].head()
    assert(out.map(_.toLong).sum === 7L)
  }
}
