package graft.vector

import graft.SparkT
import org.scalatest.funsuite.AnyFunSuite

/** int8 quantization: bounded reconstruction error, exact-match rescoring
  * on the real fixture, degenerate-dimension safety. */
class QuantizeSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = graft.engine.Graft.table(SparkT.spark, sfDir, "embeddings")

  test("reconstruction error is bounded by half a quantization step per dim") {
    val m = Quantize.train(emb, "embedding")
    val v = emb.select("embedding").as[Seq[Float]].head().toArray
    val codes = m.quantize(v)
    v.indices.foreach { i =>
      val err = math.abs(m.dequantize(codes(i), i) - v(i))
      assert(err <= m.scale(i) * 0.5 + 1e-6, s"dim $i err $err")
    }
  }

  test("coarse+rescore equals the exact fullscan top-k on the fixture") {
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    val q = emb.where($"vec_id" === 0).select("embedding").as[Seq[Float]].head().toArray
    val exact = Knn.knn(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    val quant = Quantize.searchRescore(qdf, "embedding", "qvec", "vec_id", m, q, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(quant === exact)
  }

  test("zero-range dimensions quantize without dividing by zero") {
    val df = Seq((1L, Array(1.0f, 5.0f)), (2L, Array(1.0f, 7.0f))).toDF("id", "v")
    val m = Quantize.train(df, "v")
    assert(m.scale(0) === 1.0f) // degenerate dim pinned
    val codes = m.quantize(Array(1.0f, 6.0f))
    assert(m.dequantize(codes(0), 0) === 1.0f)
  }
}
