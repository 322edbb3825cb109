package graft.embed

import graft.SparkT
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** K8 local-model lifecycle (ref embeddings/src/model/local.rs behind the
  * mod.rs:65-70 trait): weights load from a file artifact ONCE per
  * partition, the warm handle serves every batch, and validation failures
  * (missing file, foreign format, dimension mismatch) fail at load — never
  * as silently-wrong vectors. */
class LocalModelSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private def artifact(vocabDim: Int = 32, dim: Int = 8): String = {
    val p = Files.createTempDirectory("graft-lm").resolve("m.bin").toString
    Embeddings.LocalModel.writeArtifact(p,
      Embeddings.LocalModel.gaussianWeights(vocabDim, dim, seed = 7))
    p
  }

  test("weights load once per JVM and every partition's handle shares them") {
    val path = artifact()
    val df = (0 until 40).map(i => (i.toLong, s"tok$i alpha beta"))
      .toDF("id", "text").repartition(4)
    val before = Embeddings.LocalModel.loadCount.get()
    // batchSize 4 over 40 rows in 4 partitions: ~10 batches, 4 handles —
    // but ONE disk load: the executor-shared cache is the daemon's
    // one-model-many-threads lifecycle (text_model_wrapper.rs hands a
    // single ModelHandle to every caller thread)
    val out = Embeddings.embedStage(df, "text", "e",
        () => Embeddings.LocalModelProvider(path, dim = 8), batchSize = 4)
      .select($"id", $"e").as[(Long, Seq[Float])].collect()
    assert(out.length === 40)
    assert(Embeddings.LocalModel.loadCount.get() - before === 1L)
    // a second job over the same artifact reloads nothing
    Embeddings.embedStage(df, "text", "e",
      () => Embeddings.LocalModelProvider(path, dim = 8)).collect()
    assert(Embeddings.LocalModel.loadCount.get() - before === 1L)
    // eviction (artifact hot-swap seam) forces the next handle to reload
    assert(Embeddings.LocalModel.evictShared(path) === 1)
    Embeddings.LocalModelProvider(path, dim = 8).embedBatch(Seq("x"))
    assert(Embeddings.LocalModel.loadCount.get() - before === 2L)
  }

  test("file-loaded inference is bit-identical to the in-memory provider with the same weights") {
    val p = Files.createTempDirectory("graft-lm2").resolve("m.bin").toString
    // the artifact IS RandomProjectionProvider's matrix (same seeded
    // construction), so the file round-trip must change nothing
    Embeddings.LocalModel.writeArtifact(p,
      Embeddings.LocalModel.gaussianWeights(16, 4, seed = 11))
    val texts = Seq("alpha beta beta", "", "gamma")
    val got = Embeddings.LocalModelProvider(p, dim = 4).embedBatch(texts)
    val want = Embeddings.RandomProjectionProvider(dim = 4, vocabDim = 16,
      seed = 11, normalize = false).embedBatch(texts)
    assert(got.map(_.toSeq) === want.map(_.toSeq))
  }

  test("declared-dim mismatch, missing file and foreign format fail at load") {
    val p = artifact(dim = 8)
    val wrongDim = intercept[org.apache.spark.SparkException] {
      Embeddings.embedStage(Seq((1L, "x")).toDF("id", "text"), "text", "e",
        () => Embeddings.LocalModelProvider(p, dim = 16)).collect()
    }
    assert(wrongDim.getMessage.contains("dim") ||
      Option(wrongDim.getCause).exists(_.getMessage.contains("dim")))
    intercept[java.io.FileNotFoundException] {
      Embeddings.LocalModelProvider("/nonexistent/m.bin", dim = 8)
        .embedBatch(Seq("x"))
    }
    val junk = Files.createTempDirectory("graft-lm3").resolve("j.bin")
    Files.write(junk, Array.fill[Byte](64)(42))
    val foreign = intercept[IllegalStateException] {
      Embeddings.LocalModelProvider(junk.toString, dim = 8)
        .embedBatch(Seq("x"))
    }
    assert(foreign.getMessage.contains("not a graft model artifact"))
  }

  test("a relative path resolves through SparkFiles (the cluster shipping path)") {
    val p = artifact()
    SparkT.spark.sparkContext.addFile(p)
    // bare file name, no local copy at the relative path: the provider
    // falls back to SparkFiles.get — how executors see a --files artifact
    val out = Embeddings.LocalModelProvider("m.bin", dim = 8)
      .embedBatch(Seq("alpha"))
    assert(out.head.length === 8)
  }
}
