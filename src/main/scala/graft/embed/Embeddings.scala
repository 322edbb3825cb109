package graft.embed

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Text→embedding stage (K8) — the Spark-native analog of the reference's
  * embeddings cdylib (embeddings/src/ffi.rs:78; provider trait shape
  * embeddings/src/model/mod.rs:65-70: batch of texts → batch of vectors).
  *
  * Providers are pluggable; the container is offline, so the default is a
  * DETERMINISTIC feature-hashing provider (bucket = rolling polynomial hash
  * of the token mod dim, weight = token count) — honest about being a stub
  * for the remote/ONNX providers the reference dlopens
  * (knn/embeddings.cpp:75-146), while exercising the real distributed
  * plumbing: one provider instance per partition (the model-handle pattern),
  * batched invocation, schema evolution.
  *
  * 100 TB design: the stage is mapPartitions — no shuffle, no driver
  * round-trips; provider construction cost is amortized per partition, and
  * batches bound peak memory the way the reference's rayon batches do.
  */
object Embeddings {

  /** Provider contract (ref model/mod.rs:65-70). Implementations must be
    * constructible on executors (the factory is shipped, not the model). */
  trait TextToEmbeddings extends Serializable {
    def dim: Int
    def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Shared token→bucket kernel: the same rolling polynomial hash as
    * TextFunctions.fingerprint (and the q_embed_stub oracle SQL replays it)
    * — one definition so providers and oracle can never silently diverge.
    * Hashes CODEPOINTS (not UTF-16 code units): DuckDB's `unicode(c)` and
    * fingerprintScala both see codepoints, so a supplementary-plane
    * character (emoji) must not split into two surrogate units here. */
  private[embed] def hashBucket(token: String, buckets: Int): Int = {
    var acc = 0L
    val it = token.codePoints().iterator()
    while (it.hasNext) {
      acc = (acc * 31 + it.next().toLong) % 1000000007L
    }
    (acc % buckets).toInt
  }

  /** Deterministic offline provider: feature-hashed token counts.
    * `normalize=false` keeps exact integer counts (oracle-comparable);
    * `normalize=true` gives unit vectors (similarity-ready). */
  final case class HashingProvider(dim: Int, normalize: Boolean = true)
      extends TextToEmbeddings {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Float](dim)
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        v(hashBucket(tok, dim)) += 1.0f
      }
      if (normalize) {
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n > 0) (0 until dim).foreach(i => v(i) = (v(i) / n).toFloat)
      }
      v
    }
  }

  /** Deterministic offline provider #2: seeded random-projection embeddings
    * — a dense, model-like vector space (the Johnson-Lindenstrauss classic:
    * token-count vectors over `vocabDim` hash buckets projected through a
    * seeded Gaussian matrix into `dim` dims, unit-normalized). The matrix
    * is the "model weights": built lazily ONCE per provider instance — i.e.
    * once per partition in [[embedStage]], the same model-handle lifecycle
    * a real ONNX/remote provider needs (ref model/mod.rs:65-70). Cosine
    * structure of the sparse token space is approximately preserved, so
    * downstream similarity search behaves like it would with a real model.
    */
  final case class RandomProjectionProvider(dim: Int, vocabDim: Int = 4096,
                                            seed: Long = 42L,
                                            normalize: Boolean = true)
      extends TextToEmbeddings {
    @transient private lazy val proj: Array[Array[Float]] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(vocabDim)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val counts = scala.collection.mutable.LongMap.empty[Int]
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val b = hashBucket(tok, vocabDim)
        counts(b) = counts.getOrElse(b.toLong, 0) + 1
      }
      val v = new Array[Float](dim)
      counts.foreach { case (b, c) =>
        val row = proj(b.toInt)
        var i = 0
        while (i < dim) { v(i) += c * row(i); i += 1 }
      }
      if (normalize) {
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n > 0) (0 until dim).foreach(i => v(i) = (v(i) / n).toFloat)
      }
      v
    }
  }

  /** Provider registry — the seam where remote/local model providers plug in
    * (ref ffi.rs GetLibFuncs). Offline container ships the deterministic
    * stubs; a real provider registers here unchanged. */
  val providers: Map[String, (Int, Boolean) => TextToEmbeddings] = Map(
    "hash" -> ((dim, norm) => HashingProvider(dim, norm)),
    "randproj" -> ((dim, norm) => RandomProjectionProvider(dim, normalize = norm))
  )

  /** Append `outCol: array<float>` by embedding `textCol`. One provider per
    * partition, invoked in batches of `batchSize`. */
  def embedStage(df: DataFrame, textCol: String, outCol: String,
                 provider: () => TextToEmbeddings,
                 batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(FloatType)))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val p = provider() // one model handle per partition
      it.grouped(batchSize).flatMap { batch =>
        val vecs = p.embedBatch(batch.map(r =>
          Option(r.getString(textIdx)).getOrElse("")))
        batch.lazyZip(vecs).map { (r, v) =>
          Row.fromSeq(r.toSeq :+ (v.toSeq: Seq[Float]))
        }
      }
    }(Encoders.row(schema))
  }
}
