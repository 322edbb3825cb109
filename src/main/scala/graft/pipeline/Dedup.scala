package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for the LLM-pipeline surface: exact hash dedup,
  * MinHash + banded LSH near-dup with exact-jaccard verification, SimHash
  * fingerprints with pigeonhole chunk blocking, and embedding-cosine
  * near-dup. Designed Spark-first (no reference implementation to cite).
  *
  * 100 TB design rules baked in:
  *  - never all-pairs: candidates come from an equi-join on band/chunk keys,
  *    so cost scales with Σ bucket² (data-dependent) not n²;
  *  - the shuffle payload for candidate generation is (id, key) longs, never
  *    the text or shingle sets;
  *  - verification joins shingle sets back only for the candidate pairs;
  *  - everything is functions.* expression trees — codegen'd, no UDFs.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical text. Grouping is by
    * xxhash64(text) so the shuffle carries 8-byte keys, not documents
    * (collision odds 2^-64 — the same bet the reference's string-hash
    * columns make, columnar/columnar.cpp:465-473). */
  def exactKeepers(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"))
      .select("keep_id")

  /** MinHash signature: k independent hash functions = xxhash64 seeded by
    * the function index, min over the shingle set. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingles, s => xxhash64(i, s))))

  /** LSH band keys: signature split into `bands` runs of k/bands rows; each
    * band hashed to one 64-bit key. Two sets with jaccard j share at least
    * one band key with prob 1-(1-j^r)^b. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand))))

  /** Candidate pairs (a < b) from banded MinHash LSH over a shingle-set
    * column. Rows with empty shingle sets never pair. */
  def minhashCandidates(df: DataFrame, idCol: String, shingleCol: String,
                        k: Int = 128, bands: Int = 32): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val sig = minhashSignature(col(shingleCol), k)
    val banded = df.filter(size(col(shingleCol)) > 0)
      .select(col(idCol).as("mid"),
        posexplode(bandKeys(sig, bands, k / bands)).as(Seq("band", "key")))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key")
        && col("l.mid") < col("r.mid"))
      .select(col("l.mid").as("a"), col("r.mid").as("b"))
      .distinct()
  }

  /** Exact jaccard verification of candidate pairs against the shingle sets.
    * Returns (a, b, jac_micros) for pairs with jaccard >= threshold; the
    * floor-micros encoding keeps the value engine-stable. */
  def jaccardVerify(candidates: DataFrame, df: DataFrame, idCol: String,
                    shingleCol: String, threshold: Double): DataFrame = {
    val sa = df.select(col(idCol).as("a"), col(shingleCol).as("sa"))
    val sb = df.select(col(idCol).as("b"), col(shingleCol).as("sb"))
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
      size(array_union(col("sa"), col("sb")))
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("jac", jac)
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"),
        floor(col("jac") * 1000000).cast("long").as("jac_micros"))
  }

  /** Near-dup pairs: MinHash LSH candidates + exact jaccard verify.
    * With k=128/bands=32 (4 rows per band) a pair at jaccard 0.8 is missed
    * with prob (1-0.8^4)^32 ≈ 5e-8 — exhaustive for gate purposes, while
    * candidate generation stays bucket-local. */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
                shingleN: Int = 3, threshold: Double = 0.8,
                k: Int = 128, bands: Int = 32): DataFrame = {
    val withSh = df.select(col(idCol),
      TextFunctions.shingles(col(textCol), shingleN).as("sh"))
    val cands = minhashCandidates(withSh, idCol, "sh", k, bands)
    jaccardVerify(cands, withSh, idCol, "sh", threshold)
  }

  /** 64-bit SimHash over a shingle set: bit j is the sign of the sum over
    * shingles of ±1 depending on bit j of xxhash64(shingle). Single pass:
    * an array-of-counters accumulator zipped per shingle. */
  // 2^j for j in 0..63 as a literal array (shiftleft/shiftright take only
  // Int amounts, not Columns — bit masks keep the shift amount data-driven).
  private val pow2: Column = typedLit((0 until 64).map(j => 1L << j).toArray)

  def simhash64(shingles: Column): Column = {
    val counters = aggregate(shingles,
      array_repeat(lit(0), 64),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(1), lit(64)), j =>
          when(xxhash64(s).bitwiseAND(element_at(pow2, j)) =!= 0, 1).otherwise(-1)),
        (x, y) => x + y))
    aggregate(zip_with(counters, sequence(lit(1), lit(64)),
        (cnt, j) => when(cnt >= 0, element_at(pow2, j)).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup candidates with EXACT hamming<=3 completeness: split
    * the 64-bit fingerprint into 4 chunks of 16 bits — by pigeonhole, any
    * pair within hamming distance 3 shares at least one identical chunk, so
    * the chunk equi-join misses nothing (this blocking is deterministic,
    * unlike probabilistic LSH). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, maxHamming: Int = 3): DataFrame = {
    val withFp = df
      .select(col(idCol).as("sid"),
        simhash64(TextFunctions.shingles(col(textCol), shingleN)).as("fp"))
    // Chunk key = fp masked to the chunk's 16 bits (position-shifted values
    // are unnecessary: the join also matches on the chunk index).
    val chunkMasks = typedLit((0 until 4).map(c => 0xFFFFL << (c * 16)).toArray)
    val chunked = withFp.select(col("sid"), col("fp"),
        posexplode(transform(sequence(lit(1), lit(4)), c =>
          col("fp").bitwiseAND(element_at(chunkMasks, c))))
          .as(Seq("chunk", "ckey")))
    val l = chunked.as("l")
    val r = chunked.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey")
        && col("l.sid") < col("r.sid"))
      .select(col("l.sid").as("a"), col("r.sid").as("b"),
        bit_count(col("l.fp").bitwiseXOR(col("r.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs, exact: inequality self-join + codegen
    * cosine + threshold. O(n²) by nature — correct at verification scale;
    * the scale path blocks candidates first (see [[embedBandKeys]] +
    * DedupSpec's clustered-recall test) and verifies with the same cosine.
    */
  def cosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", graft.vector.distances.cosineSim(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"),
        floor(col("cos") * 1000000).cast("long").as("cos_micros"))
  }

  /** Random-hyperplane band keys for embedding LSH: sign bits of the dot
    * product against seeded deterministic hyperplanes, grouped into bands.
    * P(bit agrees) = 1 - angle/π, so bands of r bits catch a pair at cosine
    * c with prob 1-(1-(1-acos(c)/π)^r)^bands. */
  def embedBandKeys(vec: Column, dim: Int, planes: Int, bands: Int,
                    seed: Long = 42L): Seq[Column] = {
    require(planes % bands == 0)
    val rnd = new scala.util.Random(seed)
    val hp: Seq[Array[Float]] =
      Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val bits = hp.map(p =>
      when(graft.vector.distances.ipScore(vec, typedLit(p)) >= 0, "1")
        .otherwise("0"))
    bits.grouped(planes / bands).zipWithIndex.map { case (g, i) =>
      concat(lit(i.toString + ":"), concat(g: _*))
    }.toSeq
  }

  /** Candidate pairs from embedding LSH banding (scale path; recall depends
    * on the cosine gap — verify with [[cosinePairsExact]]'s predicate). */
  def embedCandidates(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      planes: Int = 128, bands: Int = 16,
                      seed: Long = 42L): DataFrame = {
    val keys = embedBandKeys(col(vecCol), dim, planes, bands, seed)
    val banded = df.select(col(idCol).as("mid"),
      posexplode(array(keys: _*)).as(Seq("band", "key")))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key")
        && col("l.mid") < col("r.mid"))
      .select(col("l.mid").as("a"), col("r.mid").as("b"))
      .distinct()
  }
}
