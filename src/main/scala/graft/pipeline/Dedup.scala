package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

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

  /** MinHash signature: each shingle STRING is hashed exactly once
    * (xxhash64 over the bytes), and the k functions re-hash that 8-byte
    * value seeded by the function index — a min-wise family at 1/len(s) of
    * the cost of re-hashing strings k times (the higher-order-function
    * lambdas evaluate interpreted, so per-element cost is the wall clock). */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val base = transform(shingles, s => xxhash64(s))
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(base, h => xxhash64(i, h))))
  }

  /** LSH band keys: signature split into `bands` runs of k/bands rows; each
    * band hashed to one 64-bit key. Two sets with jaccard j share at least
    * one band key with prob 1-(1-j^r)^b. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand))))

  /** The k-functions × shingles signature loop is the one COMPUTE-BOUND
    * kernel of the pipeline (k·|shingles| hash evaluations per document).
    * As an expression tree it runs through interpreted higher-order-function
    * lambdas (~µs per element — boxing + InternalRow per call); as a plain
    * Scala loop it is JIT'd primitive arithmetic (~ns per element). This is
    * the sanctioned "mapPartitions for genuine per-partition imperative
    * logic" case — the same reason the reference hand-writes its kernels
    * (knn/space.cpp). [[bandKeysScala]] replays the exact hash composition
    * Spark's XxHash64 expression applies (hashInt for Int inputs, hashLong
    * with the running hash as seed, element-wise over arrays), so it is
    * bit-equal to [[minhashSignature]]+[[bandKeys]] — DedupSpec asserts it.
    */
  /** Scala twin of TextFunctions.shingles — same token/shingle definition
    * (DedupSpec asserts equality). The expression form inlines the split()
    * subtree into every lambda element (tokenization recomputed per shingle
    * per element_at), so the pipeline uses this instead. */
  private[pipeline] def shinglesScala(text: String, n: Int): Seq[String] = {
    val toks = Option(text).getOrElse("").trim
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Vector.empty
    else toks.sliding(n).map(_.mkString(" ")).toVector.distinct
  }

  private def shingleHash(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  /** Test seam: JVM-wide count of signature-kernel invocations, active
    * only when [[instrumented]] is set (a volatile read per document in
    * production, no contended atomic). In local mode (executors
    * in-process) DedupSpec enables it to assert the compute-bound stage
    * runs ONCE per document — i.e. the persist points below actually hold
    * (VERDICT r4 #4: un-persisted lineage re-ran the kernel ~4×). */
  private[pipeline] val bandKernelInvocations =
    new java.util.concurrent.atomic.AtomicLong
  @volatile private[pipeline] var instrumented = false

  private[pipeline] def bandKeysScala(sh: Seq[String], k: Int,
                                      bands: Int): Array[Long] = {
    if (instrumented) bandKernelInvocations.incrementAndGet()
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val r = k / bands
    // xxhash64(i, h) in the expression path = hashLong(h, hashInt(i, 42)):
    // XxHash64 folds inputs left-to-right with the running hash as seed.
    val seeds = Array.tabulate(k)(i => XXH64.hashInt(i, 42L))
    val mins = Array.fill(k)(Long.MaxValue)
    sh.foreach { s =>
      val h = shingleHash(s)
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(h, seeds(i)); if (v < mins(i)) mins(i) = v; i += 1
      }
    }
    // xxhash64(b, slice(sig, …)) = fold of the band's longs starting from
    // hashInt(b, 42) — arrays hash element-wise with no length mixing.
    Array.tabulate(bands) { b =>
      var acc = XXH64.hashInt(b, 42L)
      var j = 0
      while (j < r) { acc = XXH64.hashLong(mins(b * r + j), acc); j += 1 }
      acc
    }
  }

  /** The (id, band, key) frame the LSH join runs on — the output of the
    * compute-bound signature kernel. Callers MUST persist this before
    * self-joining it, or the kernel runs once per join side. */
  private def bandedFrame(df: DataFrame, idCol: String, shingleCol: String,
                          k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    import df.sparkSession.implicits._
    // Repartition before the signature stage: compute-bound, so width must
    // come from cores, not from however few file splits the input had;
    // round-robin also balances document-length skew.
    val width = df.sparkSession.sparkContext.defaultParallelism
    df.filter(size(col(shingleCol)) > 0)
      .repartition(width)
      .select(col(idCol).cast("long").as("mid"), col(shingleCol).as("sh"))
      .filter(col("mid").isNotNull) // null id would crash the encoder
      .as[(Long, Seq[String])]
      .flatMap { case (id, sh) =>
        bandKeysScala(sh, k, bands).iterator.zipWithIndex
          .map { case (key, b) => (id, b, key) }
      }
      .toDF("mid", "band", "key")
  }

  /** Persist + materialize a frame that is about to be read by multiple
    * downstream branches (self-join sides, verify joins). The count() is
    * load-bearing: a lazy persist lets two stages first-touch the same
    * partitions concurrently and compute the lineage once per side anyway. */
  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Run `result` eagerly (localCheckpoint), then free the cached
    * intermediates — the returned frame is small and checkpoint-backed. */
  private def eagerly(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }

  /** Self-join of a banded frame on (band, key) → candidate pairs a < b. */
  private def bandSelfJoin(banded: DataFrame): DataFrame = {
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key")
        && col("l.mid") < col("r.mid"))
      .select(col("l.mid").as("a"), col("r.mid").as("b"))
      .distinct()
  }

  /** Candidate pairs (a < b) from banded MinHash LSH over a shingle-set
    * column. Rows with empty shingle sets never pair. The id column must be
    * integral (cast to long). The banded frame is persisted across the
    * self-join (signature kernel runs once per row, not once per side) and
    * freed after the eager materialization. */
  def minhashCandidates(df: DataFrame, idCol: String, shingleCol: String,
                        k: Int = 128, bands: Int = 32): DataFrame = {
    val banded = materialized(bandedFrame(df, idCol, shingleCol, k, bands))
    eagerly(bandSelfJoin(banded), banded)
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
    import df.sparkSession.implicits._
    // Persist the two recompute points of this DAG (VERDICT r4 #4): withSh
    // feeds the band kernel AND both jaccardVerify sides; banded is
    // self-joined. Un-persisted, the shingle+signature stages re-ran ~4×.
    // The pipeline is materialized eagerly (localCheckpoint) so the
    // intermediates can be freed here — the returned pairs frame is small
    // (candidates that survived exact verification).
    val withSh = shingleFrame(df, idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one materializing job fills BOTH caches (banded reads withSh);
    // downstream stages then only ever hit cache
    val banded = materialized(bandedFrame(withSh, idCol, "sh", k, bands))
    val cands = bandSelfJoin(banded)
    eagerly(jaccardVerify(cands, withSh, idCol, "sh", threshold),
      banded, withSh)
  }

  // ---- incremental dedup against a persisted signature store ----
  //
  // The 100 TB crawl-ingest shape: the historical corpus is NOT re-banded
  // per batch — its (mid, band, key) LSH frame persists as a compact store
  // (3 longs per band per doc; the shingle sets are NOT stored — exact
  // verification recomputes shingles for candidate corpus rows only, and
  // candidates are a vanishing fraction of the corpus). Each incoming
  // batch bands itself, equi-joins the store on (band, key), and verifies
  // the survivors exactly. Appends are segment-style (new files beside the
  // old — the same continuous-ingest philosophy as the index families).

  /** Shingle sets of (idCol, textCol) via the JIT'd kernel — one column
    * named `sh`, id cast to long. */
  private def shingleFrame(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int): DataFrame = {
    import df.sparkSession.implicits._
    // null (or non-castable) ids crash the non-nullable tuple encoder —
    // filter them like clusters() does (r19 review; the expression-tree
    // twins tolerate nulls, so the kernels must too)
    df.select(col(idCol).cast("long").as(idCol), col(textCol))
      .filter(col(idCol).isNotNull)
      .as[(Long, String)]
      .map { case (id, t) => (id, shinglesScala(t, shingleN)) }
      .toDF(idCol, "sh")
  }

  /** Write the corpus's banded LSH frame to `path` (overwrite). Sorted by
    * (band, key) inside partitions so file/row-group stats cluster the key
    * space — a selective probe (small batch) prunes store files instead of
    * scanning all of them. */
  def writeSignatureStore(df: DataFrame, idCol: String, textCol: String,
                          path: String, shingleN: Int = 3,
                          k: Int = 128, bands: Int = 32): Unit = {
    val sh = shingleFrame(df, idCol, textCol, shingleN)
    bandedFrame(sh, idCol, "sh", k, bands)
      .repartitionByRange(col("band"), col("key"))
      .sortWithinPartitions(col("band"), col("key"))
      .write.mode("overwrite").parquet(path)
    graft.engine.Graft.invalidate(path)
  }

  /** Append a new batch's banded frame to an existing store — segment
    * append (new files, resident files untouched); the store serves
    * correctly immediately. Callers that also DEDUP the batch against the
    * store should do so BEFORE appending it. */
  def appendSignatureStore(df: DataFrame, idCol: String, textCol: String,
                           path: String, shingleN: Int = 3,
                           k: Int = 128, bands: Int = 32): Unit = {
    val sh = shingleFrame(df, idCol, textCol, shingleN)
    bandedFrame(sh, idCol, "sh", k, bands)
      .repartitionByRange(col("band"), col("key"))
      .sortWithinPartitions(col("band"), col("key"))
      .write.mode("append").parquet(path)
    graft.engine.Graft.invalidate(path)
  }

  /** Near-duplicates of `newDf` against the corpus behind a signature
    * store: band the batch, equi-join the store on (band, key), verify
    * candidates with EXACT jaccard (corpus shingles recomputed only for
    * the candidate ids — an id-keyed join against the corpus table, which
    * exists regardless; the store itself stays signature-compact).
    *
    * Returns (corpus_id, new_id, jac_micros) for pairs at
    * jaccard >= threshold. Within-batch duplicates are [[nearPairs]]'s
    * job — compose both for a full ingest step. Same recall arithmetic as
    * [[nearPairs]] (k=128/bands=32 misses a 0.8-jaccard pair with
    * p ≈ 5e-8).
    */
  def nearDupsAgainstStore(corpusDf: DataFrame, newDf: DataFrame,
                           storePath: String, idCol: String, textCol: String,
                           shingleN: Int = 3, threshold: Double = 0.8,
                           k: Int = 128, bands: Int = 32): DataFrame = {
    val spark = newDf.sparkSession
    val newSh = shingleFrame(newDf, idCol, textCol, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one materializing job fills BOTH caches (banded reads newSh)
    val newBanded = materialized(bandedFrame(newSh, idCol, "sh", k, bands))
    val store = graft.engine.Graft.cachedRead(spark, storePath)
    // persisted: cands feeds BOTH the candidate-id fetch and the final
    // verify join — unpersisted, the store join would run twice
    val cands = materialized(store.as("s").join(newBanded.as("n"),
        col("s.band") === col("n.band") && col("s.key") === col("n.key"))
      .select(col("s.mid").as("a"), col("n.mid").as("b")).distinct())
    // corpus shingles for candidate rows ONLY (inner join on unique ids =
    // the semi-join, but keeps the text column for the kernel)
    val corpusSh = shingleFrame(
      corpusDf.select(col(idCol), col(textCol))
        .join(cands.select(col("a").as(idCol)).distinct(), Seq(idCol)),
      idCol, textCol, shingleN)
      .select(col(idCol).as("a"), col("sh").as("sa"))
    val sb = newSh.select(col(idCol).as("b"), col("sh").as("sb"))
    val jac = size(array_intersect(col("sa"), col("sb"))).cast("double") /
      size(array_union(col("sa"), col("sb")))
    eagerly(cands.join(corpusSh, "a").join(sb, "b")
      .withColumn("jac", jac)
      .filter(col("jac") >= threshold)
      .select(col("a").as("corpus_id"), col("b").as("new_id"),
        floor(col("jac") * 1000000).cast("long").as("jac_micros")),
      newSh, newBanded, cands)
  }

  /** DEDUP CLUSTERS — connected components over a near-dup pair set: the
    * keep-one-per-GROUP step of a production dedup pass (pairs chain:
    * A≈B, B≈C puts A,B,C in one cluster even when the A≈C pair was never
    * emitted; the usual keep rule is then min-id per cluster).
    *
    * Min-label propagation, each round one equi-join + one min-aggregate:
    * every node adopts the smallest label among itself and its neighbors;
    * converges in O(component diameter) rounds. Near-dup components are
    * shallow by nature (stars and short chains around a template), so at
    * 100 TB this is a handful of shuffles over the PAIR set — which is
    * orders of magnitude smaller than the corpus. Each round's frame is
    * persisted and the previous freed; convergence is detected by an
    * any-change probe (`limit(1)` — never a full count of a big diff).
    *
    * Returns one row per node that appears in `pairs`:
    * (`idOut`, `clusterOut`) where cluster = min node id of the component.
    * Nodes in no pair are their own singleton clusters — callers keep them
    * unconditionally, so they are not emitted here. */
  /** Pair-count ceiling for the driver union-find fast path of
    * [[clusters]]: below it the whole pair set is ~MBs and exact
    * union-find on the driver replaces O(diameter) tiny Spark jobs with
    * one collect (the same bounded-collect-with-distributed-fallback
    * contract the ANN side's GraphCandidates uses). Var as a test seam —
    * DedupSpec forces the distributed path and pins both paths equal. */
  @volatile private[pipeline] var clusterDriverCap: Long = 100000L

  def clusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
               idOut: String = "doc_id", clusterOut: String = "cluster_id",
               maxIters: Int = 50): DataFrame = {
    // Null-id edges (a failed cast of a bad aCol/bCol value) are dropped
    // up front: the driver path's non-nullable Long encoder would NPE at
    // collect where the distributed path silently degrades — both paths
    // must see the same edge set.
    val e0 = pairs.select(col(aCol).cast("long").as("s"),
        col(bCol).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
    // Fast path: if the pair set is small (checked against the cap with a
    // bounded probe, never a full count of a huge set), collect it and run
    // exact union-find on the driver — near-dup pair sets are usually tiny
    // next to the corpus, and the iterative path costs one Spark job per
    // propagation round. Oversized pair sets take the distributed loop.
    val cap = clusterDriverCap
    // ONE job decides AND delivers: collect up to cap+1 rows — if the
    // extra row shows up, the set is over the cap and the distributed
    // path runs (a separate count-probe would re-run the upstream LSH
    // lineage a second time for the collect, review r12-3)
    val es = if (cap > 0)
      e0.limit(math.min(cap, Int.MaxValue - 1L).toInt + 1)
        .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)).collect()
    else Array.empty[(Long, Long)]
    if (cap > 0 && es.length <= cap) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by smaller root: cluster id = min node id
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = parent.keys.toSeq.map(id => (id, find(id)))
      val spark = pairs.sparkSession
      import spark.implicits._
      return rows.toDF(idOut, clusterOut)
    }
    val edges = materialized(
      e0.unionByName(e0.select(col("d").as("s"), col("s").as("d"))).distinct())
    // init = the first propagation round fused into one aggregate
    // (lbl = min(id, min neighbor)): star and pair components — the bulk
    // of a near-dup graph — are already at their fixpoint here, so the
    // loop usually runs exactly one verification round
    var labels = materialized(edges.groupBy(col("s"))
      .agg(least(col("s"), min(col("d"))).as("lbl"))
      .select(col("s").as("id"), col("lbl")))
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val prop = edges.join(labels, edges("d") === labels("id"))
        .select(edges("s").as("id"), col("lbl"))
      val next = materialized(labels.select(col("id"), col("lbl"))
        .unionByName(prop)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl")))
      converged = labels.as("o").join(next.as("n"), "id")
        .filter(col("o.lbl") =!= col("n.lbl")).limit(1).count() == 0
      labels.unpersist(false)
      labels = next
      it += 1
    }
    require(converged,
      s"label propagation did not converge in $maxIters rounds — component " +
        "diameter exceeds the bound (raise maxIters)")
    eagerly(labels.select(col("id").as(idOut), col("lbl").as(clusterOut)),
      labels, edges)
  }

  /** 64-bit SimHash over a shingle set: bit j is the sign of the sum over
    * shingles of ±1 depending on bit j of xxhash64(shingle). Single pass:
    * an array-of-counters accumulator zipped per shingle. */
  // 2^j for j in 0..63 as a literal array (shiftleft/shiftright take only
  // Int amounts, not Columns — bit masks keep the shift amount data-driven).
  private val pow2: Column = typedLit((0 until 64).map(j => 1L << j).toArray)

  def simhash64(shingles: Column): Column = {
    // Hash each shingle once; all 64 bit tests run on the same long value
    // (same fingerprints as re-hashing per bit, 64x cheaper).
    val hashes = transform(shingles, s => xxhash64(s))
    val counters = aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(64)), j =>
          when(h.bitwiseAND(element_at(pow2, j)) =!= 0, 1).otherwise(-1)),
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
  /** Scala twin of [[simhash64]] — identical fingerprints (same xxhash64
    * values, same sign rule), JIT'd loop speed; used by the pair pipeline.
    * DedupSpec asserts the two stay bit-equal. */
  def simhash64Scala(sh: Seq[String]): Long = {
    val counters = new Array[Int](64)
    sh.foreach { s =>
      val h = shingleHash(s)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counters(j) >= 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Pairs (a < b) within `maxHamming` of each other over a fingerprint
    * frame (sid, fp), blocked by the pigeonhole chunk join: with more chunks
    * than maxHamming, any qualifying pair shares at least one identical
    * chunk — deterministic completeness, unlike probabilistic LSH. Chunk
    * key = fp masked to the chunk's bits (position-shifted values are
    * unnecessary: the join also matches on the chunk index). */
  private def hammingPairs(withFp: DataFrame, masks: Seq[Long],
                           maxHamming: Int): DataFrame = {
    require(masks.size > maxHamming, "pigeonhole needs chunks > maxHamming")
    // Persist the fingerprint frame across the self-join: the simhash
    // kernel (k·|shingles| hashes per doc) otherwise runs once per side
    // (VERDICT r4 #4). Eager materialization lets us free it here.
    val fp = materialized(withFp)
    val chunkMasks = typedLit(masks.toArray)
    val chunked = fp.select(col("sid"), col("fp"),
        posexplode(transform(sequence(lit(1), lit(masks.size)), c =>
          col("fp").bitwiseAND(element_at(chunkMasks, c))))
          .as(Seq("chunk", "ckey")))
    val l = chunked.as("l")
    val r = chunked.as("r")
    eagerly(
      l.join(r,
          col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey")
          && col("l.sid") < col("r.sid"))
        .select(col("l.sid").as("a"), col("r.sid").as("b"),
          bit_count(col("l.fp").bitwiseXOR(col("r.fp"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= maxHamming),
      fp)
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, maxHamming: Int = 3): DataFrame = {
    import df.sparkSession.implicits._
    val withFp = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("sid"), col(textCol))
      .filter(col("sid").isNotNull) // null id would crash the encoder
      .as[(Long, String)]
      // a sub-shingleN doc has NO shingles; the majority-vote tie rule
      // would give every such doc the identical all-ones fingerprint and
      // pair them all as hamming-0 duplicates (review r18-4) — rows with
      // empty shingle sets never pair, the bandedFrame contract
      .flatMap { case (id, t) =>
        val sh = shinglesScala(t, shingleN)
        if (sh.isEmpty) None else Some((id, simhash64Scala(sh)))
      }
      .toDF("sid", "fp")
    hammingPairs(withFp, (0 until 4).map(c => 0xFFFFL << (c * 16)), maxHamming)
  }

  /** 30-bit SimHash over the ORACLE-EXPRESSIBLE rolling-hash family
    * (TextFunctions.fingerprintScala per shingle — values < 1e9+7 < 2^30):
    * same majority-vote rule as [[simhash64Scala]] (tie → bit set). This
    * variant exists so the corpus simhash query has an exact DuckDB oracle
    * (xxhash64 is not expressible there; the rolling hash is, via
    * list_reduce — the convention q_text_fingerprint already pins). */
  def simhash30Scala(sh: Seq[String]): Long = {
    val counters = new Array[Int](30)
    sh.foreach { s =>
      val h = TextFunctions.fingerprintScala(s)
      var j = 0
      while (j < 30) {
        if (((h >>> j) & 1L) != 0L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 30) { if (counters(j) >= 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** [[simhashPairs]] on the 30-bit rolling-hash fingerprints; 4 chunks
    * (8+8+8+6 bits) keep the pigeonhole guarantee for maxHamming <= 3. */
  def simhashPairsRolling(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, maxHamming: Int = 3): DataFrame = {
    import df.sparkSession.implicits._
    val withFp = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long").as("sid"), col(textCol))
      .filter(col("sid").isNotNull) // null id would crash the encoder
      .as[(Long, String)]
      // empty shingle sets never pair (see simhashPairs)
      .flatMap { case (id, t) =>
        val sh = shinglesScala(t, shingleN)
        if (sh.isEmpty) None else Some((id, simhash30Scala(sh)))
      }
      .toDF("sid", "fp")
    hammingPairs(withFp,
      Seq(0xFFL, 0xFF00L, 0xFF0000L, 0x3F000000L), maxHamming)
  }

  /** Embedding-cosine near-dup pairs, exact: inequality self-join + codegen
    * cosine + threshold. O(n²) by nature — correct at verification scale;
    * the scale path blocks candidates first (see [[embedCandidates]] +
    * DedupSpec's clustered-recall test) and verifies with the same cosine.
    */
  def cosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double,
                       broadcastInner: Boolean = false): DataFrame = {
    // CALLER NOTE (r21): the inequality join plans as a nested-loop /
    // cartesian whose inner side re-evaluates its lineage PER
    // PARTITION-PAIR. A caller handing in an expensive chain must cut it
    // first (q_pipeline_v4 checkpoints its BPE+transformer frame — the
    // r21 probe measured ~32 re-runs of the forward, 49 s of task time,
    // without the cut); a plain table scan re-reads cheaply and needs
    // nothing. The operator itself stays lazy: its plan (and the
    // dispatcher's branch choice) is part of the spec surface.
    // The streamed side of the nested-loop join sets the parallelism.
    //
    // `broadcastInner` (r22): a checkpoint-backed input reports NO size
    // stats, so Catalyst plans the raw CartesianProduct — streamed-parts ×
    // inner-parts tasks, each re-fetching the inner side's blocks (the v4
    // probe measured 224 such tasks for a corpus that fits in one
    // broadcast). A caller that KNOWS the corpus is broadcast-small (the
    // dispatcher checks n·rowWidth against a 64 MB cap) flips the plan to
    // BroadcastNestedLoopJoin: one fetch of the inner side, one task per
    // streamed partition. Same join, same rows — plans over stats-known
    // inputs already made this choice automatically.
    val a = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("a"), col(vecCol).as("va"))
    val b0 = df.select(col(idCol).as("b"), col(vecCol).as("vb"))
    val b = if (broadcastInner) broadcast(b0) else b0
    a.join(b, col("a") < col("b"))
      .withColumn("cos", graft.vector.distances.cosineSim(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"),
        floor(col("cos") * 1000000).cast("long").as("cos_micros"))
  }

  /** Embedding-cosine near-dup pairs via hyperplane-LSH blocking + exact
    * cosine verify — the 100 TB path. Candidates come from the banded
    * (band, key) equi-self-join ([[embedCandidates]], never all-pairs);
    * each candidate is verified with the SAME codegen cosine and emitted
    * in the SAME (a, b, cos_micros) contract as [[cosinePairsExact]], so
    * the two agree exactly whenever blocking catches every pair at the
    * threshold (per-pair catch prob 1-(1-p^r)^bands with
    * p = 1 - acos(cos)/π; at r=12, bands=16 — the q_dedup_embed_lsh gate
    * configuration — a cos-0.996 pair is missed with prob ~3e-9, and the
    * gate pins equality against the exact-join oracle on a
    * threshold-gapped fixture). */
  def cosinePairsBlocked(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double,
                         planes: Int = 128, bands: Int = 16,
                         seed: Long = 42L): DataFrame = {
    // ONE materialized (id, vec) projection feeds the banding pass AND
    // both verify-join sides — without it the caller's lineage (often an
    // expensive strip/embed chain) re-runs three times per call, the
    // exact shape the nearPairs persist fixed (VERDICT r4 #4 /
    // review r18-4)
    val proj = materialized(df.select(col(idCol), col(vecCol)))
    val cands = embedCandidates(proj, idCol, vecCol, dim, planes, bands, seed)
    val va = proj.select(col(idCol).as("a"), col(vecCol).as("va"))
    val vb = proj.select(col(idCol).as("b"), col(vecCol).as("vb"))
    eagerly(
      cands.join(va, "a").join(vb, "b")
        .withColumn("cos",
          graft.vector.distances.cosineSim(col("va"), col("vb")))
        .filter(col("cos") >= threshold)
        .select(col("a"), col("b"),
          floor(col("cos") * 1000000).cast("long").as("cos_micros")),
      proj)
  }

  /** Metadata-only row estimate for dispatch decisions: the optimizer's
    * row count when known, else plan sizeInBytes over the schema's default
    * row width (a parquet scan's sizeInBytes is footer metadata — no job
    * runs). Returns None when the plan carries NO real stats — stats-less
    * leaves (LogicalRDD, JDBC relations) report the
    * `spark.sql.defaultSizeInBytes` sentinel (Long.MaxValue), and treating
    * that as 10¹⁷ rows would push [[cosinePairs]] toward the O(n²) exact
    * join at exactly the scale the floor exists to protect (review r15).
    * Order-of-magnitude accuracy is enough for a log₂ dispatch rule; scale
    * callers with a catalog should pass [[graft.stats.Stats.rowCount]]
    * explicitly instead. */
  private[pipeline] def estimatedRows(df: DataFrame,
                                      widthHint: Long = -1L): Option[Long] = {
    val st = df.queryExecution.optimizedPlan.stats
    st.rowCount match {
      case Some(rc) =>
        Some(if (rc > BigInt(Long.MaxValue)) Long.MaxValue
             else math.max(1L, rc.toLong))
      case None if st.sizeInBytes >= BigInt(1L << 50) =>
        // the unknown-stats sentinel, OR any scaled product of it: a
        // Project above a stats-less leaf multiplies Long.MaxValue by its
        // width ratio, so a fixed MaxValue/4 cut was defeated by any
        // >=4x column pruning (r19 review). 2^50 bytes = 1 PiB per
        // DataFrame — beyond it the estimate is an artifact, and the
        // dispatcher's conservative blocked branch is the right answer.
        None
      case None =>
        // defaultSize counts an ARRAY column as ONE element (4 bytes for
        // array<float>) — dividing by that inflates the row estimate
        // 10-1000x for embedding frames, and an over-estimate raises the
        // dispatch floor toward the O(n²) exact branch it exists to
        // avoid (review r18-4). Callers that know the real row width
        // (cosinePairs knows dim) pass it via `widthHint`.
        val width =
          if (widthHint > 0) widthHint
          else math.max(8L, df.schema.map(_.dataType.defaultSize.toLong).sum)
        Some(math.max(1L, (st.sizeInBytes / width).toLong))
    }
  }

  private def ceilLog2(n: Long): Int =
    if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** LSH banding parameters (bitsPerBand, bands) sized for the corpus and
    * the threshold (ADVICE r14: fixed r=8 buys only a ~2⁸/bands ≈ 32×
    * constant factor on isotropic corpora — unrelated vectors collide per
    * band with prob 2^-r, so candidate volume is Θ(n²·bands/2^r); keeping
    * it sub-quadratic needs r ≳ log₂(n)). Recall is then restored by
    * widening the OR: a true pair at the threshold agrees per bit with
    * prob p = 1-acos(t)/π, survives a band with p^r, and is missed with
    * (1-p^r)^bands ≤ targetMiss for the returned band count. The price is
    * honest — planes = r·bands sign projections per row, and it grows
    * fast as the threshold drops (0.99 → 1.4k planes at 10⁹ rows; 0.95 →
    * ~10k; below ~0.9 sign-LSH stops being the right tool at corpus
    * scale). The derivation FAILS LOUDLY past `MaxPlanes` instead of
    * silently broadcasting a multi-GB hyperplane matrix or overflowing
    * r·bands (review r15): raise the threshold, accept a looser
    * targetMiss, or pass explicit planes/bands. r is capped at 40
    * (n ≈ 10¹²) where band keys still pack into one long with headroom. */
  val MaxPlanes: Int = 1 << 16

  def lshParams(threshold: Double, estRows: Long,
                targetMiss: Double = 1e-6): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"cosine LSH threshold must be in (0,1): $threshold")
    require(targetMiss > 0.0 && targetMiss < 1.0)
    val r = math.min(40, math.max(8, ceilLog2(estRows)))
    val p = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
    val pr = math.pow(p, r)
    val bandsD = math.max(8.0,
      math.ceil(math.log(targetMiss) / math.log1p(-pr)))
    require(bandsD * r <= MaxPlanes,
      f"lshParams: threshold=$threshold at ~$estRows rows needs " +
        f"${bandsD * r}%.0f sign planes (> $MaxPlanes) to hold " +
        f"miss<=$targetMiss — sign-LSH is not economical here; raise the " +
        "threshold, loosen targetMiss, or pass explicit planes/bands")
    (r, bandsD.toInt)
  }

  /** Embedding-cosine near-dup pairs, SCALE-AWARE (r14 VERDICT #4): picks
    * the exact join or hyperplane-LSH blocking by dimensionality AGAINST
    * THE CORPUS SIZE, and sizes the banding for it. Sign-bucket blocking
    * prunes only when the space can discriminate — it needs
    * dim ≫ log₂(n); in a too-small space the corpus collapses into a
    * handful of sign patterns and banding degenerates to all-pairs WITH
    * banding overhead (measured r14: the dim-4 flagship embedding column
    * ran 13× SLOWER blocked than exact at sf0.1 — giant buckets, 32M
    * candidate pairs). The automatic floor is max(16, 2·⌈log₂(n)⌉) with n
    * from the metadata-only [[estimatedRows]] (at 10⁹ rows a 32-dim
    * column dispatches exact — its ~2³² sign patterns cannot spread 10⁹
    * vectors into discriminating r≈30-bit band keys); when the plan
    * carries NO real stats the floor falls back to the static 16 and
    * banding sizes for a 2²⁰-row corpus — uncertainty never picks the
    * O(n²) branch. Pass `minDim` (and
    * `estRows`, e.g. [[graft.stats.Stats.rowCount]]) to override. When
    * `planes`/`bands` are left unset the blocked path sizes them via
    * [[lshParams]] — bits-per-band tracks log₂(n) so candidates stay
    * sub-quadratic, and the band count restores ≤1e-6 per-pair miss
    * probability at the threshold. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                  threshold: Double, minDim: Int = -1,
                  planes: Int = -1, bands: Int = -1,
                  seed: Long = 42L,
                  estRows: Option[Long] = None): DataFrame = {
    require((planes >= 1) == (bands >= 1),
      s"cosinePairs: planes and bands must be overridden TOGETHER " +
        s"(got planes=$planes, bands=$bands) — a half override would be " +
        "silently auto-sized away")
    // UNKNOWN stats (None): dispatch like the pre-r15 static floor —
    // blocked for any real embedding width. The failure modes are
    // asymmetric: blocked on a tiny corpus is merely slower (banding
    // overhead), exact on a big one is O(n²) — so uncertainty must never
    // pick exact (review r15).
    // 16 B id+overhead, 4 B per float32 element — the vec column
    // dominates; the schema-default width would under-count it ~dim-fold
    val n = estRows.orElse(estimatedRows(df, widthHint = 16L + 4L * dim))
    val floor =
      if (minDim >= 0) minDim
      else n.map(r => math.max(16, 2 * ceilLog2(r))).getOrElse(16)
    if (dim < floor)
      // broadcast the inner side when the corpus provably fits (64 MB at
      // 16 B overhead + 4 B/float element) — see the cosinePairsExact note
      cosinePairsExact(df, idCol, vecCol, threshold,
        broadcastInner = n.exists(r => r * (16L + 4L * dim) <= (64L << 20)))
    else {
      val (pl, bd) =
        if (planes >= 1) (planes, bands)
        else {
          val (r, b) = lshParams(threshold, n.getOrElse(1L << 20))
          (r * b, b)
        }
      cosinePairsBlocked(df, idCol, vecCol, dim, threshold, pl, bd, seed)
    }
  }

  /** Random-hyperplane band keys for embedding LSH — the compute-bound
    * kernel of the blocked path (`planes` dot products per row), JIT'd
    * like [[bandKeysScala]] (r14 VERDICT #2: as an expression tree this
    * stage ran `planes` interpreted per-plane subtrees per row and built
    * band keys as concatenated bit STRINGS — it dominated
    * q_dedup_embed_lsh's wall clock). Each band's r sign bits pack into
    * one LONG (the band column disambiguates bands, so the raw bit-pack
    * IS the join key — no re-hash needed). P(bit agrees) = 1 - angle/π,
    * so bands of r bits catch a pair at cosine c with prob
    * 1-(1-(1-acos(c)/π)^r)^bands. Hyperplanes are seeded/deterministic —
    * same distribution as the pre-r15 expression form; the q_dedup_* gate
    * oracle is the exact cross join, which is banding-agnostic. */
  private[pipeline] def embedBandKeysScala(vec: Array[Float],
                                           hp: Array[Array[Float]],
                                           bands: Int): Array[Long] = {
    val r = hp.length / bands
    val out = new Array[Long](bands)
    var b = 0
    var pIdx = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < r) {
        val h = hp(pIdx)
        var dot = 0.0
        var i = 0
        while (i < h.length) { dot += h(i).toDouble * vec(i); i += 1 }
        key = (key << 1) | (if (dot >= 0) 1L else 0L)
        pIdx += 1; j += 1
      }
      out(b) = key
      b += 1
    }
    out
  }

  private def hyperplanes(dim: Int, planes: Int,
                          seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  // ------------------------------------------------------------------
  // Cross-document repeated-SPAN removal (the RefinedWeb/CCNet "line
  // dedup" analog, word-window form since the corpus has no newlines):
  // flag every n-token window whose gram occurs in >= minDocs DISTINCT
  // documents, then score (covered-token ratio) or strip (rebuild the
  // text without covered tokens). Doc-level dedup keeps one copy of a
  // whole duplicate; this removes the boilerplate fragments (headers,
  // nav bars, license blurbs) that repeat across otherwise-distinct
  // pages — the complementary curation pass.
  //
  // 100 TB shape: explode n-grams (narrow) -> ONE hash aggregate on
  // xxhash64(gram) 8-byte keys for doc frequency -> equi-join the flag
  // set back on the same key (co-partitioned with the aggregate's
  // shuffle) -> per-doc interval union via distinct token positions ->
  // rebuild with each token crossing the wire once. Never all-pairs;
  // every stage is linear in corpus tokens.
  // ------------------------------------------------------------------

  /** Positional word n-grams: one row per window start — (mid, pos, gram),
    * pos 0-based over the whitespace token array (posexplode order ==
    * window order since allNgrams preserves it). Docs shorter than n
    * tokens yield no rows. */
  def positionalNgrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).cast("long").as("mid"),
      posexplode(TextFunctions.allNgrams(col(textCol), n))
        .as(Seq("pos", "gram")))

  /** Hash-only positional n-grams — (mid, pos, gram_hash) with
    * gram_hash = xxhash64(gram) computed INSIDE the gram kernel (r21):
    * every consumer in this file groups or joins on the hash, never the
    * string, so carrying the gram text to a shuffle/cache only to hash it
    * there was pure width. TextKernelsSpec pins the kernel hash equal to
    * xxhash64 over the gram strings. */
  private def positionalGramHashes(df: DataFrame, idCol: String,
                                   textCol: String, n: Int): DataFrame =
    df.select(col(idCol).cast("long").as("mid"),
      posexplode(textKernels.allNgramHashes(col(textCol), n))
        .as(Seq("pos", "gram_hash")))

  /** Gram doc-frequency filter: xxhash64 keys of grams that occur in at
    * least `minDocs` DISTINCT documents. Grouping on the 8-byte hash (not
    * the gram string) keeps the shuffle narrow — same 2^-64 collision bet
    * as [[exactKeepers]]; the oracle groups by the string and agrees. */
  def boilerplateGrams(grams: DataFrame, minDocs: Int): DataFrame =
    grams.groupBy(xxhash64(col("gram")).as("gram_hash"))
      .agg(countDistinct(col("mid")).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** [[boilerplateGrams]] over the hash-only gram frame. */
  private def boilerplateGramsHashed(gramHashes: DataFrame,
                                     minDocs: Int): DataFrame =
    gramHashes.groupBy(col("gram_hash"))
      .agg(countDistinct(col("mid")).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Flagged window starts per doc: one (mid, pos) row per window whose
    * gram occurs in >= minDocs docs. The join back to the flag set is an
    * equi-join on gram_hash — co-partitioned with the doc-frequency
    * aggregate. */
  private def coveredPositions(gramHashes: DataFrame, minDocs: Int): DataFrame =
    coveredFrom(gramHashes, boilerplateGramsHashed(gramHashes, minDocs))

  /** Shared flagged-(mid, pos) START derivation (ONE definition for the
    * corpus and store paths — review r18-4). Input is the hash-only gram
    * frame. r22 (guide §2.3/§2.4): the starts are already UNIQUE per
    * (mid, pos) — the flag set is an aggregate, so the join cannot
    * duplicate — and every consumer only needs the per-doc covered SET,
    * so the old explode(sequence(pos, pos+n-1)) + distinct (two extra
    * exchanges, ~n× the rows) is folded into the downstream per-doc
    * aggregate: shuffle the starts, expand row-locally in a JIT'd kernel
    * ([[TextKernels.coveredLen]] / [[TextKernels.stripTokensStarts]]). */
  private def coveredFrom(gramHashes: DataFrame, flags: DataFrame): DataFrame =
    gramHashes.join(flags, "gram_hash")
      .select(col("mid"), col("pos"))

  /** Shared tail of the coverage scorers: aggregate the flagged starts to
    * a per-doc interval-union length and emit the ratio row for EVERY
    * input doc. */
  private def coverageFrom(df: DataFrame, idCol: String, textCol: String,
                           starts: DataFrame, n: Int): DataFrame = {
    val perDoc = starts.groupBy("mid")
      .agg(textKernels.coveredLen(sort_array(collect_list(col("pos"))), n)
        .as("covered_tokens"))
    val totals = df.select(col(idCol).cast("long").as("mid"),
      TextFunctions.tokenCount(col(textCol)).as("total_tokens"))
    totals.join(perDoc, Seq("mid"), "left")
      .select(col("mid").as(idCol),
        col("total_tokens").cast("long").as("total_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("total_tokens") === 0, lit(0L))
          .otherwise(floor(coalesce(col("covered_tokens"), lit(0L))
            .cast("double") / col("total_tokens") * 1000000)
            .cast("long")).as("covered_micros"))
  }

  /** Shared tail of the strip operators: drop covered positions and
    * rebuild each doc's text. r21 shape (guide §2.3 "shuffle keys and
    * metadata instead of payloads"): the covered positions aggregate to
    * ONE sorted int array per flagged doc (the compact set — tiny next to
    * the corpus), join the docs by id, and a JIT'd kernel walks tokens
    * against the sorted positions per row. The previous form posexploded
    * EVERY token of EVERY doc through an anti-join and a sorted-collect
    * aggregate — two full-corpus-token shuffles to rebuild strings the
    * kernel now never takes apart row-locally. Results are identical
    * (DedupSpec's randomized brute-force twin pins exact clean_text
    * strings); the null-id row keeps its ("", 0) emission — the
    * equality-join artifact the old tail had. */
  private def stripFrom(df: DataFrame, idCol: String, textCol: String,
                        starts: DataFrame, n: Int): DataFrame = {
    val covArr = starts.groupBy(col("mid"))
      .agg(sort_array(collect_list(col("pos"))).as("__cov"))
    val stripped = textKernels.stripTokensStarts(
      coalesce(col("__t"), lit("")),
      coalesce(col("__cov"), lit(Array.empty[Int]).cast("array<int>")), n)
    df.select(col(idCol).cast("long").as("mid"), col(textCol).as("__t"))
      .join(covArr, Seq("mid"), "left")
      .withColumn("__s",
        when(col("mid").isNull,
          struct(lit("").as("clean_text"), lit(0L).as("kept_tokens")))
          .otherwise(stripped))
      .select(col("mid").as(idCol),
        col("__s.clean_text").as("clean_text"),
        col("__s.kept_tokens").as("kept_tokens"))
  }

  /** Per-document cross-corpus duplicate-span coverage: how much of each
    * doc is tokens inside windows repeated across >= minDocs docs.
    * Returns (id, total_tokens, covered_tokens, covered_micros) for EVERY
    * input doc (uncovered and sub-n docs score 0). Exact integer counts +
    * one floored IEEE division — engine-stable. */
  def spanCoverage(df: DataFrame, idCol: String, textCol: String,
                   n: Int, minDocs: Int = 2): DataFrame = {
    // ONE lazy plan (r21): the gram stage is the JIT'd hash kernel now, so
    // recomputing it once per consumer (the doc-frequency aggregate and
    // the covered join read it independently) is cheaper than the
    // persist+count+checkpoint job chain that used to free it — guide §5:
    // cache only when recompute costs more than the memory pressure. At
    // corpus scale this trades a second columnar text scan for not
    // holding a corpus-token-sized (mid, pos, hash) frame in executor
    // storage.
    coverageFrom(df, idCol, textCol,
      coveredPositions(positionalGramHashes(df, idCol, textCol, n),
        minDocs), n)
  }

  /** Strip the covered spans: rebuild each doc's text from the tokens NOT
    * inside any flagged window. Returns (id, clean_text, kept_tokens) for
    * every input doc (fully-covered docs keep "" / 0; sub-n and unique
    * docs pass through verbatim, single-space-normalized). The rebuild is
    * the [[graft.pipeline.Pack]] argument: posexplode -> anti-join on
    * (mid, pos) -> one per-doc aggregate over sorted (pos, token) structs
    * — each surviving token crosses the wire once, and the per-group state
    * is bounded by the doc's own length (inherent to emitting a text
    * column). */
  def stripSpans(df: DataFrame, idCol: String, textCol: String,
                 n: Int, minDocs: Int = 2): DataFrame =
    // Same one-lazy-plan shape as [[spanCoverage]].
    stripFrom(df, idCol, textCol,
      coveredPositions(positionalGramHashes(df, idCol, textCol, n),
        minDocs), n)

  // ---- Incremental span dedup: the gram doc-frequency STORE ----
  // The crawl-ingest flow: the corpus's gram frequencies persist once as
  // a compact (gram_hash, doc_freq) table; each incoming batch scores /
  // strips against the STORE without rescanning the corpus. Batch docs do
  // NOT contribute to the frequencies (store-only flags — the ingest
  // semantics: "is this span corpus boilerplate?"); fold a batch in with
  // [[appendGramStore]] AFTER scoring it.

  /** Write the corpus gram doc-frequency store: one row per distinct
    * gram — (gram_hash, doc_freq), range-partitioned + sorted by
    * gram_hash. All frequencies are kept (minDocs applies at probe time,
    * so one store serves any threshold); the store is 16 bytes per
    * distinct gram, corpus text never persists. */
  def writeGramStore(df: DataFrame, idCol: String, textCol: String,
                     path: String, n: Int): Unit = {
    boilerplateGramsHashed(positionalGramHashes(df, idCol, textCol, n),
        minDocs = 1)
      .repartitionByRange(col("gram_hash"))
      .sortWithinPartitions(col("gram_hash"))
      .write.mode("overwrite").parquet(path)
    graft.engine.Graft.invalidate(path)
  }

  /** Segment-append a new batch's gram frequencies (new files only;
    * resident files untouched — the store serves correctly immediately).
    * Readers SUM doc_freq per gram_hash across segments, so a gram seen
    * by both the corpus and the batch counts both contributions. */
  def appendGramStore(df: DataFrame, idCol: String, textCol: String,
                      path: String, n: Int): Unit = {
    boilerplateGramsHashed(positionalGramHashes(df, idCol, textCol, n),
        minDocs = 1)
      .repartitionByRange(col("gram_hash"))
      .sortWithinPartitions(col("gram_hash"))
      .write.mode("append").parquet(path)
    graft.engine.Graft.invalidate(path)
  }

  /** The store's flag set at a probe-time threshold: segments re-summed
    * per gram_hash, then filtered. */
  private def storeFlags(spark: org.apache.spark.sql.SparkSession,
                         path: String, minDocs: Int): DataFrame =
    graft.engine.Graft.cachedRead(spark, path)
      .groupBy("gram_hash").agg(sum("doc_freq").as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Flagged window starts of `newDf`'s docs against the STORE's flags (an
    * equi-join on gram_hash — the batch never touches corpus text). */
  private def coveredAgainstStore(gramHashes: DataFrame, path: String,
                                  minDocs: Int): DataFrame =
    coveredFrom(gramHashes,
      storeFlags(gramHashes.sparkSession, path, minDocs))

  /** [[spanCoverage]] of a new batch against a persisted gram store:
    * same output contract, corpus-frequency flags, no corpus rescan.
    * One lazy plan — the batch gram kernel runs once (single consumer:
    * the store join). */
  def spanCoverageAgainstStore(newDf: DataFrame, storePath: String,
                               idCol: String, textCol: String,
                               n: Int, minDocs: Int = 2): DataFrame =
    coverageFrom(newDf, idCol, textCol,
      coveredAgainstStore(positionalGramHashes(newDf, idCol, textCol, n),
        storePath, minDocs), n)

  /** [[stripSpans]] of a new batch against a persisted gram store. */
  def stripSpansAgainstStore(newDf: DataFrame, storePath: String,
                             idCol: String, textCol: String,
                             n: Int, minDocs: Int = 2): DataFrame =
    stripFrom(newDf, idCol, textCol,
      coveredAgainstStore(positionalGramHashes(newDf, idCol, textCol, n),
        storePath, minDocs), n)

  /** Candidate pairs from embedding LSH banding (scale path; recall depends
    * on the cosine gap — verify with [[cosinePairsExact]]'s predicate).
    * The banding stage is the [[embedBandKeysScala]] mapPartitions kernel;
    * the hyperplane matrix (planes×dim floats) ships once per executor as
    * a broadcast, not per task in the closure. */
  def embedCandidates(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      planes: Int = 128, bands: Int = 16,
                      seed: Long = 42L): DataFrame = {
    require(planes % bands == 0, s"planes=$planes not divisible by bands=$bands")
    require(planes / bands <= 64,
      s"bits per band must pack into a long: ${planes / bands} > 64")
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    // fail LOUDLY on a dim/type mismatch at plan time: a dim smaller than
    // the vectors silently bands on a PREFIX (missed candidates the exact
    // verify can't recover); larger crashes per row; array<double>
    // class-casts mid-job (review r18-4)
    df.schema(vecCol).dataType match {
      case ArrayType(FloatType, _) =>
      case other => throw new IllegalArgumentException(
        s"embedCandidates: $vecCol is $other, need array<float>")
    }
    // Peek a NON-NULL row: a leading NULL vector would NPE here with a
    // useless message instead of the loud dim mismatch (ADVICE r18)
    df.select(col(vecCol)).where(col(vecCol).isNotNull)
      .limit(1).collect().headOption.foreach { r =>
        val len = r.getSeq[Float](0).length
        require(len == dim,
          s"embedCandidates: dim=$dim but $vecCol rows are $len-wide — " +
            "banding a prefix would silently miss candidates")
      }
    val hpB = df.sparkSession.sparkContext.broadcast(
      hyperplanes(dim, planes, seed))
    // Row-encoded mapPartitions so the id keeps its ORIGINAL type (string
    // ids band and self-join fine — review r15; a long cast here would
    // also make the dispatcher's two branches disagree on output types).
    val outSchema = StructType(Seq(
      StructField("mid", df.schema(idCol).dataType),
      StructField("band", IntegerType),
      StructField("key", LongType)))
    // Persist across the self-join: the `planes` hyperplane dot products
    // per row otherwise evaluate once per join side.
    val banded = materialized(
      // NULL vectors never band: the exact branch's CosineSimilarity is
      // nullSafeEval (null pairs simply filter out), and the kernel
      // dereferencing a null row would kill the job — behavior must not
      // flip with the dispatch (r19 review)
      df.select(col(idCol).as("mid"), col(vecCol))
        .filter(col(vecCol).isNotNull)
        .mapPartitions { it =>
          val hp = hpB.value
          it.flatMap { r =>
            val id = r.get(0)
            val v = r.getSeq[Float](1).toArray
            embedBandKeysScala(v, hp, bands).iterator.zipWithIndex
              .map { case (key, b) => Row(id, b, key) }
          }
        }(Encoders.row(outSchema)))
    eagerly(bandSelfJoin(banded), banded)
  }
}
