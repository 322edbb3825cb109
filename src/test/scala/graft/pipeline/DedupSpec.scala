package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operators: LSH completeness/candidate economics on controlled
  * data, SimHash semantics, exact dedup survivors. */
class DedupSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("exactKeepers keeps min id per duplicate group") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "bbb"))
      .toDF("id", "text")
    val keep = Dedup.exactKeepers(df, "text", "id").as[Long].collect().toSet
    assert(keep === Set(1L, 2L, 4L))
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    val nearDup = base.replace("lazy", "sleepy")      // high jaccard
    val other = "completely different words about databases and storage engines " * 6
    val df = Seq((1L, base), (2L, nearDup), (3L, other), (4L, base + " extra"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearPairs(df, "doc_id", "text", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearPairs runs the signature kernel exactly once per document") {
    // VERDICT r4 #4: un-persisted lineage re-ran the shingle+minhash stage
    // ~4× (band flatMap self-join + two jaccardVerify sides). The persisted
    // pipeline must invoke the band kernel once per doc — counted via the
    // JVM-wide seam (local mode: executors in-process).
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    val df = Seq((1L, base), (2L, base.replace("lazy", "sleepy")),
      (3L, "completely different words about databases and engines " * 6),
      (4L, base + " extra")).toDF("doc_id", "text")
    Dedup.instrumented = true
    try {
      Dedup.bandKernelInvocations.set(0L)
      val n = Dedup.nearPairs(df, "doc_id", "text", threshold = 0.5).count()
      assert(n >= 3)
      assert(Dedup.bandKernelInvocations.get() === 4L,
        s"kernel ran ${Dedup.bandKernelInvocations.get()} times for 4 docs")
    } finally Dedup.instrumented = false
  }

  test("clusters: min-label components over chained pairs, multi-round convergence") {
    // components: a 5-long chain (diameter forces several propagation
    // rounds), a triangle with one edge missing, and a pair
    val pairs = Seq(
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L), // chain → 30
      (1L, 5L), (5L, 9L),                             // open triangle → 1
      (20L, 21L))                                     // pair → 20
      .toDF("a", "b")
    val got = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L,
      1L -> 1L, 5L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L))
    // keep rule: one survivor per component = the cluster label itself
    assert(got.values.toSet === Set(30L, 1L, 20L))
    // the distributed label-propagation path (pair sets over the driver
    // cap) produces the identical clustering — forced via the test seam,
    // also on a randomized pair soup
    val rnd = new scala.util.Random(29)
    val noisy = (0 until 400).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    val fast = Dedup.clusters(noisy).as[(Long, Long)].collect().toMap
    Dedup.clusterDriverCap = 0L
    try {
      val dist = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
      assert(dist === got)
      val distNoisy = Dedup.clusters(noisy).as[(Long, Long)].collect().toMap
      assert(distNoisy === fast)
    } finally Dedup.clusterDriverCap = 100000L
    // null ids (a failed cast of a bad id value) are dropped on BOTH
    // paths — the driver path's non-nullable encoder must never see them
    val withNulls = Seq((Some(30L), Some(31L)), (None, Some(9L)),
      (Some(20L), None), (Some(20L), Some(21L))).toDF("a", "b")
    val gotN = Dedup.clusters(withNulls).as[(Long, Long)].collect().toMap
    assert(gotN === Map(30L -> 30L, 31L -> 30L, 20L -> 20L, 21L -> 20L))
  }

  test("incremental dedup: store probe equals direct cross-set dedup; appends extend the corpus") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    val other = "completely different words about databases and storage engines " * 6
    val third = "yet another body of text on compilers and type systems here " * 6
    val corpus = Seq((1L, base), (2L, other), (3L, third)).toDF("doc_id", "text")
    // batch: 10 dups base, 11 dups other (slightly), 12 unrelated
    val batch = Seq((10L, base.replace("lazy", "sleepy")),
      (11L, other + " extra"), (12L, "nothing like the corpus at all " * 8))
      .toDF("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("graft-sigstore")
      .resolve("st").toString
    Dedup.writeSignatureStore(corpus, "doc_id", "text", store)
    val got = Dedup.nearDupsAgainstStore(corpus, batch, store, "doc_id",
        "text", threshold = 0.5)
      .select($"corpus_id", $"new_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 11L)))
    // segment append: the batch joins the resident corpus; a later batch
    // duplicating a FIRST-batch doc is caught through the store
    Dedup.appendSignatureStore(batch, "doc_id", "text", store)
    val corpus2 = corpus.unionByName(batch)
    // doc 20 is an exact re-crawl of corpus doc 1: pairs with doc 1 at
    // jaccard 1.0 and with batch-1's doc 10 at the same jaccard the
    // (1, 10) assertion above already proved detectable (identical pair
    // of shingle sets → identical banding)
    val batch2 = Seq((20L, base),
      (21L, "still nothing related to anything stored " * 8))
      .toDF("doc_id", "text")
    val got2 = Dedup.nearDupsAgainstStore(corpus2, batch2, store, "doc_id",
        "text", threshold = 0.5)
      .select($"corpus_id", $"new_id").as[(Long, Long)].collect().toSet
    assert(got2 === Set((1L, 20L), (10L, 20L))) // original AND batch-1 doc
  }

  test("simhash: identical texts → hamming 0; near texts close; disjoint texts far") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val b = a.replace("kappa", "lambda")
    val c = "one two three four five six seven eight nine ten " * 4
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("id", "text")
    val fp = df.select(col("id"),
      Dedup.simhash64(TextFunctions.shingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)))
  }

  test("shinglesScala matches the TextFunctions.shingles expression") {
    val texts = Seq("the quick brown fox jumps", "a b", "", "  x  y  z  w  ",
      "dup dup dup dup dup")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val expr = df.select(col("id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    texts.indices.foreach { i =>
      assert(Dedup.shinglesScala(texts(i), 3).toSet === expr(i.toLong).toSet, s"doc $i")
    }
  }

  test("simhash64Scala is bit-equal to the expression simhash64") {
    val texts = Seq("alpha beta gamma delta epsilon zeta",
      "one two three four five six seven", "x y z w v u t s r q p o n m")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val expr = df.select(col("id"),
      Dedup.simhash64(TextFunctions.shingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    val sh3 = df.select(col("id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    texts.indices.foreach { i =>
      assert(Dedup.simhash64Scala(sh3(i.toLong)) === expr(i.toLong), s"doc $i")
    }
  }

  test("simhash pigeonhole pairs include every hamming<=3 pair (exact blocking)") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val df = Seq((1L, a), (2L, a), (3L, a + " tail"), (4L, "x y z w v u t s r q " * 4))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute-force reference over the same fingerprints
    val fp = df.select(col("doc_id"),
      Dedup.simhash64(TextFunctions.shingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect()
    val want = (for {
      (i, fi) <- fp; (j, fj) <- fp
      if i < j && java.lang.Long.bitCount(fi ^ fj) <= 3
    } yield (i, j)).toSet
    assert(got === want)
  }

  test("bandKeysScala is bit-equal to the expression minhashSignature+bandKeys") {
    val texts = Seq("the quick brown fox jumps over the lazy dog and more words",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val k = 16; val bands = 4
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val expr = df.select(col("id"),
      Dedup.bandKeys(
        Dedup.minhashSignature(TextFunctions.shingles(col("text"), 3), k),
        bands, k / bands).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.indices.foreach { i =>
      val sh = Dedup.shinglesScala(texts(i), 3)
      assert(Dedup.bandKeysScala(sh, k, bands).toSeq === expr(i.toLong), s"doc $i")
    }
  }

  test("simhashPairsRolling matches brute force over simhash30Scala fingerprints") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val texts = Seq((1L, a), (2L, a), (3L, a + " tail"),
      (4L, "x y z w v u t s r q " * 4), (5L, "one two"))
    val df = texts.toDF("doc_id", "text")
    val got = Dedup.simhashPairsRolling(df, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val fp = texts.map { case (i, t) =>
      (i, Dedup.simhash30Scala(Dedup.shinglesScala(t, 3)))
    }
    val want = (for {
      (i, fi) <- fp; (j, fj) <- fp
      if i < j && java.lang.Long.bitCount(fi ^ fj) <= 3
    } yield (i, j)).toSet
    assert(got === want)
    // 30-bit range: every fingerprint fits the oracle's BIGINT bit algebra
    fp.foreach { case (_, f) => assert(f >= 0L && f < (1L << 30)) }
  }

  test("embedding LSH blocking: 100% recall on clustered data, far fewer candidates than all-pairs") {
    val rnd = new scala.util.Random(7)
    val dim = 32
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // 20 cluster centers; 3 members each at cosine ~0.98; members of
    // different clusters are near-orthogonal in 32 dims.
    val rows = for {
      c <- 0 until 20
      center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      m <- 0 until 3
    } yield ((c * 3 + m).toLong,
      unit(center.zipWithIndex.map { case (x, i) =>
        x + 0.08f * rnd.nextGaussian().toFloat }))
    val df = rows.toDF("vec_id", "embedding")
    val cands = Dedup.embedCandidates(df, "vec_id", "embedding", dim,
      planes = 128, bands = 16)
    val truth = Dedup.cosinePairsExact(df, "vec_id", "embedding", 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val candSet = cands.as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(candSet),
      s"missed ${truth.diff(candSet).size} of ${truth.size} true pairs")
    val allPairs = rows.size * (rows.size - 1) / 2
    assert(candSet.size < allPairs / 4,
      s"blocking degenerated: ${candSet.size} of $allPairs pairs")

    // the gated blocked operator: candidates + exact-cosine verify equals
    // the exact all-pairs join, row for row (cos_micros included)
    val blocked = Dedup.cosinePairsBlocked(df, "vec_id", "embedding", dim,
        threshold = 0.9)
      .as[(Long, Long, Long)].collect().toSet
    val exact = Dedup.cosinePairsExact(df, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked === exact)
    // the scale-aware dispatcher: identical output on both branches
    // (dim 32 >= minDim routes blocked; forcing minDim above it routes
    // exact — sign buckets cannot discriminate in tiny spaces, r14)
    val viaDispatch = Dedup.cosinePairs(df, "vec_id", "embedding", dim, 0.9)
      .as[(Long, Long, Long)].collect().toSet
    val viaExactBranch = Dedup.cosinePairs(df, "vec_id", "embedding", dim,
        0.9, minDim = dim + 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaDispatch === exact && viaExactBranch === exact)
    // r22: the broadcast-inner exact form (used when the caller proves the
    // corpus broadcast-small — a checkpoint-backed input has no stats for
    // Catalyst to decide itself) returns identical rows and plans as a
    // broadcast nested-loop, not a raw cartesian
    val bcast = Dedup.cosinePairsExact(df, "vec_id", "embedding", 0.9,
      broadcastInner = true)
    assert(bcast.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoop"), "expected a broadcast join")
    assert(bcast.as[(Long, Long, Long)].collect().toSet === exact)
  }

  /** Brute-force twin of the cross-doc span pipeline: n-gram windows,
    * doc-frequency count, covered-position union, strip. */
  private def spanBrute(docs: Seq[(Long, String)], n: Int, minDocs: Int)
      : (Map[Long, Set[Int]], Map[Long, String]) = {
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = docs.flatMap { case (id, t) =>
      val w = toks(t)
      if (w.length < n) Nil
      else w.sliding(n).zipWithIndex.map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val boiler = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs).keySet
    val covered = grams.filter(g => boiler(g._3))
      .groupBy(_._1).map { case (id, gs) =>
        id -> gs.flatMap(g => g._2 until (g._2 + n)).toSet
      }
    val stripped = docs.map { case (id, t) =>
      val w = toks(t)
      val cov = covered.getOrElse(id, Set.empty)
      id -> w.zipWithIndex.collect { case (tok, i) if !cov(i) => tok }.mkString(" ")
    }.toMap
    (covered, stripped)
  }

  test("spanCoverage/stripSpans: planted boilerplate is flagged in every carrier, unique text untouched") {
    val boiler = "subscribe to our newsletter today"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa"),
      (3L, s"lambda mu nu xi omicron pi $boiler"),
      (4L, "rho sigma tau upsilon phi chi psi omega"),
      (5L, "tiny doc"))                                  // < n tokens
    val n = 5; val minDocs = 3
    val df = docs.toDF("doc_id", "text")
    val cov = Dedup.spanCoverage(df, "doc_id", "text", n, minDocs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (bCov, bStrip) = spanBrute(docs, n, minDocs)
    // every doc appears, brute-force agreement on counts and micros
    assert(cov.keySet === docs.map(_._1).toSet)
    docs.foreach { case (id, t) =>
      val total = t.trim.split("\\s+").count(_.nonEmpty).toLong
      val c = bCov.getOrElse(id, Set.empty).size.toLong
      val micros = if (total == 0) 0L else math.floor(c.toDouble / total * 1e6).toLong
      assert(cov(id) === ((total, c, micros)), s"doc $id")
    }
    // the planted 5-gram is exactly the flag: carriers 1-3 covered on those
    // 5 positions only, docs 4-5 at zero
    assert(cov(1L)._2 === 5 && cov(2L)._2 === 5 && cov(3L)._2 === 5)
    assert(cov(4L)._2 === 0 && cov(5L)._2 === 0)
    val strip = Dedup.stripSpans(df, "doc_id", "text", n, minDocs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    docs.foreach { case (id, _) =>
      assert(strip(id)._1 === bStrip(id), s"doc $id strip")
      assert(strip(id)._2 === bStrip(id).split(" ").count(_.nonEmpty).toLong)
    }
    assert(strip(1L)._1 === "alpha beta gamma delta epsilon")
    assert(strip(5L)._1 === "tiny doc")
  }

  test("spanCoverage/stripSpans: randomized brute-force twin, overlapping windows union correctly") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 40L).map { id =>
      id -> Vector.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val n = 3; val minDocs = 2
    val (bCov, bStrip) = spanBrute(docs, n, minDocs)
    val df = docs.toDF("doc_id", "text")
    val cov = Dedup.spanCoverage(df, "doc_id", "text", n, minDocs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    docs.foreach { case (id, _) =>
      assert(cov(id) === bCov.getOrElse(id, Set.empty).size.toLong, s"doc $id cov")
    }
    val strip = Dedup.stripSpans(df, "doc_id", "text", n, minDocs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    docs.foreach { case (id, _) => assert(strip(id) === bStrip(id), s"doc $id") }
    // fully-covered docs come back as "" with the row present
    assert(strip.keySet === docs.map(_._1).toSet)
  }

  test("gram store: batch scores against corpus frequencies only; append folds a batch in") {
    val boiler = "click here to accept cookies"
    val corpus = Seq(
      (1L, s"one two three $boiler four"),
      (2L, s"$boiler five six seven eight"),
      (3L, "nine ten eleven twelve thirteen fourteen"))
    val n = 5; val minDocs = 2
    val store = java.nio.file.Files.createTempDirectory("gramstore").toString
    Dedup.writeGramStore(corpus.toDF("doc_id", "text"), "doc_id", "text",
      store, n)
    val batch = Seq(
      (100L, s"alpha $boiler beta gamma"),            // corpus boilerplate
      (101L, "delta epsilon zeta eta theta"),         // clean
      (102L, "shared only inside this very batch"),   // batch-only span...
      (103L, "shared only inside this very batch"))   // ...must NOT flag
    val cov = Dedup.spanCoverageAgainstStore(batch.toDF("doc_id", "text"),
        store, "doc_id", "text", n, minDocs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(cov(100L) === 5 && cov(101L) === 0)
    // store-only semantics: batch docs do not contribute frequencies
    assert(cov(102L) === 0 && cov(103L) === 0)
    val strip = Dedup.stripSpansAgainstStore(batch.toDF("doc_id", "text"),
        store, "doc_id", "text", n, minDocs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(strip(100L) === "alpha beta gamma")
    assert(strip(102L) === "shared only inside this very batch")
    // append: fold a batch in — a span at corpus freq 1 crosses the
    // threshold once an appended batch carries it too (segments re-sum)
    val probe = Seq((200L, "pre nine ten eleven twelve thirteen post"))
      .toDF("doc_id", "text")
    val before = Dedup.spanCoverageAgainstStore(probe, store,
        "doc_id", "text", n, minDocs)
      .as[(Long, Long, Long, Long)].collect().head
    assert(before._3 === 0L)
    Dedup.appendGramStore(
      Seq((50L, "x nine ten eleven twelve thirteen y")).toDF("doc_id", "text"),
      "doc_id", "text", store, n)
    val after = Dedup.spanCoverageAgainstStore(probe, store,
        "doc_id", "text", n, minDocs)
      .as[(Long, Long, Long, Long)].collect().head
    assert(after._3 === 5L)
  }

  test("cosinePairs floor is row-count-aware: both sides of the boundary") {
    // r14 VERDICT #4: floor = max(16, 2·⌈log₂(n)⌉). A dim-32 corpus
    // discriminates at n=1000 (floor 20 → blocked) but NOT at n=2³⁰
    // (floor 60 → exact: sign buckets collapse when dim ≈ log₂(n)).
    val rnd = new scala.util.Random(11)
    val dim = 32
    val df = (0 until 40).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def isExactPlan(threshold: Double, estRows: Long): Boolean = {
      val plan = Dedup.cosinePairs(df, "vec_id", "embedding", dim, threshold,
          estRows = Some(estRows))
        .queryExecution.executedPlan.toString
      plan.contains("NestedLoop") || plan.contains("Cartesian")
    }
    assert(isExactPlan(0.9, 1L << 30),
      "dim 32 at n=2^30 must dispatch to the exact join")
    assert(!isExactPlan(0.9, 1000L),
      "dim 32 at n=1000 must dispatch to the blocked path")
    // both branches still agree with the exact operator
    val exact = Dedup.cosinePairsExact(df, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Long)].collect().toSet
    val big = Dedup.cosinePairs(df, "vec_id", "embedding", dim, 0.9,
        estRows = Some(1L << 30))
      .as[(Long, Long, Long)].collect().toSet
    assert(big === exact)
  }

  test("dispatch guards: unknown stats never pick exact; string ids band; half overrides refuse (review r15)") {
    val rnd = new scala.util.Random(13)
    val dim = 32
    val rows = (0 until 30).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    // A stats-less plan (LogicalRDD reports the defaultSizeInBytes
    // sentinel): the dispatcher must fall back to the static floor and
    // pick the BLOCKED path — uncertainty never picks O(n²).
    val statless = SparkT.spark.createDataFrame(
      SparkT.spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2.toSeq))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    assert(Dedup.estimatedRows(statless).isEmpty,
      "LogicalRDD must report unknown stats")
    val plan = Dedup.cosinePairs(statless, "vec_id", "embedding", dim, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "unknown stats dispatched to the exact cross join")
    // String ids survive the banding kernel and the self-join
    val sdf = rows.map { case (id, v) => (s"doc-$id", v) }
      .toDF("vec_id", "embedding")
    val viaStr = Dedup.cosinePairsBlocked(sdf, "vec_id", "embedding", dim,
        0.9, planes = 128, bands = 16)
      .as[(String, String, Long)].collect().toSet
    val exactStr = Dedup.cosinePairsExact(sdf, "vec_id", "embedding", 0.9)
      .as[(String, String, Long)].collect().toSet
    assert(viaStr === exactStr)
    // A half-specified planes/bands override fails loudly
    intercept[IllegalArgumentException] {
      Dedup.cosinePairs(sdf, "vec_id", "embedding", dim, 0.9, planes = 256)
    }
  }

  test("lshParams: bits-per-band track log2(n), miss prob meets target") {
    def missProb(threshold: Double, r: Int, bands: Int): Double = {
      val p = 1.0 - math.acos(threshold) / math.Pi
      math.pow(1.0 - math.pow(p, r), bands)
    }
    // small corpus: the 8-bit floor holds
    val (r0, b0) = Dedup.lshParams(0.99, 100L)
    assert(r0 === 8 && missProb(0.99, r0, b0) <= 1e-6)
    // billion rows: r reaches log2(n) (candidates stay sub-quadratic —
    // per-band collision of unrelated vectors is 2^-r ≈ 1/n), and the
    // widened OR restores the recall target
    val (r1, b1) = Dedup.lshParams(0.95, 1L << 30)
    assert(r1 === 30 && missProb(0.95, r1, b1) <= 1e-6)
    assert(b1 >= b0, "wider bands must compensate the longer band keys")
    // the cap: band keys must pack into a long
    val (r2, _) = Dedup.lshParams(0.95, Long.MaxValue)
    assert(r2 === 40)
    // low thresholds at corpus scale fail loudly instead of silently
    // requiring a multi-GB hyperplane broadcast (review r15)
    intercept[IllegalArgumentException] {
      Dedup.lshParams(0.5, 1L << 30)
    }
  }

  test("sub-shingleN docs never simhash-pair: empty shingle sets have no " +
      "fingerprint (r18 review)") {
    // with < shingleN tokens the shingle set is empty; the majority-vote
    // tie rule would give EVERY such doc the identical all-ones
    // fingerprint and pair all of them at hamming 0
    val df = Seq((1L, "foo bar"), (2L, "baz qux"), (3L, ""),
      (4L, "one long enough document with plenty of words in it"),
      (5L, "one long enough document with plenty of words in it"))
      .toDF("doc_id", "text")
    val p64 = Dedup.simhashPairs(df, "doc_id", "text", shingleN = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p64 === Set((4L, 5L)), p64)
    val p30 = Dedup.simhashPairsRolling(df, "doc_id", "text", shingleN = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(p30 === Set((4L, 5L)), p30)
  }

  test("estimatedRows widthHint sizes array columns honestly; blocked " +
      "verify reads one materialized projection (r18 review)") {
    // schema-default width counts array<float> as 4 bytes -- a dim-64
    // frame would estimate ~20x too many rows and push the dispatcher
    // toward the O(n^2) exact branch
    val dim = 64
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("dedup-est").toString
    df.write.mode("overwrite").parquet(dir)
    val rd = SparkT.spark.read.parquet(dir)
    val plain = Dedup.estimatedRows(rd).get
    val hinted = Dedup.estimatedRows(rd, widthHint = 16L + 4L * dim).get
    assert(hinted < plain / 4,
      s"width hint must deflate the array under-count: $hinted vs $plain")
    // the hinted estimate is within ~4x of the true row count
    assert(hinted >= 50 && hinted <= 800, s"est $hinted for 200 rows")
  }

  test("embedCandidates fails loudly on a dim/type mismatch (r18 review)") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 20).map(i =>
        (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Dedup.embedCandidates(df, "vec_id", "embedding", dim = 16))
    assert(e.getMessage.contains("16"))
    val dd = df.withColumn("embedding",
      col("embedding").cast("array<double>"))
    intercept[IllegalArgumentException](
      Dedup.embedCandidates(dd, "vec_id", "embedding", dim = 32))
  }
}
