package graft.vector

import graft.SparkT
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The ENFORCED query-side budget of every batch KNN join (r15 VERDICT #1;
  * fully distributed in r17 — VERDICT r16 #1): a batch within
  * [[Knn.maxQueryBatch]] takes the fast collect/broadcast arm; a larger
  * batch takes each leg's scale arm — distributed pid-assignment (graph
  * legs), a partition-cartesian block-nested-loop (flat screened legs), a
  * list-shuffled co-partitioned zip (IVF-ADC), no broadcast hint
  * (exact/IVF legs) — and the driver NEVER materializes the whole batch
  * or any slice of it. These specs pin (a) the scale arm actually engages
  * ([[Knn.overBudgetJoins]], the [[graft.plans.GraphCandidates.fallbackCount]]
  * instrumentation pattern), (b) for the screened/ADC legs the
  * NEVER-COLLECTS distributed screen ran ([[Knn.distributedScreens]] —
  * the r16 arm looped driver-collected slices; that loop is gone), and
  * (c) its rows are IDENTICAL to the in-budget arm's at the exact
  * configuration. */
class BatchJoinBudgetSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb =
    graft.engine.Graft.table(SparkT.spark, sfDir, "embeddings")
  // 20+ query rows against a budget of 4 — decisively over
  private lazy val queries = emb.filter($"vec_id" % 25 === 0)
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))

  private def withBudget[T](max: Int)(f: => T): T = {
    SparkT.spark.conf.set("spark.graft.knnJoin.maxQueryBatch", max.toString)
    try f
    finally SparkT.spark.conf.unset("spark.graft.knnJoin.maxQueryBatch")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select($"qid".cast("long"), $"vec_id".cast("long"),
        $"dist".cast("double"), $"rn".cast("long"))
      .as[(Long, Long, Double, Long)].collect().sortBy(t => (t._1, t._4))

  /** Run `join` over budget, assert the scale arm engaged, return rows.
    * `distributed = true` additionally pins that the never-collects
    * distributed screen served it (screened/ADC legs). */
  private def overBudget(join: => DataFrame, distributed: Boolean = false)
      : Seq[(Long, Long, Double, Long)] =
    withBudget(4) {
      val before = Knn.overBudgetJoins.get()
      val beforeD = Knn.distributedScreens.get()
      val r = rows(join)
      assert(Knn.overBudgetJoins.get() > before,
        "expected the over-budget scale arm to engage")
      if (distributed)
        assert(Knn.distributedScreens.get() > beforeD,
          "expected the never-collects distributed screen to engage")
      r
    }

  test("exact knnJoin over budget: no broadcast hint, identical rows") {
    def go = Knn.knnJoin(queries, emb, "qid", "qvec", "vec_id", "embedding",
      k = 5)
    val base = rows(go) // default budget: broadcast arm
    assert(base.nonEmpty)
    assert(overBudget(go) === base)
  }

  test("IVF join over budget: shuffle equi-join, identical rows") {
    val d = Files.createTempDirectory("graft-bb-ivf").resolve("i").toString
    val m = Ivf.train(emb, "embedding", nlist = 4)
    Ivf.buildIndex(emb, "embedding", m, d)
    def go = Ivf.knnJoin(SparkT.spark, d, m, queries, "qid", "qvec",
      "vec_id", "embedding", k = 5, nprobe = 4)
    val base = rows(go)
    assert(base.nonEmpty)
    assert(overBudget(go) === base)
  }

  test("IVF join over budget under ZIPFIAN probes: AQE splits the skewed list, identical rows (r19)") {
    // VERDICT r18 #2: the non-PQ IVF over-budget arm is a DataFrame
    // shuffle equi-join on the list id (no explicit salting — unlike the
    // RDD-based ADC leg, which salts deterministically); the skew
    // guarantee is AQE's skew-join split, and this pins it actually
    // engaging on a zipfian probe distribution (thresholds scaled down to
    // fixture bytes; at production sizes the defaults fire the same way).
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
    val rnd = new scala.util.Random(41)
    val dim = 16
    def near(c: Int): Array[Float] =
      Array.tabulate(dim)(j => (c * 40).toFloat + j +
        0.1f * rnd.nextGaussian().toFloat)
    val corpus = (0 until 4).flatMap(c =>
      (0 until 200).map(i => ((c * 200 + i).toLong, near(c))))
      .toDF("vec_id", "embedding")
    // zipfian queries: ~97% probe list 0's neighborhood, STORED as a
    // multi-file parquet table — AQE's skew split works at mapper
    // granularity, and a single-mapper local relation (the
    // LocalTableScan a tiny fixture would otherwise produce — even an
    // explicit repartition gets pruned as redundant under the join's
    // shuffle) is unsplittable no matter how skewed; production query
    // sides are many-file scans by construction.
    val qdir = Files.createTempDirectory("graft-bb-skewq").resolve("q").toString
    graft.tables.Writer.write(
      ((0 until 2000).map(i => (10000L + i, near(0))) ++
        (0 until 60).map(i => (20000L + i, near(1 + i % 3))))
        .toDF("qid", "qvec"),
      qdir, sortBy = Seq("qid"), files = 8)
    val zipf = SparkT.spark.read.parquet(qdir)
    val d = Files.createTempDirectory("graft-bb-skew").resolve("i").toString
    val m = Ivf.train(corpus, "embedding", nlist = 4)
    Ivf.buildIndex(corpus, "embedding", m, d)
    // nprobe = 1 concentrates the join key (nprobe = nlist would
    // replicate every query onto every key — uniform by construction)
    def go = Ivf.knnJoin(SparkT.spark, d, m, zipf, "qid", "qvec",
      "vec_id", "embedding", k = 5, nprobe = 1)
    val base = rows(go) // in-budget broadcast arm
    assert(base.nonEmpty)
    val conf = SparkT.spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1024")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512")
    // 4 reduce partitions put the fixture's median at one real list's
    // bytes, so the default factor-5 gate needs production-scale spread
    // to clear — the pin is the MECHANISM engaging on this join shape
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      withBudget(4) {
        val before = Knn.overBudgetJoins.get()
        // inspect the SAME DataFrame that executed — an un-executed
        // AdaptiveSparkPlanExec reports its initial plan, no AQE reads
        val sel = go.select($"qid".cast("long"), $"vec_id".cast("long"),
          $"dist".cast("double"), $"rn".cast("long"))
        // collect Rows from `sel` ITSELF (.as[T] would wrap a fresh
        // QueryExecution and leave sel's adaptive plan un-executed)
        val got = sel.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getLong(3)))
          .sortBy(t => (t._1, t._4)).toSeq
        assert(got === base)
        assert(Knn.overBudgetJoins.get() > before,
          "expected the over-budget scale arm to engage")
        // AdaptiveSparkPlanExec and QueryStageExec are LEAVES whose
        // materialized plans are not children — descend through both or
        // the AQE reads are invisible to collect
        def skewReads(p: org.apache.spark.sql.execution.SparkPlan): Int =
          p.collect {
            case r: AQEShuffleReadExec if r.hasSkewedPartition => 1
            case a: AdaptiveSparkPlanExec => skewReads(a.executedPlan)
            case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              skewReads(qs.plan)
          }.sum
        val root = sel.queryExecution.executedPlan
        assert(skewReads(root) > 0,
          s"AQE skew split did not engage on the zipfian join " +
            s"(root ${root.getClass.getSimpleName}):\n$root")
      }
    } finally {
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    }
  }

  test("routed graph join over budget: distributed pid assignment, identical rows (flat + hier)") {
    val d = Files.createTempDirectory("graft-bb-g").resolve("g").toString
    val p = Params(m = 8, efC = 64, partitions = 4)
    Hnsw.buildIndexClustered(emb, "embedding", "vec_id", d, p)
    def go(h: Boolean) = Hnsw.knnJoinRouted(SparkT.spark, d, queries,
      "qid", "qvec", "vec_id", k = 5, ef = 1 << 20, hier = h)
    val base = rows(go(false))
    assert(base.nonEmpty)
    assert(overBudget(go(false)) === base)
    // hier arm: the layer descent zips in on the distributed path too
    Hnsw.buildHierarchy(SparkT.spark, d, p)
    assert(rows(go(true)) === base) // full ef: entry choice can't matter
    assert(overBudget(go(true)) === base)
  }

  test("quantized graph join over budget: distributed bound-space walk + distributed rescore, identical rows") {
    val d = Files.createTempDirectory("graft-bb-q").resolve("g").toString
    val p = Params(m = 8, efC = 64, partitions = 4)
    Hnsw.buildIndexClusteredQuantized(emb, "embedding", "vec_id", d, p)
    def go = Hnsw.knnJoinQuantized(SparkT.spark, d, emb, "vec_id",
      "embedding", queries, "qid", "qvec", "vec_id", k = 5, ef = 1 << 20)
    val base = rows(go)
    assert(base.nonEmpty)
    assert(overBudget(go) === base)
  }

  test("IVF-ADC join over budget: list-shuffled distributed screen, identical rows (r17)") {
    val d = Files.createTempDirectory("graft-bb-ivfpq").resolve("i").toString
    val m = Ivf.train(emb, "embedding", nlist = 4)
    val pq = Ivf.buildIndexPq(emb, "embedding", "vec_id", m, d)
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    def go = Ivf.knnJoinPq(SparkT.spark, d, m, pq, q2, "qid", "qvec2",
      "vec_id", "vec_id", "embedding", k = 5, nprobe = 4, refine = 160)
    val base = rows(go)
    assert(base.nonEmpty)
    assert(overBudget(go, distributed = true) === base)
    // exactness against the brute-force join at full nprobe + margin
    val exact = rows(Knn.knnJoin(q2, emb, "qid", "qvec2", "vec_id",
      "embedding", k = 5))
    assert(base === exact)
  }

  test("screened quant join over budget: distributed block-nested-loop, identical rows") {
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    // distinct query vec col name: screened joins reuse qdf's columns
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    def go2 = Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id", m,
      q2, "qid", "qvec2", "vec_id", k = 5)
    val base = rows(go2)
    assert(base.nonEmpty)
    assert(overBudget(go2, distributed = true) === base)
  }

  test("screened quant4/binary/pq joins over budget: distributed screen, identical rows (r17)") {
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    val m4 = Quantize.train4(emb, "embedding")
    val qdf4 = Quantize.quantize4Table(emb, "embedding", "q4vec", m4)
    def go4 = Quantize.knnJoinQuant4(qdf4, "embedding", "q4vec", "vec_id",
      m4, q2, "qid", "qvec2", "vec_id", k = 5, refine = 32)
    val base4 = rows(go4)
    assert(base4.nonEmpty)
    assert(overBudget(go4, distributed = true) === base4)
    val mb = Quantize.trainBinary(emb, "embedding")
    val bdf = Quantize.binarizeTable(emb, "embedding", "bvec", mb)
    def gob = Quantize.knnJoinBinary(bdf, "embedding", "bvec", "vec_id",
      mb, q2, "qid", "qvec2", "vec_id", k = 5, refine = 320)
    val baseb = rows(gob)
    assert(baseb.nonEmpty)
    assert(overBudget(gob, distributed = true) === baseb)
    val mp = Quantize.trainPq(emb, "embedding", "vec_id")
    val pdf = Quantize.quantizePqTable(emb, "embedding", "pqvec", mp)
    def gop = Quantize.knnJoinPq(pdf, "embedding", "pqvec", "vec_id",
      mp, q2, "qid", "qvec2", "vec_id", k = 5, refine = 128)
    val basep = rows(gop)
    assert(basep.nonEmpty)
    assert(overBudget(gop, distributed = true) === basep)
  }

  // ───────────── byte-aware budget (r18, VERDICT r17 #1) ─────────────

  test("byte budget derives the row budget from dim: rows = bytes/(16+4*dim), row conf still caps") {
    val s = SparkT.spark
    s.conf.set("spark.graft.knnJoin.maxQueryBatchBytes", (1L << 20).toString)
    try {
      // narrow vectors: many rows fit a MB
      assert(Knn.maxQueryBatch(s, 8) === (1 << 20) / (16 + 4 * 8))
      // dim-1536 embeddings (the engine's own provider catalog): the SAME
      // byte budget derives a ~128x smaller row budget
      assert(Knn.maxQueryBatch(s, 1536) === (1 << 20) / (16 + 4 * 1536))
      // unknown dim (empty batch): the row cap alone applies
      assert(Knn.maxQueryBatch(s) === (1 << 16))
      // the row conf is an additional cap, never raised by bytes
      s.conf.set("spark.graft.knnJoin.maxQueryBatch", "100")
      assert(Knn.maxQueryBatch(s, 8) === 100)
      // a derived budget never drops below one row
      s.conf.set("spark.graft.knnJoin.maxQueryBatchBytes", "1")
      s.conf.unset("spark.graft.knnJoin.maxQueryBatch")
      assert(Knn.maxQueryBatch(s, 1536) === 1)
    } finally {
      s.conf.unset("spark.graft.knnJoin.maxQueryBatchBytes")
      s.conf.unset("spark.graft.knnJoin.maxQueryBatch")
    }
  }

  test("arm engagement flips on byte pressure ALONE: row conf untouched, identical rows") {
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    def go = Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id", m,
      q2, "qid", "qvec2", "vec_id", k = 5)
    val base = rows(go)
    assert(base.nonEmpty)
    // dim 64 → 272 B/row → 1100 B derives a 4-row budget; the 20-row
    // batch is decisively over on BYTES while the row conf stays default
    SparkT.spark.conf.set("spark.graft.knnJoin.maxQueryBatchBytes", "1100")
    try {
      val before = Knn.overBudgetJoins.get()
      val beforeD = Knn.distributedScreens.get()
      assert(rows(go) === base)
      assert(Knn.overBudgetJoins.get() > before,
        "byte pressure alone must engage the scale arm")
      assert(Knn.distributedScreens.get() > beforeD)
    } finally
      SparkT.spark.conf.unset("spark.graft.knnJoin.maxQueryBatchBytes")
  }

  // ───────── deterministic projection release (r18, VERDICT r17 #3) ─────────

  /** Poll until the listener bus delivers the post-action release. */
  private def awaitDrained(): Unit = {
    val deadline = System.currentTimeMillis + 30000
    while (Knn.livePersistedCount > 0 &&
           System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(Knn.livePersistedCount === 0,
      "persisted query projections must release after the terminal action")
  }

  test("over-budget projections unpersist after the terminal action on every persisted leg") {
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    // flat screened leg
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    val base = rows(Quantize.knnJoinQuant(qdf, "embedding", "qvec",
      "vec_id", m, q2, "qid", "qvec2", "vec_id", k = 5))
    withBudget(4) {
      // screen/rescore row identity is preserved THROUGH the release
      // machinery (the persist exists for identity; release must not
      // break it within one action)
      assert(rows(Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id",
        m, q2, "qid", "qvec2", "vec_id", k = 5)) === base)
      awaitDrained()
    }
    // IVF-ADC leg
    val dir = Files.createTempDirectory("graft-rel-pq").resolve("i").toString
    val im = Ivf.train(emb, "embedding", nlist = 4)
    val pq = Ivf.buildIndexPq(emb, "embedding", "vec_id", im, dir)
    withBudget(4) {
      assert(Ivf.knnJoinPq(SparkT.spark, dir, im, pq, q2, "qid", "qvec2",
        "vec_id", "vec_id", "embedding", k = 5, nprobe = 4,
        refine = 160).count() > 0)
      awaitDrained()
    }
    // quantized-graph leg
    val gd = Files.createTempDirectory("graft-rel-qg").resolve("g").toString
    Hnsw.buildIndexClusteredQuantized(emb, "embedding", "vec_id", gd,
      Params(m = 8, efC = 64, partitions = 4))
    withBudget(4) {
      assert(Hnsw.knnJoinQuantized(SparkT.spark, gd, emb, "vec_id",
        "embedding", q2, "qid", "qvec2", "vec_id", k = 5,
        ef = 1 << 20).count() > 0)
      awaitDrained()
    }
  }

  test("a never-actioned over-budget plan is bounded by the retained cap") {
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    SparkT.spark.conf
      .set("spark.graft.knnJoin.maxPersistedQueryProjections", "2")
    try withBudget(4) {
      // build (never act on) several over-budget joins: the FIFO cap
      // unpersists the oldest, so retained projections never exceed it
      (1 to 5).foreach { _ =>
        Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id", m,
          q2, "qid", "qvec2", "vec_id", k = 5)
      }
      assert(Knn.livePersistedCount <= 2)
      // an action on a FRESH join still drains everything it consumed
      assert(rows(Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id",
        m, q2, "qid", "qvec2", "vec_id", k = 5)).nonEmpty)
    } finally SparkT.spark.conf
      .unset("spark.graft.knnJoin.maxPersistedQueryProjections")
  }

  test("a NONDETERMINISTIC query source is never eager-released: screen " +
      "and rescore stay identical across repeated actions (r18 review)") {
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    // rand() makes the filtered query set nondeterministic under
    // recompute -- eager release (cap eviction or post-action) would let
    // the screen and the rescore see DIFFERENT rows; such plans skip the
    // eager-release set (ContextCleaner handles them, the r17 contract)
    import org.apache.spark.sql.functions.rand
    val qNondet = emb.filter(rand(7) < 0.2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec2"))
    withBudget(4) {
      val before = Knn.livePersistedCount
      val j = Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id", m,
        qNondet, "qid", "qvec2", "vec_id", k = 5)
      assert(Knn.livePersistedCount === before,
        "nondeterministic projections must not enter the eager-release set")
      // repeated actions on the SAME join agree (the persisted
      // projection survives the first action)
      val r1 = rows(j)
      assert(rows(j) === r1)
      assert(r1.nonEmpty)
      // every (screen-survivor) pair carries a distance consistent with
      // ONE query row set: rescore rows match screen rows exactly by
      // construction when both read the same persisted projection
      assert(Knn.livePersistedCount === before)
    }
  }

  private def Params(m: Int, efC: Int, partitions: Int) =
    Hnsw.Params(m, efC, partitions)
}
