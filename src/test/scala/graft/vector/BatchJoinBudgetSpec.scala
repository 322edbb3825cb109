package graft.vector

import graft.SparkT
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The ENFORCED query-side budget of every batch KNN join (r15 VERDICT #1):
  * a batch within [[Knn.maxQueryBatch]] takes the fast collect/broadcast
  * arm; a larger batch takes each leg's scale arm — distributed
  * pid-assignment (graph legs), bounded slices (screened legs), no
  * broadcast hint (exact/IVF legs) — and the driver NEVER materializes the
  * whole batch. These specs pin (a) the scale arm actually engages
  * ([[Knn.overBudgetJoins]], the [[graft.plans.GraphCandidates.fallbackCount]]
  * instrumentation pattern) and (b) its rows are IDENTICAL to the
  * in-budget arm's at the exact configuration. */
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

  /** Run `join` over budget, assert the scale arm engaged, return rows. */
  private def overBudget(join: => DataFrame): Seq[(Long, Long, Double, Long)] =
    withBudget(4) {
      val before = Knn.overBudgetJoins.get()
      val r = rows(join)
      assert(Knn.overBudgetJoins.get() > before,
        "expected the over-budget scale arm to engage")
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

  test("IVF-ADC join over budget: probe-pruned sliced screen, identical rows (r16)") {
    val d = Files.createTempDirectory("graft-bb-ivfpq").resolve("i").toString
    val m = Ivf.train(emb, "embedding", nlist = 4)
    val pq = Ivf.buildIndexPq(emb, "embedding", "vec_id", m, d)
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    def go = Ivf.knnJoinPq(SparkT.spark, d, m, pq, q2, "qid", "qvec2",
      "vec_id", "vec_id", "embedding", k = 5, nprobe = 4, refine = 160)
    val base = rows(go)
    assert(base.nonEmpty)
    assert(overBudget(go) === base)
    // exactness against the brute-force join at full nprobe + margin
    val exact = rows(Knn.knnJoin(q2, emb, "qid", "qvec2", "vec_id",
      "embedding", k = 5))
    assert(base === exact)
  }

  test("screened quant join over budget: bounded slices, identical rows") {
    val m = Quantize.train(emb, "embedding")
    val qdf = Quantize.quantizeTable(emb, "embedding", "qvec", m)
    // distinct query vec col name: screened joins reuse qdf's columns
    val q2 = queries.withColumnRenamed("qvec", "qvec2")
    def go2 = Quantize.knnJoinQuant(qdf, "embedding", "qvec", "vec_id", m,
      q2, "qid", "qvec2", "vec_id", k = 5)
    val base = rows(go2)
    assert(base.nonEmpty)
    assert(overBudget(go2) === base)
  }

  private def Params(m: Int, efC: Int, partitions: Int) =
    Hnsw.Params(m, efC, partitions)
}
