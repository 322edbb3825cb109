package graft.vector

import graft.SparkT
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** De-skewed IVF-ADC over-budget shuffle (r18, VERDICT r17 #5): a zipfian
  * probe distribution keys most queries to the same few lists, and the
  * plain list-keyed shuffle would serialize the screen into those
  * partitions. When a list's assigned-query count exceeds the batch
  * budget, [[Ivf.knnJoinPq]] salts its queries into ceil(count/budget)
  * deterministic qid-mod groups (bounded group rows — not a hash
  * approximation) and replicates the list's CODES (the cheap side) to
  * each group; per-query results merge in the same global cut, so the
  * rows are IDENTICAL — only the partition balance changes. */
class AdcSkewSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // four well-separated clusters at dim-8 corners; 50 rows each
  private lazy val corpus = (0 until 200).map { i =>
    val c = i % 4
    val v = Array.fill(8)(0f)
    v(c) = 10f
    (i.toLong,
      v.zipWithIndex.map { case (x, j) => x + ((i * 31 + j) % 7) * 0.01f }
        .toSeq)
  }.toDF("vec_id", "embedding")

  // ZIPF: every query sits beside cluster 0's corner — with nprobe = 1
  // all 40 land on ONE list (sequential qids make the qid-mod salt
  // groups exactly even, so the bound below is strict)
  private lazy val queries = (0 until 40).map { i =>
    val v = Array.fill(8)(0f)
    v(0) = 10f + (i % 5) * 0.001f
    v(1) = (i % 3) * 0.02f
    (i.toLong, v.toSeq)
  }.toDF("qid", "qvec")

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select($"qid".cast("long"), $"vec_id".cast("long"),
        $"dist".cast("double"), $"rn".cast("long"))
      .as[(Long, Long, Double, Long)].collect().sortBy(t => (t._1, t._4))

  private def withBudget[T](max: Int)(f: => T): T = {
    SparkT.spark.conf.set("spark.graft.knnJoin.maxQueryBatch", max.toString)
    try f
    finally SparkT.spark.conf.unset("spark.graft.knnJoin.maxQueryBatch")
  }

  test("zipfian probes: salted arm engages, rows identical, group rows bounded") {
    val dir = Files.createTempDirectory("graft-skew").resolve("i").toString
    val im = Ivf.train(corpus, "embedding", nlist = 4)
    val pq = Ivf.buildIndexPq(corpus, "embedding", "vec_id", im, dir)
    def go = Ivf.knnJoinPq(SparkT.spark, dir, im, pq, queries, "qid",
      "qvec", "vec_id", "vec_id", "embedding", k = 5, nprobe = 1,
      refine = 40)
    val base = rows(go) // in-budget broadcast arm
    assert(base.nonEmpty)
    // the fixture IS zipfian: every query's top probe is the same list
    val qvs = queries.select($"qid", $"qvec")
      .as[(Long, Array[Float])].collect()
    val probes = qvs.map { case (_, v) => im.probeOrder(v).head }
    assert(probes.distinct.length === 1, "fixture must concentrate probes")
    val budget = 4
    val before = Ivf.saltedScreens.get()
    val salted = withBudget(budget)(rows(go))
    assert(Ivf.saltedScreens.get() > before,
      "the salted de-skew arm must engage on a hot list over budget")
    assert(salted === base)
    // max-rows bound: the deterministic qid-mod split caps every
    // (list, salt) group at ceil(count / salts) assigned queries
    val count = qvs.length
    val width = math.min(im.nlist, 4) // ModPartitioner width in tests
    val salts = math.min(width.toLong,
      (count.toLong + budget - 1) / budget).toInt
    val groups = qvs.groupBy { case (qid, _) => ((qid % salts) + salts) % salts }
    val bound = (count + salts - 1) / salts
    assert(groups.values.map(_.length).max <= bound)
    assert(groups.size === salts) // the hot list really spread out
  }

  test("full probe under salting: every list hot, rows equal the exact join") {
    val dir = Files.createTempDirectory("graft-skew2").resolve("i").toString
    val im = Ivf.train(corpus, "embedding", nlist = 4)
    val pq = Ivf.buildIndexPq(corpus, "embedding", "vec_id", im, dir)
    // nprobe = nlist assigns EVERY query to EVERY list — all lists over
    // budget, salting everywhere; keep = k*refine covers the corpus, so
    // the result must equal the brute-force exact join
    val exact = rows(Knn.knnJoin(queries, corpus, "qid", "qvec",
      "vec_id", "embedding", k = 5))
    val before = Ivf.saltedScreens.get()
    val salted = withBudget(4)(rows(
      Ivf.knnJoinPq(SparkT.spark, dir, im, pq, queries, "qid", "qvec",
        "vec_id", "vec_id", "embedding", k = 5, nprobe = 4, refine = 40)))
    assert(Ivf.saltedScreens.get() > before)
    assert(salted === exact)
  }
}
