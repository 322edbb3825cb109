package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trigram-LM perplexity scorer: hand-computed smoothed costs, backoff
  * paths (unseen gram / unseen context), sub-n docs, store round trip,
  * partition-count invariance, bucket assignment. */
class NgramLMSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // The model's quantization, replicated independently: floor-micros of
  // the float32 -ln p.
  private def cost(num: Long, den: Long): Long =
    math.floor((-math.log(num.toDouble / den.toDouble))
      .toFloat.toDouble * 1000000).toLong

  // corpus: one doc "a b c a b c" →
  //   trigram counts: "a b c"→2, "b c a"→1, "c a b"→1
  //   ctx counts:     "a b"→2,  "b c"→1,  "c a"→1
  //   vocab V = 3
  private lazy val corpus = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
  private lazy val model = NgramLM.train(corpus, "text", 3)

  test("seen gram, seen-ctx backoff, unseen-ctx default, sub-n doc") {
    val batch = Seq(
      (10L, "a b c d"),   // "a b c" seen; "b c d" unseen gram, ctx "b c" seen
      (11L, "x y z w"),   // both trigrams: unseen ctx → default
      (12L, "a b")        // sub-n: (0, 0, 0)
    ).toDF("doc_id", "text")
    val got = NgramLM.scoreDocs(batch, "doc_id", "text", model, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    val seen = cost(2 + 1, 2 + 3)        // p = 3/5
    val ctxBackoff = cost(1, 1 + 3)      // p = 1/4
    val dflt = cost(1, 3)                // p = 1/3
    assert(got(10L) === ((2L, seen + ctxBackoff, (seen + ctxBackoff) / 2)))
    assert(got(11L) === ((2L, 2 * dflt, dflt)))
    assert(got(12L) === ((0L, 0L, 0L)))
  }

  test("higher-ppl text scores above in-distribution text") {
    val batch = Seq((20L, "a b c a b c"), (21L, "q w e r t y")).toDF("doc_id", "text")
    val avg = NgramLM.scoreDocs(batch, "doc_id", "text", model, 3)
      .select("doc_id", "avg_cost_micros").as[(Long, Long)].collect().toMap
    assert(avg(20L) < avg(21L))
  }

  test("scores are invariant to input partitioning") {
    val batch = (0 until 40).map(i =>
      (i.toLong, s"a b c tok$i b c a tok${i % 7}")).toDF("doc_id", "text")
    val one = NgramLM.scoreDocs(batch, "doc_id", "text", model, 3)
      .collect().map(_.toSeq).toSet
    val many = NgramLM.scoreDocs(batch.repartition(7), "doc_id", "text",
      model, 3).collect().map(_.toSeq).toSet
    assert(one === many)
  }

  test("persisted model store reproduces in-memory scores") {
    val dir = java.nio.file.Files.createTempDirectory("lmstore").toString
    NgramLM.writeLM(corpus, "text", s"$dir/lm", 3)
    val batch = Seq((10L, "a b c d"), (11L, "x y z")).toDF("doc_id", "text")
    val mem = NgramLM.scoreDocs(batch, "doc_id", "text", model, 3)
      .collect().map(_.toSeq).toSet
    val store = NgramLM.scoreAgainstStore(batch, s"$dir/lm", "doc_id",
      "text", 3).collect().map(_.toSeq).toSet
    assert(mem === store)
  }

  test("pplBuckets: ties share a bucket, thirds split 1/1/2/2/3/3") {
    val scored = Seq(
      (1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L), (5L, 40L), (6L, 50L)
    ).toDF("doc_id", "avg_cost_micros")
      .withColumn("grams_scored", lit(1L))
      .withColumn("cost_sum_micros", col("avg_cost_micros"))
    val got = NgramLM.pplBuckets(scored, "doc_id", 3)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L))
  }

  test("train rejects n < 2") {
    intercept[IllegalArgumentException] {
      NgramLM.train(corpus, "text", 1)
    }
  }

  test("train rejects an empty corpus (V=0 would poison every cost)") {
    intercept[IllegalArgumentException] {
      NgramLM.train(Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", 3)
    }
  }

  test("pplBuckets plan has no unbounded single-partition Window (r14 VERDICT #8)") {
    // The global cumulative is two-phase: a within-coarse-bucket prefix
    // Window (partitioned by score >> 14 — every partition holds <= 2^14
    // distinct scores) plus ONE global-ordered Window over the per-bucket
    // totals, whose cardinality is bounded by the SCORE RANGE (~1.7k rows
    // at any corpus size — floor-micros of a float32 -ln p), never by the
    // corpus. So: at least one partitioned Window, and at most one global
    // Window, which must consume an aggregate (the bucket totals), never
    // the doc- or distinct-score-sized frames.
    val scored = (0 until 500).map(i => (i.toLong, (i % 97).toLong * 1000))
      .toDF("doc_id", "avg_cost_micros")
    val out = NgramLM.pplBuckets(scored, "doc_id", 4)
    // logical plan (AQE hides the physical tree behind AdaptiveSparkPlanExec)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected the within-bucket prefix Window")
    val globals = windows.filter(_.partitionSpec.isEmpty)
    assert(globals.size <= 1, "more than one global Window")
    globals.foreach { g =>
      val aggBelow = g.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.nonEmpty,
        "the global Window must run over the bounded bucket-totals aggregate")
    }
    // and the two-phase result equals the brute-force definition
    val got = out.select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    val rows = (0 until 500).map(i => (i.toLong, (i % 97).toLong * 1000))
    val n = rows.size
    val brute = rows.map { case (id, s) =>
      val below = rows.count(_._2 < s)
      id -> (1L + (below.toLong * 4) / n)
    }.toMap
    assert(got === brute)
  }

  test("a model scored with a mismatched n fails loudly instead of " +
      "silently defaulting every gram (r18 review)") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "c d e f g h i j"))
      .toDF("id", "text")
    val m = NgramLM.train(docs, "text", n = 4)
    val e = intercept[IllegalArgumentException](
      NgramLM.scoreDocs(docs, "id", "text", m, n = 3).collect())
    assert(e.getMessage.contains("n=4"))
    // matching n still scores; the metadata row never reaches outputs
    val ok = NgramLM.scoreDocs(docs, "id", "text", m, n = 4)
    assert(ok.count() === 2)
  }
}
