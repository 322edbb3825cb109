package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Benchmark decontamination (pipeline §"beyond the reference"): n-gram
  * containment of eval-set documents inside corpus documents. */
class DecontaminateSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private val evalDocs = Seq(
    (100L, "what is the capital of france in europe"),
    (101L, "solve for x in the quadratic equation below"),
    (102L, "too short")  // 2 tokens < shingleN=3 → no shingles, never flags
  ).toDF("eid", "etext")

  private val corpus = Seq(
    // 200 pastes eval 100 verbatim inside framing text → containment 1.0
    (200L, "intro words here what is the capital of france in europe and trailing words"),
    // 201 shares one trigram with eval 101 ("in the quadratic")
    (201L, "a note in the quadratic world of solvers"),
    // 202 shares nothing
    (202L, "completely disjoint vocabulary row"),
    (203L, "x y")  // shorter than n — no shingles
  ).toDF("cid", "ctext")

  test("verbatim paste reaches containment 1.0; partial overlap counted exactly") {
    val out = Decontaminate.overlaps(corpus, evalDocs,
        "cid", "ctext", "eid", "etext", shingleN = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // eval 100 has 6 distinct trigrams, all inside doc 200
    assert(out.contains((200L, 100L, 6L, 1000000L)))
    // doc 201 ∩ eval 101 = {"in the quadratic"}; eval 101 has 6 trigrams
    assert(out.contains((201L, 101L, 1L, math.floor(1e6 / 6).toLong)))
    assert(!out.exists(_._1 == 202L))
    assert(!out.exists(_._1 == 203L))
    assert(!out.exists(_._2 == 102L))
  }

  test("minOverlap and minContainment gate independently") {
    val byCount = Decontaminate.overlaps(corpus, evalDocs,
      "cid", "ctext", "eid", "etext", shingleN = 3, minOverlap = 2)
    assert(byCount.select("corpus_id").as[Long].collect().toSeq === Seq(200L))
    val byRatio = Decontaminate.overlaps(corpus, evalDocs,
      "cid", "ctext", "eid", "etext", shingleN = 3, minContainment = 0.5)
    assert(byRatio.select("corpus_id").as[Long].collect().toSeq === Seq(200L))
  }

  test("clean() is the anti-join of the flagged ids") {
    val kept = Decontaminate.clean(corpus, evalDocs,
        "cid", "ctext", "eid", "etext", shingleN = 3, minOverlap = 1)
      .select("cid").as[Long].collect().sorted.toSeq
    assert(kept === Seq(202L, 203L))
  }

  test("eval side broadcasts: the shingle probe is a broadcast hash join") {
    val plan = Decontaminate.overlaps(corpus, evalDocs,
        "cid", "ctext", "eid", "etext", shingleN = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast shingle probe, got:\n$plan")
    // broadcastEval=false: same rows through the shuffled probe
    val unhinted = Decontaminate.overlaps(corpus, evalDocs,
        "cid", "ctext", "eid", "etext", shingleN = 3,
        broadcastEval = false)
      .as[(Long, Long, Long, Long)].collect().toSet
    val hinted = Decontaminate.overlaps(corpus, evalDocs,
        "cid", "ctext", "eid", "etext", shingleN = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(unhinted === hinted)
  }

  test("brute-force twin on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc(len: Int) = Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val ev = (0L until 10L).map(i => (i, doc(4 + rnd.nextInt(5)))).toDF("eid", "etext")
    val co = (100L until 160L).map(i => (i, doc(6 + rnd.nextInt(20)))).toDF("cid", "ctext")
    val got = Decontaminate.overlaps(co, ev, "cid", "ctext", "eid", "etext",
        shingleN = 3, minOverlap = 2, minContainment = 0.25)
      .as[(Long, Long, Long, Long)].collect().toSet

    def sh(t: String) = t.trim.split("\\s+").filter(_.nonEmpty)
      .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val evs = ev.as[(Long, String)].collect().map { case (i, t) => (i, sh(t)) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (cid, ct) <- co.as[(Long, String)].collect()
      cs = sh(ct)
      (eid, es) <- evs
      ov = (cs & es).size
      if ov >= 2 && ov.toDouble / es.size >= 0.25
    } yield (cid, eid, ov.toLong,
      math.floor(ov.toDouble / es.size * 1e6).toLong)).toSet
    assert(got === want)
  }
}
