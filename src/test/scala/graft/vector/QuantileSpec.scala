package graft.vector

import graft.SparkT
import org.scalatest.funsuite.AnyFunSuite

/** P² streaming quantiles + adaptive beam termination (the reference's
  * knn/quantile.h + termination.h semantics). */
class QuantileSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("P² estimate tracks the exact quantile on random streams") {
    val rnd = new scala.util.Random(7)
    Seq(0.14, 0.2, 0.5, 0.9).foreach { q =>
      val est = new Quantile.P2(q)
      val xs = Array.fill(20000)(rnd.nextGaussian())
      xs.foreach(est.insert)
      val sorted = xs.sorted
      val exact = sorted((q * xs.length).toInt)
      // Gaussian spread ~1: the published algorithm stays within a few
      // percent of the distribution's scale on this stream length
      assert(math.abs(est.get - exact) < 0.05,
        s"q=$q est=${est.get} exact=$exact")
    }
    // uniform stream too (different tail shape)
    val estU = new Quantile.P2(0.2)
    val u = Array.fill(20000)(rnd.nextDouble() * 10)
    u.foreach(estU.insert)
    val uSorted = u.sorted
    assert(math.abs(estU.get - uSorted((0.2 * u.length).toInt)) < 0.2)
  }

  test("moving P² follows a distribution shift; plain P² lags") {
    val rnd = new scala.util.Random(11)
    val moving = new Quantile.MovingP2(128, 0.5)
    val plain = new Quantile.P2(0.5)
    // first regime: N(0,1); second: N(10,1)
    (0 until 2000).foreach { _ =>
      val x = rnd.nextGaussian(); moving.insert(x); plain.insert(x)
    }
    (0 until 2000).foreach { _ =>
      val x = 10 + rnd.nextGaussian(); moving.insert(x); plain.insert(x)
    }
    assert(math.abs(moving.get - 10.0) < 1.0,
      s"moving median ${moving.get} should track the new regime")
    assert(plain.get < 9.0, s"plain median ${plain.get} lags by design")
  }

  test("moving P² blends prev-window and filling-window by fill fraction") {
    // mirrors the reference MP2QuantileEstimator_c::Get(): w2 = fill
    // fraction, estimate = (1-w2)*prev + w2*current
    val m = new Quantile.MovingP2(10, 0.5)
    (0 until 10).foreach(_ => m.insert(5.0))
    assert(m.get === 5.0) // exactly at the boundary: prev window's estimate
    (0 until 5).foreach(_ => m.insert(15.0))
    // half-filled new window: 0.5*5 + 0.5*15
    assert(math.abs(m.get - 10.0) < 1e-12, s"blend got ${m.get}")
    (0 until 5).foreach(_ => m.insert(15.0))
    assert(m.get === 15.0) // boundary again: new regime fully owns it
  }

  test("termination: patience consecutive below-quantile rounds end the walk") {
    val t = new Quantile.Termination(0.5)
    // warm-up (heap not full): never terminates, only resets
    (0 until 20).foreach { _ =>
      t.onDistanceScored(); assert(!t.shouldTerminate(ef = 100, currentSize = 50))
    }
    // saturated frontier with healthy discovery: rounds collect plenty
    (0 until 300).foreach { _ =>
      (0 until 10).foreach { _ => t.onDistanceScored(); t.onCandidateCollected() }
      assert(!t.shouldTerminate(ef = 100, currentSize = 100))
    }
    // discovery collapses: after `patience` (ef<=800 → 9) bad rounds, stop
    var stopped = -1
    var i = 0
    while (stopped < 0 && i < 50) {
      (0 until 10).foreach(_ => t.onDistanceScored()) // zero collected
      if (t.shouldTerminate(ef = 100, currentSize = 100)) stopped = i
      i += 1
    }
    assert(stopped >= 0, "collapsed discovery must eventually terminate")
    assert(stopped <= 12, s"stopped after $stopped rounds (patience is 9)")
  }

  test("adaptive beam search: high recall with early stop on the clustered fixture") {
    val rnd = new scala.util.Random(13)
    val dim = 32
    val rows = for {
      c <- 0 until 40
      center = Array.fill(dim)(rnd.nextGaussian().toFloat * 3)
      i <- 0 until 50
    } yield ((c * 50 + i).toLong,
      center.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val d = java.nio.file.Files.createTempDirectory("graft-term")
      .resolve("g").toString
    Hnsw.buildIndex(df, "embedding", "vec_id", d, Hnsw.Params(m = 8, efC = 64))
    // k > 10: the termination policy actually engages (the reference
    // disables it for k <= 10, knn.cpp:481-483 — mirrored)
    val queries = Seq(3L, 512L, 1101L, 1650L, 1999L)
    val k = 16
    val recalls = queries.map { qid =>
      val q = rows(qid.toInt)._2
      val exact = Knn.knn(df, "embedding", "vec_id", q, k)
        .select("vec_id").as[Long].collect().toSet
      val got = Hnsw.search(SparkT.spark, d, "vec_id", q, k, ef = 64,
          adaptiveTermination = true)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"adaptive recall@$k $mean (per-query: $recalls)")
    // k <= 10 gates the policy OFF: adaptive === plain at the same ef
    val q0 = rows(3)._2
    val plain10 = Hnsw.search(SparkT.spark, d, "vec_id", q0, 10, ef = 48)
      .select("vec_id").as[Long].collect().toSeq
    val adapt10 = Hnsw.search(SparkT.spark, d, "vec_id", q0, 10, ef = 48,
        adaptiveTermination = true)
      .select("vec_id").as[Long].collect().toSeq
    assert(adapt10 === plain10)
    // and the exact contract is untouched when the flag is off
    val exact0 = Knn.knn(df, "embedding", "vec_id", q0, 10)
      .select("vec_id").as[Long].collect().toSeq
    val full = Hnsw.search(SparkT.spark, d, "vec_id", q0, 10, ef = 1 << 20)
      .select("vec_id").as[Long].collect().toSeq
    assert(full === exact0)
  }
}
