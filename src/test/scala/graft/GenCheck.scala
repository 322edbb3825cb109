package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check harness over raw ScalaCheck `Gen`
  * (the scalatest↔scalacheck bridge artifact is not in the offline cache).
  * Fixed seed → reproducible failures; failures carry the sample via the
  * caller's assert message.
  */
trait GenCheck {
  def forAll[A](g: Gen[A], n: Int = 60)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(987654321L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      g.apply(params, seed).foreach { a => body(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    require(produced == n, s"generator produced only $produced/$n samples")
  }
}
