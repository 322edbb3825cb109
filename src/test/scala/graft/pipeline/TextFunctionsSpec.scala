package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Text-function twins and edge semantics beyond what the oracle gate
  * covers: expression/Scala fingerprint equality (incl. non-ASCII and
  * supplementary-plane codepoints), pinned empty-text behavior. */
class TextFunctionsSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  test("fingerprintScala is bit-equal to the fingerprint expression") {
    val texts = Seq("hello world", "", "  ", "héllo wörld", "中文 text 混合",
      "a", "the quick brown fox " * 20)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val expr = df.select(col("id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    texts.indices.foreach { i =>
      assert(TextFunctions.fingerprintScala(texts(i)) === expr(i.toLong),
        s"text ${i}: '${texts(i).take(30)}'")
    }
  }

  test("null text fingerprints to 0 in both forms") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    // Expression form: NULL input → NULL (SQL), Scala form pins 0 — the
    // pipeline path guards nulls before hashing.
    assert(TextFunctions.fingerprintScala(null) === 0L)
    assert(df.select(TextFunctions.fingerprint(col("text"))).head.isNullAt(0))
  }

  test("repetition ratios match a brute-force Scala reimplementation") {
    def brute(text: String): (Long, Long) = {
      val w = text.trim.split("\\s+").filter(_.nonEmpty)
      if (w.length < 2) (0L, 0L)
      else {
        val g = w.sliding(2).map(_.mkString(" ")).toSeq
        val dup = math.floor((1.0 - g.distinct.size.toDouble / g.size) * 1e6).toLong
        val top = math.floor(
          g.groupBy(identity).values.map(_.size).max.toDouble / g.size * 1e6).toLong
        (dup, top)
      }
    }
    val texts = Seq(
      "",                                   // empty → (0, 0)
      "one",                                // < n tokens → (0, 0)
      "a b c d e",                          // all distinct → dup 0, top 1/4
      "spam spam spam spam spam",           // one bigram only → (750000, 1000000)
      "buy now buy now limited offer buy now",
      "the quick brown fox jumps over the lazy dog the quick brown fox")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        TextFunctions.dupNgramRatioMicros(col("text"), 2).as("d"),
        TextFunctions.topNgramRatioMicros(col("text"), 2).as("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    texts.indices.foreach { i =>
      assert(got(i.toLong) === brute(texts(i)), s"text: '${texts(i)}'")
    }
    assert(got(3L) === ((750000L, 1000000L))) // the spam doc, exact values
    // the combined single-binding form agrees with the separate columns
    val combined = df.select(col("id"),
        TextFunctions.repetitionMicros(col("text"), 2).as("r"))
      .select(col("id"), col("r.dup_micros"), col("r.top_micros"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(combined === got)
  }

  test("maskPii: masks emails, urls, long digit runs; preserves everything else") {
    val cases = Seq(
      ("reach me at bob.smith+x@corp.example.io today",
        "reach me at <EMAIL> today"),
      ("docs at https://ex.org/a?b=c#frag and http://plain.net end",
        "docs at <URL> and <URL> end"),
      ("call 5551234567 or 123456 ok", "call <NUM> or 123456 ok"),
      // an email inside a URL masks as part of the URL (url-first order)
      ("see https://x.io/u@y.com/path done", "see <URL> done"),
      ("year 2024 and price 99 survive", "year 2024 and price 99 survive"),
      ("", ""))
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("id", "text")
    val got = df.select($"id", TextFunctions.maskPii($"text").as("m"))
      .as[(Long, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) === want, s"case $i")
    }
  }

  test("language ID is deterministic on marker ties") {
    // 'es' ∈ es-markers; 'est' ∈ fr-markers: one hit each → fr wins the
    // fixed tie order (en > de > fr > es).
    val df = Seq((1L, "est es")).toDF("id", "text")
    val got = df.select(TextFunctions.langId(col("text"))).head.getString(0)
    assert(got === "fr")
  }

}
