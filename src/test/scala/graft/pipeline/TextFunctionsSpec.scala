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

  test("gopher stats match a brute-force twin; pass rule uses integer thresholds") {
    val cases = Seq(
      "",                                     // empty → all-zero stats
      "the cat sat",                          // short, 1 stopword
      ("the of and " + Seq.fill(60)("word").mkString(" ")), // passes most
      "### ... #tag normal",                  // symbol-heavy
      "12345 67890 $$$ %%%")                  // no alphabetic words
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val st = TextFunctions.gopherStats(col("text"))
    val got = df.select(col("id"), st.as("s"),
        TextFunctions.gopherPass(st).as("p"))
      .select(col("id"), col("s.n_words"), col("s.mean_word_len_milli"),
        col("s.symbol_ratio_micros"), col("s.alpha_frac_micros"),
        col("s.stop_hits"), col("p"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      val w = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val n = w.size
      def fl(x: Double) = math.floor(x).toLong
      val want = (
        i.toLong, n.toLong,
        if (n == 0) 0L else fl(1000.0 * w.map(_.length).sum / n),
        if (n == 0) 0L else fl(1e6 * w.map(x =>
          x.count(_ == '#') +
            x.sliding(3).toSeq.foldLeft((0, 0)) { case ((cnt, skip), s) =>
              if (skip > 0) (cnt, skip - 1)
              else if (s == "...") (cnt + 1, 2) else (cnt, 0)
            }._1).sum / n),
        if (n == 0) 0L else fl(1e6 * w.count(_.exists(ch =>
          (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z'))) / n),
        w.distinct.count(TextFunctions.gopherStopwords.contains).toLong)
      val g = got(i.toLong)
      assert((g._1, g._2, g._3, g._4, g._5, g._6) === want, s"case $i: '$t'")
      // pass replay from the integer stats
      val pass = g._2 >= 50 && g._2 <= 100000 &&
        g._3 >= 3000 && g._3 <= 10000 && g._4 <= 100000 &&
        g._5 >= 800000 && g._6 >= 2
      assert(g._7 === pass, s"case $i")
    }
    // the long case actually passes; the short ones fail
    assert(got(2L)._7 && !got(1L)._7 && !got(0L)._7)
  }

  test("langId labels NULL text und, never a marker language (r18 review)") {
    val df = Seq((1L, Some("the of and to a house")), (2L, None))
      .toDF("id", "text")
    val got = df.select($"id",
        TextFunctions.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "und")
  }
}
