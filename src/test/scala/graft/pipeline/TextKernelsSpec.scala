package graft.pipeline

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kernel/tree twin equality for the r21 codegen text kernels: every
  * kernel-backed [[TextFunctions]] surface must be BIT-equal to its
  * original higher-order-expression tree (the `*Tree` twins) — on the real
  * corpus AND on adversarial edges (null, empty, whitespace-only, tabs,
  * multi-space runs, unicode incl. supplementary plane, sub-n docs,
  * marker ties, symbol runs). SparkT runs with codegen.fallback=false, so
  * a Janino defect in the kernels' generated call is a hard failure here.
  */
class TextKernelsSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  private val edges: Seq[Option[String]] = Seq(
    None,                       // null text
    Some(""),                   // empty
    Some(" "), Some("   "),     // whitespace-only
    Some("\t\n x \t"),          // non-space whitespace at the edges
    Some("a"), Some("a b"),     // sub-n token counts
    Some("the"),                // lone marker token
    Some("the  a   of and to in is"),   // multi-space runs, all stopwords
    Some("der und ist le et el y es"),  // marker ties across languages
    Some("le les et est"), Some("el los y es"),
    Some("héllo wörld café"),   // non-ASCII letters (NOT [A-Za-z])
    Some("中文 text 混合 the"),  // CJK + markers
    Some("𝒜 b 𝒜 b"), // supplementary-plane codepoints
    Some("### #a# ... .... ..#.."),     // symbol counting edges
    Some("spam spam spam spam"),        // maximal repetition
    Some("x" * 300),                    // one long token
    Some(("the quick brown fox jumps over the lazy dog " * 12).trim),
    Some("a b c"))         // NBSP is not \s: stays inside one token

  private lazy val corpus = graft.engine.Graft
    .table(SparkT.spark, "/root/testdata/sf0.01", "documents")
    .select(col("text")).as[String].collect().toSeq.map(Option(_))

  private def df(rows: Seq[Option[String]]) =
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t.orNull) }
      .toDF("id", "text")

  private def assertEqual(name: String,
                          tree: org.apache.spark.sql.Column,
                          kernel: org.apache.spark.sql.Column): Unit = {
    val rows = df(edges ++ corpus)
      .select(col("id"), tree.as("tree"), kernel.as("kernel"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"$name diverges at row ${r.getLong(0)}: tree=${r.get(1)} " +
          s"kernel=${r.get(2)}")
    }
  }

  test("tokens kernel == tree") {
    assertEqual("tokens",
      TextFunctions.tokensTree(col("text")), TextFunctions.tokens(col("text")))
  }

  test("shingles kernel == tree (n=3)") {
    assertEqual("shingles",
      TextFunctions.shinglesTree(col("text"), 3),
      TextFunctions.shingles(col("text"), 3))
  }

  test("allNgrams kernel == tree (n=2 and n=4)") {
    assertEqual("allNgrams2",
      TextFunctions.allNgramsTree(col("text"), 2),
      TextFunctions.allNgrams(col("text"), 2))
    assertEqual("allNgrams4",
      TextFunctions.allNgramsTree(col("text"), 4),
      TextFunctions.allNgrams(col("text"), 4))
  }

  test("langId kernel == tree") {
    assertEqual("langId",
      TextFunctions.langIdTree(col("text")), TextFunctions.langId(col("text")))
  }

  test("qualityMicros kernel == tree") {
    assertEqual("qualityMicros",
      TextFunctions.qualityMicrosTree(col("text")),
      TextFunctions.qualityMicros(col("text")))
  }

  test("fingerprint kernel == tree") {
    assertEqual("fingerprint",
      TextFunctions.fingerprintTree(col("text")),
      TextFunctions.fingerprint(col("text")))
  }

  test("dup/top/repetition kernels == trees (n=2)") {
    assertEqual("dupNgramRatioMicros",
      TextFunctions.dupNgramRatioMicrosTree(col("text"), 2),
      TextFunctions.dupNgramRatioMicros(col("text"), 2))
    assertEqual("topNgramRatioMicros",
      TextFunctions.topNgramRatioMicrosTree(col("text"), 2),
      TextFunctions.topNgramRatioMicros(col("text"), 2))
    assertEqual("repetitionMicros",
      TextFunctions.repetitionMicrosTree(col("text"), 2),
      TextFunctions.repetitionMicros(col("text"), 2))
  }

  test("allNgramHashes kernel == xxhash64 over the gram-string tree (n=4)") {
    assertEqual("allNgramHashes",
      transform(TextFunctions.allNgramsTree(col("text"), 4),
        g => xxhash64(g)),
      coalesce(graft.pipeline.textKernels.allNgramHashes(col("text"), 4),
        lit(Array.empty[Long])))
  }

  test("ngramCtxHashes kernel == xxhash64 over the gram/ctx string trees (n=3)") {
    val tree = transform(TextFunctions.allNgramsTree(col("text"), 3), g =>
      struct(xxhash64(g).as("gram_hash"),
        xxhash64(substring_index(g, " ", 2)).as("ctx_hash")))
    assertEqual("ngramCtxHashes",
      tree,
      coalesce(graft.pipeline.textKernels.ngramCtxHashes(col("text"), 3),
        tree))  // null text: tree yields [], kernel null — compare via fallback
  }

  test("stripTokens kernel rebuilds exactly (brute-force twin)") {
    // covered sets crafted per row: empty, full, interior runs, edges
    def brute(t: String, cov: Seq[Int]): (String, Long) = {
      val w = Option(t).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
      val kept = w.zipWithIndex.collect {
        case (tok, i) if !cov.contains(i) => tok
      }
      (kept.mkString(" "), kept.length.toLong)
    }
    val rows = Seq(
      ("a b c d e", Seq(1, 2)),
      ("a b c d e", Seq.empty[Int]),
      ("a b c d e", Seq(0, 1, 2, 3, 4)),
      ("a b c d e", Seq(0, 4)),
      ("  x   y  ", Seq(1)),
      ("single", Seq(0)),
      ("", Seq.empty[Int]),
      ("héllo wörld 𝒜 end", Seq(2)))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = SparkT.spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.map { case (t, c) => Row(t, c) }).asJava),
      StructType(Seq(StructField("text", StringType),
        StructField("cov", ArrayType(IntegerType)))))
    val got = df.select(graft.pipeline.textKernels.stripTokens(
        col("text"), col("cov")).as("s"))
      .select(col("s.clean_text"), col("s.kept_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.zip(got).foreach { case ((t, c), g) =>
      assert(g === brute(t, c.sorted), s"text='$t' cov=$c")
    }
  }

  test("starts-form kernels == expanded-positions forms (r22 span shapes)") {
    // the span operators now shuffle flagged window STARTS and expand
    // row-locally: stripTokensStarts(text, starts, n) must equal
    // stripTokens(text, distinct-sorted expansion of [s, s+n)), and
    // coveredLen(starts, n) must equal that expansion's size — including
    // overlapping, touching, duplicated-coverage and out-of-range starts
    def expand(starts: Seq[Int], n: Int): Seq[Int] =
      starts.flatMap(s => s until s + n).distinct.sorted
    val n = 4
    val cases = Seq(
      ("a b c d e f g h i j", Seq.empty[Int]),
      ("a b c d e f g h i j", Seq(0)),
      ("a b c d e f g h i j", Seq(0, 1)),        // overlap
      ("a b c d e f g h i j", Seq(0, 4)),        // touching
      ("a b c d e f g h i j", Seq(0, 6)),        // gap
      ("a b c d e f g h i j", Seq(0, 2, 3, 6)),  // mixed
      ("a b c d", Seq(0)),                       // full coverage
      ("", Seq.empty[Int]),
      ("x y", Seq(0)))                           // starts past sub-n doc
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = SparkT.spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          cases.map { case (t, s) => Row(t, s, expand(s, n)) }).asJava),
      StructType(Seq(StructField("text", StringType),
        StructField("starts", ArrayType(IntegerType)),
        StructField("cov", ArrayType(IntegerType)))))
    val got = df.select(
        graft.pipeline.textKernels.stripTokensStarts(
          col("text"), col("starts"), n).as("sn"),
        graft.pipeline.textKernels.stripTokens(
          col("text"), col("cov")).as("sp"),
        graft.pipeline.textKernels.coveredLen(col("starts"), n).as("cl"),
        size(col("cov")).as("ce"))
      .collect()
    cases.zip(got).foreach { case ((t, s), r) =>
      assert(r.get(0) === r.get(1), s"strip diverges: text='$t' starts=$s")
      assert(r.getLong(2) === r.getInt(3).toLong,
        s"coveredLen diverges: text='$t' starts=$s")
    }
  }

  test("gopherStats kernel == tree") {
    assertEqual("gopherStats",
      TextFunctions.gopherStatsTree(col("text")),
      TextFunctions.gopherStats(col("text")))
    // and the pass rule composes identically over both forms
    assertEqual("gopherPass",
      TextFunctions.gopherPass(TextFunctions.gopherStatsTree(col("text"))),
      TextFunctions.gopherPass(TextFunctions.gopherStats(col("text"))))
  }
}
