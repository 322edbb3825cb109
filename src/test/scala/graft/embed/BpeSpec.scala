package graft.embed

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GPT-2-format byte-level BPE: published byte table, pre-tokenizer, merge
  * loop (vs a naive independent twin), artifact parsing, Spark stage. */
class BpeSpec extends AnyFunSuite {

  import SparkT.spark.implicits._

  // a base vocab covering every byte symbol (id = byte value), plus merges
  private def baseVocab: Map[String, Int] =
    (0 until 256).map(b => Bpe.byteEncoder(b).toString -> b).toMap

  private def model(merges: Seq[(String, String)],
                    extra: Map[String, Int] = Map.empty): Bpe.Model =
    Bpe.Model(baseVocab ++ extra, merges.zipWithIndex.toMap)

  test("bytes→unicode table matches the published fixed points") {
    // printable ASCII maps to itself
    assert(Bpe.byteEncoder('a'.toInt) === 'a')
    assert(Bpe.byteEncoder('!'.toInt) === '!')
    // space (0x20) is not printable-kept: maps into the 256+ range as Ġ
    assert(Bpe.byteEncoder(' '.toInt) === 'Ġ')
    // newline (0x0A) → Ċ (the published table's well-known values)
    assert(Bpe.byteEncoder('\n'.toInt) === 'Ċ')
    // the map is a bijection over 256 entries
    assert(Bpe.byteEncoder.toSet.size === 256)
  }

  test("pre-tokenizer follows the published GPT-2 pattern") {
    assert(Bpe.pretokenize("the cat sat") === Seq("the", " cat", " sat"))
    assert(Bpe.pretokenize("it's 42 degrees!") ===
      Seq("it", "'s", " 42", " degrees", "!"))
    assert(Bpe.pretokenize("a  b") === Seq("a", " ", " b")) // double space
    assert(Bpe.pretokenize("") === Seq.empty)
  }

  test("merge loop matches a naive lowest-rank-first twin on random inputs") {
    // independent twin: literally re-finds and merges ONE lowest-rank pair
    // occurrence set per iteration, structured differently
    def twin(tok: String, ranks: Map[(String, String), Int]): Vector[String] = {
      def step(w: Vector[String]): Option[Vector[String]] = {
        val present = w.zip(w.drop(1)).flatMap(p => ranks.get(p).map(p -> _))
        if (present.isEmpty) None
        else {
          val (pair, _) = present.minBy(_._2)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && (w(i), w(i + 1)) == pair) {
              out += pair._1 + pair._2; i += 2
            } else { out += w(i); i += 1 }
          }
          Some(out.result())
        }
      }
      var w = tok.map(_.toString).toVector
      var next = step(w)
      while (next.isDefined) { w = next.get; next = step(w) }
      w
    }
    val rnd = new scala.util.Random(23)
    val alpha = "abcd"
    // random merge table over the tiny alphabet and its products
    val syms = scala.collection.mutable.ArrayBuffer(alpha.map(_.toString): _*)
    val merges = (0 until 12).map { _ =>
      val a = syms(rnd.nextInt(syms.length))
      val b = syms(rnd.nextInt(syms.length))
      syms += a + b
      (a, b)
    }.distinct
    val m = model(merges,
      merges.zipWithIndex.map { case ((a, b), i) => (a + b) -> (1000 + i) }.toMap)
    (0 until 200).foreach { _ =>
      val tok = Array.fill(1 + rnd.nextInt(12))(
        alpha(rnd.nextInt(alpha.length))).mkString
      assert(m.symbols(tok) === twin(tok, m.ranks), s"token '$tok'")
    }
  }

  test("encode: chains merge greedily; ids come from vocab.json; count agrees") {
    // the ' the' / ' of' chains (byte-encoded space = Ġ)
    val merges = Seq(("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"), ("Ġ", "o"), ("Ġo", "f"))
    val extra = Map("Ġt" -> 256, "Ġth" -> 257, "Ġthe" -> 258,
      "Ġo" -> 259, "Ġof" -> 260)
    val m = model(merges, extra)
    // first word has no leading space → plain bytes
    assert(m.encode("the").toSeq === Seq('t'.toInt, 'h'.toInt, 'e'.toInt))
    // " the" fully merges; " then" = [Ġthe, n]; " ox" = [Ġo, x]
    assert(m.encode("a the").toSeq === Seq('a'.toInt, 258))
    assert(m.encode("a then").toSeq === Seq('a'.toInt, 258, 'n'.toInt))
    assert(m.encode("a ox").toSeq === Seq('a'.toInt, 259, 'x'.toInt))
    assert(m.countTokens("a the then of") === 1 + 1 + 2 + 1)
    // inconsistent artifact pair fails loudly (merged symbol not in vocab)
    val broken = model(Seq(("a", "b")))
    val e = intercept[IllegalStateException](broken.encode("ab"))
    assert(e.getMessage.contains("missing from vocab.json"))
  }

  test("artifact round trip + shared load + Spark stage") {
    val merges = Seq(("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"))
    val extra = Map("Ġt" -> 256, "Ġth" -> 257, "Ġthe" -> 258)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.writeModel(dir, baseVocab ++ extra, merges)
    val loaded = Bpe.load(dir)
    assert(loaded.ranks === merges.zipWithIndex.toMap)
    assert(loaded.encode("a the").toSeq === Seq('a'.toInt, 258))
    val before = Bpe.loadCount.get()
    val df = Seq((1L, "a the"), (2L, "the"), (3L, ""), (4L, null: String))
      .toDF("id", "text").repartition(4)
    val out = Bpe.tokenizeStage(df, "text", dir,
        idsCol = "ids", countCol = "n")
      .select($"id", $"ids", $"n").as[(Long, Seq[Int], Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((Seq('a'.toInt, 258), 2)))
    assert(out(2L) === ((Seq('t'.toInt, 'h'.toInt, 'e'.toInt), 3)))
    assert(out(3L) === ((Seq.empty, 0)))
    assert(out(4L) === ((Seq.empty, 0))) // null text = empty, not NPE
    assert(Bpe.loadCount.get() <= before + 1) // one artifact read per JVM
    // merges.txt with a malformed line fails loudly
    intercept[IllegalArgumentException](Bpe.parseMerges(Seq("a b c")))
    // ONLY the leading #version header is skipped: real GPT-2 merge lines
    // can start with '#' (the merges that build '##'-family tokens)
    val m2 = Bpe.parseMerges(Seq("#version: 0.2", "# #", "## #"))
    assert(m2 === Map(("#", "#") -> 0, ("##", "#") -> 1))
    // a duplicate merge pair would silently shift rank priority — loud
    val dup = intercept[IllegalArgumentException](
      Bpe.parseMerges(Seq("a b", "c d", "a b")))
    assert(dup.getMessage.contains("duplicate merge pair"))
    val hashModel = Bpe.Model(baseVocab ++ Map("##" -> 300, "###" -> 301), m2)
    assert(hashModel.encode("###").toSeq === Seq(301))
  }
}
