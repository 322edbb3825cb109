package graft.embed

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SentencePiece unigram (r17): exact Viterbi decode, artifact
  * round-trip, unk fallback, and the decoder-checkpoint tokenizer flip. */
class SentencePieceSpec extends AnyFunSuite {

  // ids: 0=<unk>, 1=▁the, 2=▁of, 3=▁, 4=a, 5=b, 6=t, 7=h, 8=e, 9=o, 10=f,
  // 11=ab (a multi-char piece to exercise mid-word DP choices)
  private val vocab: Seq[(String, Double)] = Seq(
    "<unk>" -> 0.0, "▁the" -> -3.0, "▁of" -> -3.0, "▁" -> -10.0,
    "a" -> -10.0, "b" -> -10.0, "t" -> -10.0, "h" -> -10.0, "e" -> -10.0,
    "o" -> -10.0, "f" -> -10.0, "ab" -> -12.0)
  private val m = SentencePiece.Model(
    vocab.map(_._1).toArray, vocab.map(_._2).toArray, unkId = 0)

  test("viterbi picks the max-logprob cover, not greedy/char fallback") {
    // "▁the" (one -3 piece) beats ▁+t+h+e (-40)
    assert(m.segment("▁the").toSeq === Seq(1))
    // "▁thea": ▁the + a
    assert(m.segment("▁thea").toSeq === Seq(1, 4))
    // "▁ab": ▁(-10)+ab(-12)=-22 beats ▁+a+b=-30
    assert(m.segment("▁ab").toSeq === Seq(3, 11))
    // "▁of": the -3 piece
    assert(m.segment("▁of").toSeq === Seq(2))
  }

  test("unknown characters become unk tokens and decoding completes") {
    // 'z' has no piece: ▁ + unk + a
    assert(m.segment("▁za").toSeq === Seq(3, 0, 4))
    assert(m.encode("z").toSeq === Seq(3, 0))
    // the unk piece is an ID, not matchable text: a literal "<unk>"
    // substring segments through chars/unk arcs — its (best-in-vocab)
    // score 0.0 must never hijack the DP (review r17)
    assert(m.segment("▁<unk>").toSeq === Seq(3, 0, 0, 0, 0, 0))
    // one unk token per CODEPOINT: a non-BMP char (2 UTF-16 units) is
    // ONE token, matching SentencePiece's codepoint semantics
    assert(m.encode("a\uD83D\uDE00b").toSeq === Seq(3, 4, 0, 5))
  }

  test("encode marks every whitespace word; empty text yields no tokens") {
    assert(m.encode("the of").toSeq === Seq(1, 2))
    assert(m.encode("  the \n of ").toSeq === Seq(1, 2))
    assert(m.encode("").isEmpty && m.encode(null).isEmpty)
    assert(m.countTokens("the ab") === 1 + 2)
  }

  test("tokenizer.json round-trip preserves ids, scores, unk_id") {
    val dir = Files.createTempDirectory("graft-spm").toString
    SentencePiece.writeModel(dir, vocab, unkId = 0)
    val loaded = SentencePiece.load(dir)
    assert(loaded.pieces.toSeq === vocab.map(_._1))
    assert(loaded.scores.toSeq === vocab.map(_._2))
    assert(loaded.unkId === 0)
    assert(loaded.encode("the ab").toSeq === m.encode("the ab").toSeq)
  }

  test("parse rejects non-unigram and malformed vocab entries") {
    intercept[IllegalArgumentException](SentencePiece.parseTokenizerJson(
      """{"model":{"type":"BPE","vocab":[]}}"""))
    intercept[IllegalArgumentException](SentencePiece.parseTokenizerJson(
      """{"model":{"type":"Unigram","vocab":[["a",-1],["a",-2]]}}"""))
    // the Decoder loader consults this before parsing: a BPE-type
    // tokenizer.json beside decoder weights must FALL BACK, not abort
    // the checkpoint (review r17-1)
    assert(!SentencePiece.isUnigramJson("""{"model":{"type":"BPE"}}"""))
    assert(!SentencePiece.isUnigramJson("not json at all"))
    assert(SentencePiece.isUnigramJson(
      """{"model":{"type":"Unigram","vocab":[["a",-1]]}}"""))
  }

  test("a tokenizer.json beside decoder weights flips tokenization to unigram") {
    import graft.SparkT
    val spark = SparkT.spark
    import spark.implicits._
    // reuse the gate's checkpoint via the registry path: a small inline
    // fixture — weights from DecoderSpec's layout would be heavy; instead
    // assert the ids stage end-to-end through tokenizeStage
    val dir = Files.createTempDirectory("graft-spm2").toString
    SentencePiece.writeModel(dir, vocab, unkId = 0)
    val df = Seq((1L, "the ab"), (2L, ""), (3L, "zzz")).toDF("id", "text")
    val out = SentencePiece.tokenizeStage(df, "text", dir,
        idsCol = "ids", countCol = "n")
      .select($"id", $"ids", $"n").as[(Long, Seq[Int], Int)]
      .collect().sortBy(_._1)
    assert(out(0)._2 === Seq(1, 3, 11) && out(0)._3 === 3)
    assert(out(1)._2 === Seq.empty && out(1)._3 === 0)
    assert(out(2)._2 === Seq(3, 0, 0, 0) && out(2)._3 === 4)
  }

  // ───────────────────── r18 (ADVICE r17) fidelity fixes ─────────────────────

  test("byte-fallback pieces cover uncovered chars at their vocab scores (Llama layout)") {
    // 'é' = UTF-8 0xC3 0xA9; '€' = 0xE2 0x82 0xAC — no text piece covers
    // either, but the vocab ships their byte pieces, so they segment to
    // byte ids instead of unk (ids 12.. appended to the shared vocab)
    val v2 = vocab ++ Seq("<0xC3>" -> -20.0, "<0xA9>" -> -20.0,
      "<0xE2>" -> -21.0, "<0x82>" -> -21.0, "<0xAC>" -> -21.0)
    val mb = SentencePiece.Model(
      v2.map(_._1).toArray, v2.map(_._2).toArray, unkId = 0)
    assert(mb.segment("▁é").toSeq === Seq(3, 12, 13))
    assert(mb.encode("a€b").toSeq === Seq(3, 4, 14, 15, 16, 5))
    // a char whose bytes the vocab only PARTIALLY covers still unks
    // ('ü' = 0xC3 0xBC — 0xBC is missing)
    assert(mb.segment("▁ü").toSeq === Seq(3, 0))
    // byte pieces are IDs, not matchable text: the literal string
    // "<0xC3>" segments through chars/unk, never matches the piece
    assert(!mb.segment("▁<0xC3>").contains(12))
    // real text pieces still beat byte arcs (fallback only fires when
    // NO piece ends at the position)
    assert(mb.segment("▁the").toSeq === Seq(1))
  }

  test("unk_id null/absent means NO unk piece — piece 0 stays matchable, uncoverable text rejects") {
    // null unk_id: piece 0 is an ordinary matchable piece
    val m0 = SentencePiece.parseTokenizerJson(
      """{"model":{"type":"Unigram","unk_id":null,""" +
        """"vocab":[["ab",-1.0],["a",-2.0],["b",-2.0]]}}""")
    assert(m0.unkId === -1)
    assert(m0.segment("ab").toSeq === Seq(0)) // piece 0 matches its text
    // absent unk_id behaves the same
    val m1 = SentencePiece.parseTokenizerJson(
      """{"model":{"type":"Unigram","vocab":[["ab",-1.0],["a",-2.0]]}}""")
    assert(m1.unkId === -1)
    // with no unk arc and no byte pieces, uncoverable text REJECTS
    // loudly instead of silently mis-tokenizing
    intercept[IllegalArgumentException](m0.segment("az"))
    // writeModel round-trips the sentinel as a JSON null
    val dir = Files.createTempDirectory("graft-spm-null").toString
    SentencePiece.writeModel(dir, Seq("ab" -> -1.0, "a" -> -2.0), unkId = -1)
    assert(SentencePiece.load(dir).unkId === -1)
  }

  test("unicode whitespace pre-tokenizes like ASCII whitespace") {
    // NBSP (U+00A0), ideographic space (U+3000), NEL (U+0085): all split
    val want = m.encode("the of").toSeq
    assert(m.encode("the\u00A0of").toSeq === want)
    assert(m.encode("the\u3000of").toSeq === want)
    assert(m.encode("the\u0085of").toSeq === want)
    assert(m.encode("\u3000 the \u00A0 of \u3000").toSeq === want)
  }

  test("a lone surrogate byte-falls-back to U+FFFD replacement bytes, " +
      "never the literal '?' piece (r18 review)") {
    // String.getBytes(UTF_8) substitutes '?' (0x3F) for an unpaired
    // surrogate -- with a <0x3F> piece in the vocab, garbage would
    // silently tokenize as a question mark; real SentencePiece works on
    // UTF-8 and emits the U+FFFD bytes EF BF BD
    val v2 = vocab ++ Seq("<0x3F>" -> -20.0,
      "<0xEF>" -> -21.0, "<0xBF>" -> -21.0, "<0xBD>" -> -21.0)
    val n = vocab.length
    val mb = SentencePiece.Model(
      v2.map(_._1).toArray, v2.map(_._2).toArray, unkId = 0)
    val lone = "\uD800" // unpaired high surrogate
    val got = mb.segment("\u2581" + lone).toSeq
    assert(got.drop(1) === Seq(n + 1, n + 2, n + 3), got) // EF BF BD pieces
    assert(!got.contains(n), got) // never the '?' piece
    // a REAL '?' still takes the <0x3F> byte arc (no text piece covers it)
    assert(mb.segment("\u2581?").toSeq.contains(n))
    // with the replacement bytes NOT in the vocab, the lone surrogate
    // unks instead of matching <0x3F>
    val v3 = vocab ++ Seq("<0x3F>" -> -20.0)
    val m3 = SentencePiece.Model(
      v3.map(_._1).toArray, v3.map(_._2).toArray, unkId = 0)
    assert(m3.segment("\u2581" + lone).toSeq.drop(1) === Seq(0))
  }
}
