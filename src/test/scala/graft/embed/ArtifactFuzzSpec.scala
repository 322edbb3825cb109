package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-bytes robustness for the artifact parsers: random
  * corruptions of valid files must fail CLEANLY (typed exception) or
  * parse to consistent data — never hang, crash the JVM, or silently
  * misread. (The same contract the multimodal decoders pin for media
  * bytes; these parsers gate model loads instead of row decodes, so a
  * clean loud failure is the right outcome.) */
class ArtifactFuzzSpec extends AnyFunSuite {

  private def tmpDir = java.nio.file.Files.createTempDirectory("graft-fuzz")

  test("safetensors: random byte corruption never escapes as a non-typed failure") {
    val dir = tmpDir
    val path = dir.resolve("m.safetensors").toString
    Safetensors.write(path, Seq(
      "a" -> Safetensors.Tensor(Seq(4, 3), Array.tabulate(12)(_.toFloat)),
      "b" -> Safetensors.Tensor(Seq(5), Array.tabulate(5)(_ * 0.5f))))
    val valid = java.nio.file.Files.readAllBytes(new java.io.File(path).toPath)
    val rnd = new scala.util.Random(31)
    var cleanParses = 0
    var cleanRejects = 0
    (0 until 300).foreach { i =>
      val corrupted = valid.clone()
      // flip 1..4 random bytes (header, offsets, or data section)
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt(256).toByte
      }
      val p = dir.resolve(s"c$i.safetensors").toString
      java.nio.file.Files.write(new java.io.File(p).toPath, corrupted)
      try {
        val ts = Safetensors.readAll(p)
        // parsed despite corruption (e.g. a data-section flip): shapes
        // must still be consistent with the data lengths
        ts.values.foreach(t => assert(t.shape.product == t.data.length))
        cleanParses += 1
      } catch {
        // the allowed CLEAN failures — anything else (NPE, OOB, hang)
        // fails the test by escaping this catch
        case _: IllegalArgumentException => cleanRejects += 1
        case _: IllegalStateException => cleanRejects += 1
        case _: com.fasterxml.jackson.core.JacksonException =>
          cleanRejects += 1
      }
    }
    // data-section flips should parse fine; header flips should reject —
    // BOTH outcomes must occur across 300 corruptions, or the validation
    // (or the fuzz itself) has regressed
    assert(cleanParses > 0 && cleanRejects > 0,
      s"parses=$cleanParses rejects=$cleanRejects")
  }

  test("truncations of a valid safetensors file fail cleanly at every length") {
    val dir = tmpDir
    val path = dir.resolve("m.safetensors").toString
    Safetensors.write(path, Seq(
      "a" -> Safetensors.Tensor(Seq(3, 3), Array.tabulate(9)(_.toFloat))))
    val valid = java.nio.file.Files.readAllBytes(new java.io.File(path).toPath)
    (0 until valid.length).foreach { len =>
      val p = dir.resolve(s"t$len.safetensors").toString
      java.nio.file.Files.write(new java.io.File(p).toPath,
        java.util.Arrays.copyOf(valid, len))
      intercept[Exception] { // must throw (typed), never succeed or hang
        Safetensors.readTensor(p, "a")
      } match {
        case _: IllegalArgumentException | _: IllegalStateException => ()
        case _: com.fasterxml.jackson.core.JacksonException => ()
        case other => fail(s"len $len: untyped failure $other")
      }
    }
  }

  test("BPE artifacts: malformed vocab.json / merges.txt fail loudly, never misparse") {
    intercept[Exception](Bpe.parseVocabJson("not json"))
    intercept[IllegalArgumentException](Bpe.parseVocabJson("[1, 2]"))
    intercept[IllegalArgumentException](
      Bpe.parseVocabJson("""{"a": 1, "b": 1}""")) // duplicate ids
    intercept[IllegalArgumentException](
      Bpe.parseVocabJson("""{"a": 1.5}""")) // non-int id
    intercept[IllegalArgumentException](Bpe.parseMerges(Seq("a b extra")))
    intercept[IllegalArgumentException](Bpe.parseMerges(Seq("single")))
    // random printable garbage in merges: every line either parses as a
    // pair or throws IllegalArgumentException
    val rnd = new scala.util.Random(17)
    (0 until 200).foreach { _ =>
      val line = (0 until rnd.nextInt(12))
        .map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      try { Bpe.parseMerges(Seq(line)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("WordPiece vocab: blank-heavy and duplicate files behave per contract") {
    // sparse ids via blank lines: max id drives the bound
    val v = WordPiece.parseVocab(Seq("[UNK]", "", "", "tok"))
    assert(v.ids("tok") === 3 && v.maxId === 3 && v.size === 2)
    // whitespace-only tokens are NOT blank lines — they are real tokens
    val vw = WordPiece.parseVocab(Seq("[UNK]", " "))
    assert(vw.ids(" ") === 1)
    intercept[IllegalArgumentException](WordPiece.parseVocab(Seq.empty))
  }
}
