package graft.embed

import java.nio.charset.StandardCharsets

/** Pure-JVM WordPiece tokenizer over the PUBLIC vocab.txt format (one
  * token per line, line number = token id, `##`-prefixed continuation
  * pieces, `[UNK]` for out-of-vocabulary) — the greedy longest-match-first
  * algorithm BERT-family models publish.
  *
  * With a real vocab file, [[Embeddings.SafetensorsProvider]] upgrades
  * from hash-bucket bag-of-tokens to TRUE embedding lookup: token id
  * indexes the safetensors matrix row directly, exactly how the exported
  * embedding table is meant to be addressed. The transformer layers above
  * the embedding bag remain behind the provider trait (the documented
  * divergence — no ONNX runtime in this container).
  */
object WordPiece {

  final case class Vocab(ids: Map[String, Int], unkId: Int,
                         maxTokenChars: Int, maxId: Int) {
    def size: Int = ids.size
  }

  /** Parse a vocab.txt: line number = id. `[UNK]` must be present. Blank
    * lines keep their line number reserved (real vocab files ship them),
    * so ids can be SPARSE — [[Vocab.maxId]] is the bound an embedding
    * matrix must cover, NOT [[Vocab.size]] (review r12-3: a size-based
    * bound under-allocates and a late token id indexes past the rows). */
  def parseVocab(lines: Seq[String]): Vocab = {
    val entries = lines.iterator.zipWithIndex.filter(_._1.nonEmpty).toSeq
    // Fail loudly on duplicate tokens: toMap would silently keep the LAST
    // line's id, shifting every lookup of the earlier occurrence — the
    // same fail-loud contract as the other malformed-artifact checks here.
    val dups = entries.groupBy(_._1).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty,
      s"duplicate vocab token(s): ${dups.take(5).mkString(", ")}")
    val ids = entries.toMap
    require(ids.nonEmpty, "empty vocab")
    val unk = ids.getOrElse("[UNK]",
      throw new IllegalArgumentException("vocab has no [UNK] token"))
    Vocab(ids, unk, ids.keysIterator.map(_.length).max, ids.values.max)
  }

  def loadVocab(path: String): Vocab = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(path).toPath), StandardCharsets.UTF_8)
    parseVocab(raw.split("\n", -1).toSeq.map(_.stripSuffix("\r"))
      .reverse.dropWhile(_.isEmpty).reverse)
  }

  // Executor-shared vocab cache (one parse per JVM per path —
  // computeIfAbsent holds concurrent cold-starting partitions on the key).
  private[embed] val loadCount = new java.util.concurrent.atomic.AtomicLong
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[String, Vocab]()
  private[embed] def sharedVocab(path: String): Vocab =
    shared.computeIfAbsent(path, _ => {
      loadCount.incrementAndGet(); loadVocab(path)
    })
  def evictShared(path: String): Boolean = shared.remove(path) != null

  /** Greedy longest-match-first WordPiece of ONE whitespace word: repeatedly
    * take the longest vocab prefix (continuations carry the `##` prefix);
    * if no prefix matches at any position, the WHOLE word is `[UNK]` (the
    * published algorithm's all-or-nothing rule). */
  def tokenizeWord(word: String, v: Vocab): Seq[Int] = {
    if (word.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < word.length) {
      val prefix = if (start == 0) "" else "##"
      var end = math.min(word.length, start + v.maxTokenChars)
      var found = -1
      while (end > start && found < 0) {
        v.ids.get(prefix + word.substring(start, end)) match {
          case Some(id) => found = id
          case None => end -= 1
        }
      }
      if (found < 0) return Seq(v.unkId)
      out += found
      start = end
    }
    out.toSeq
  }

  /** Token ids of a whitespace-pre-split text. */
  def tokenize(text: String, v: Vocab): Seq[Int] =
    Option(text).getOrElse("").trim.split("\\s+").toSeq
      .filter(_.nonEmpty).flatMap(tokenizeWord(_, v))
}
