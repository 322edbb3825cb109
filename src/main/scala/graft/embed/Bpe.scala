package graft.embed

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Byte-level BPE tokenizer over the PUBLIC GPT-2 artifact format
  * (`vocab.json` + `merges.txt` — the openai/gpt-2 `encoder.py` algorithm
  * every BPE-family checkpoint ships):
  *
  *  1. pre-tokenize with the published GPT-2 regex (contractions, letter
  *     runs, digit runs, punctuation runs — each with an optional leading
  *     space);
  *  2. map each pre-token's UTF-8 bytes through the published
  *     bytes→unicode table (so arbitrary bytes are representable and
  *     there is NO unknown token);
  *  3. repeatedly merge the LOWEST-RANK adjacent symbol pair (all its
  *     occurrences per pass) until no listed pair remains;
  *  4. look the final symbols up in vocab.json.
  *
  * This makes the packing/mixture surface's token accounting REAL:
  * [[tokenizeStage]] feeds `Pack`/`Mix.byBudget` with the counts a
  * GPT-family trainer would see, not whitespace approximations.
  * (Brief-driven; no reference analog — the reference's tokenizers live
  * inside its embedding models.)
  *
  * 100 TB design: the model (vocab + ranks) loads ONCE per JVM and is
  * shared by every partition's stage ([[sharedModel]], the same lifecycle
  * as the other embed artifacts); tokenization itself is mapPartitions —
  * no shuffle, no driver round-trips — with a bounded per-JVM token cache
  * (real corpora repeat words; the cache turns the merge loop into a map
  * probe for the hot tail).
  */
object Bpe {

  /** The published bytes→unicode map: printable latin-1 bytes keep their
    * codepoint; the rest shift to 256+n in scan order (gpt-2 encoder.py
    * `bytes_to_unicode`). */
  val byteEncoder: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val enc = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) enc(b) = b.toChar
      else { enc(b) = (256 + n).toChar; n += 1 }
    }
    enc
  }

  /** UTF-8 bytes of `s`, mapped through [[byteEncoder]]. */
  def encodeBytes(s: String): String = {
    val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](raw.length)
    var i = 0
    while (i < raw.length) { out(i) = byteEncoder(raw(i) & 0xFF); i += 1 }
    new String(out)
  }

  /** The published GPT-2 pre-tokenizer pattern (encoder.py `pat`). */
  private val pretokenPattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  def pretokenize(text: String): Seq[String] = {
    val m = pretokenPattern.matcher(text)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  final case class Model(vocab: Map[String, Int],
                         ranks: Map[(String, String), Int]) {
    require(vocab.nonEmpty, "empty vocab.json")
    // tokenization cache: byte-encoded pre-token → ids. Bounded (reset at
    // cap) — a skew-heavy corpus cannot grow it without bound.
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    private val CacheCap = 65536

    /** BPE merge loop over one byte-encoded pre-token: merge every
      * occurrence of the lowest-rank adjacent pair, repeat until no listed
      * pair remains (encoder.py `bpe`). */
    def symbols(token: String): Vector[String] = {
      var w: Vector[String] = token.map(_.toString).toVector
      var done = w.length < 2
      while (!done) {
        var bi = -1
        var br = Int.MaxValue
        var i = 0
        while (i < w.length - 1) {
          val r = ranks.getOrElse((w(i), w(i + 1)), Int.MaxValue)
          if (r < br) { br = r; bi = i }
          i += 1
        }
        if (bi < 0 || br == Int.MaxValue) done = true
        else {
          val (a, b) = (w(bi), w(bi + 1))
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
              nb += a + b; j += 2
            } else { nb += w(j); j += 1 }
          }
          w = nb.result()
          if (w.length < 2) done = true
        }
      }
      w
    }

    private def idsOf(encoded: String): Array[Int] = {
      val cached = cache.get(encoded)
      if (cached != null) return cached
      val ids = symbols(encoded).map { sym =>
        vocab.getOrElse(sym, throw new IllegalStateException(
          s"BPE symbol '$sym' missing from vocab.json — the artifact pair " +
            "is inconsistent (merges produce symbols the vocab lacks)"))
      }.toArray
      if (cache.size >= CacheCap) cache.clear()
      cache.put(encoded, ids)
      ids
    }

    def encode(text: String): Array[Int] =
      pretokenize(Option(text).getOrElse(""))
        .iterator.flatMap(t => idsOf(encodeBytes(t))).toArray

    def countTokens(text: String): Int = {
      var n = 0
      pretokenize(Option(text).getOrElse(""))
        .foreach(t => n += idsOf(encodeBytes(t)).length)
      n
    }
  }

  // ------------------------------------------------------------ artifacts

  def parseVocabJson(json: String): Map[String, Int] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    require(root != null && root.isObject, "vocab.json is not a JSON object")
    val b = Map.newBuilder[String, Int]
    root.fields().forEachRemaining { e =>
      require(e.getValue.isInt, s"vocab.json id for '${e.getKey}' not an int")
      b += e.getKey -> e.getValue.intValue()
    }
    val m = b.result()
    require(m.values.toSet.size == m.size, "vocab.json has duplicate ids")
    m
  }

  /** merges.txt: an optional LEADING `#version` header line, then one
    * `A B` pair per line, line order = rank. Only that first header line
    * is skipped — real GPT-2 merge lines can legitimately START with `#`
    * (the merges that build the `##`/`####` tokens), so a blanket
    * comment-strip would silently delete them and shift every rank.
    * Malformed lines fail loudly. */
  def parseMerges(lines: Seq[String]): Map[(String, String), Int] = {
    val noHeader = lines match {
      case h +: t if h.startsWith("#version") => t
      case other => other
    }
    val body = noHeader.filterNot(_.trim.isEmpty)
    val ranked = body.zipWithIndex.map { case (l, rank) =>
      val parts = l.split(" ")
      require(parts.length == 2,
        s"merges.txt line ${rank + 1} is not 'A B': '$l'")
      (parts(0), parts(1)) -> rank
    }
    // A duplicate pair line would let the LAST rank silently win under
    // toMap, shifting merge priority — fail loudly like the duplicate-id
    // checks in parseVocabJson / WordPiece.parseVocab.
    val dup = ranked.groupBy(_._1).collectFirst { case (p, rs) if rs.size > 1 => p }
    require(dup.isEmpty, s"merges.txt has a duplicate merge pair: ${dup.get}")
    ranked.toMap
  }

  /** Load `vocab.json` + `merges.txt` from a directory; absent local paths
    * fall back to SparkFiles (the cluster artifact-shipping pattern). */
  def load(dir: String): Model = {
    val f0 = new java.io.File(dir)
    val f =
      if (f0.isDirectory) f0
      else new java.io.File(org.apache.spark.SparkFiles.get(f0.getName))
    val vf = new java.io.File(f, "vocab.json")
    val mf = new java.io.File(f, "merges.txt")
    if (!vf.isFile || !mf.isFile)
      throw new java.io.FileNotFoundException(
        s"BPE artifacts not found under $dir (need vocab.json + merges.txt)")
    val vocab = parseVocabJson(java.nio.file.Files.readString(vf.toPath))
    val merges = parseMerges(
      java.nio.file.Files.readAllLines(mf.toPath).toArray(Array.empty[String])
        .toSeq)
    Model(vocab, merges)
  }

  /** Write a vocab.json + merges.txt pair (fixture/gate artifacts). */
  def writeModel(dir: String, vocab: Map[String, Int],
                 merges: Seq[(String, String)]): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    vocab.toSeq.sortBy(_._2).foreach { case (k, v) => root.put(k, v) }
    java.nio.file.Files.write(new java.io.File(d, "vocab.json").toPath,
      om.writeValueAsBytes(root))
    java.nio.file.Files.write(new java.io.File(d, "merges.txt").toPath,
      ("#version: 0.2\n" + merges.map { case (a, b) => s"$a $b" }
        .mkString("\n") + "\n").getBytes("UTF-8"))
  }

  // one load per (dir) per JVM — shared across partitions and stages.
  // ConcurrentHashMap.computeIfAbsent holds concurrent partitions on the
  // key, so the artifact is read exactly once even when a stage's tasks
  // all cold-start together (TrieMap.getOrElseUpdate would re-evaluate).
  private[embed] val loadCount = new java.util.concurrent.atomic.AtomicLong
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()
  def sharedModel(dir: String): Model =
    shared.computeIfAbsent(dir, _ => { loadCount.incrementAndGet(); load(dir) })
  def evictShared(dir: String): Boolean = shared.remove(dir) != null

  // --------------------------------------------------------------- stage

  /** Append real BPE token ids (`idsCol: array<int>`, optional) and/or the
    * token count (`countCol: int`, optional) for `textCol`. mapPartitions,
    * model shared per JVM — the token accounting feed for Pack/Mix. */
  def tokenizeStage(df: DataFrame, textCol: String, modelDir: String,
                    idsCol: String = null, countCol: String = null): DataFrame = {
    require(idsCol != null || countCol != null,
      "tokenizeStage needs idsCol and/or countCol")
    var schema = df.schema
    if (idsCol != null)
      schema = schema.add(StructField(idsCol, ArrayType(IntegerType)))
    if (countCol != null)
      schema = schema.add(StructField(countCol, IntegerType))
    val textIdx = df.schema.fieldIndex(textCol)
    val (wantIds, wantCount) = (idsCol != null, countCol != null)
    df.mapPartitions { it =>
      val m = sharedModel(modelDir)
      it.map { r =>
        val ids = m.encode(r.getString(textIdx))
        var out = r.toSeq
        if (wantIds) out = out :+ (ids.toSeq: Seq[Int])
        if (wantCount) out = out :+ ids.length
        Row.fromSeq(out)
      }
    }(Encoders.row(schema))
  }
}
