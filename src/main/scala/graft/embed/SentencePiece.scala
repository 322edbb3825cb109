package graft.embed

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** SentencePiece UNIGRAM tokenizer (Kudo 2018, "Subword Regularization" —
  * the published model family every LLaMA/GPT-NeoX-era checkpoint ships)
  * over the PUBLIC Hugging Face `tokenizer.json` artifact layout
  * (`{"model": {"type": "Unigram", "unk_id": N, "vocab": [[piece,
  * logprob], ...]}}` — piece id = position in the vocab array):
  *
  *  1. pre-tokenize on UNICODE whitespace (r18 — `(?U)\s+`, so U+00A0 /
  *     U+3000-separated text splits like ASCII-spaced text) and mark each
  *     word with the ▁ (U+2581) word-boundary prefix (SentencePiece's
  *     `add_dummy_prefix` + whitespace-delimited treatment — pieces never
  *     span a word boundary because ▁ appears only word-initially);
  *  2. VITERBI-segment each marked word: the piece sequence maximizing
  *     the sum of piece log-probs (the unigram decode — exact dynamic
  *     program, not greedy longest-match);
  *  3. a character no piece covers falls back to its UTF-8 BYTE pieces
  *     when the vocab ships them (`<0xNN>` — the Llama-family
  *     `byte_fallback` layout; byte pieces score at their vocab
  *     log-probs and, like the unk piece, are never matchable as literal
  *     text), else to one `unk_id` token at a score below every real
  *     piece (SentencePiece's unk penalty). A model with NO unk piece
  *     (`unk_id: null` — legal in the HF layout) and no byte coverage
  *     REJECTS un-coverable text loudly instead of mis-tokenizing it.
  *
  * SUPPORTED SUBSET (documented per ADVICE r17): whitespace runs are
  * treated as ONE boundary — pieces containing INTERNAL ▁ (multi-space /
  * indentation pieces, e.g. "▁▁" in code-tuned vocabs, or cross-word
  * pieces like "▁of▁the") can never match under the word-split
  * architecture. Checkpoints relying on those pieces tokenize correctly
  * but sub-optimally (their words segment through the remaining vocab);
  * single-boundary text — the gates' corpus class — reproduces the
  * checkpoint segmentation exactly.
  *
  * This closes the tokenizer gap behind the RoPE decoder
  * ([[Decoder]] — the GPT-NeoX/LLaMA checkpoint family tokenizes with
  * SentencePiece, not WordPiece/BPE; ref embeddings/src/model/local.rs
  * loads the checkpoint's own tokenizer the same way). Deterministic:
  * ties prefer the LONGEST piece (then the exact DP order), so a model
  * re-derivation reproduces stored token streams bit-for-bit.
  *
  * 100 TB design mirrors [[Bpe]]: the model loads ONCE per JVM
  * ([[sharedModel]]), tokenization is mapPartitions (no shuffle, no
  * driver round-trips), and a bounded per-JVM word cache turns the DP
  * into a map probe for the hot tail of a skewed corpus.
  */
object SentencePiece {

  /** The SentencePiece word-boundary marker (U+2581 LOWER ONE EIGHTH
    * BLOCK). */
  val WordBoundary: Char = '▁'

  /** Compiled once: `String.split(regex)` re-compiles its Pattern on
    * every call for multi-char regexes — per-document, that is one
    * Pattern.compile per row (r19 bench). */
  private val UnicodeWs = java.util.regex.Pattern.compile("(?U)\\s+")

  /** `unkId = -1` = the model ships NO unk piece (`unk_id: null` in the
    * HF layout, ADVICE r17): no unk arc exists, and text neither the
    * vocab nor the byte pieces cover is REJECTED — defaulting it to
    * piece 0 would silently mark that piece unmatchable and change the
    * segmentation of any text containing its literal string. */
  final case class Model(pieces: Array[String], scores: Array[Double],
                         unkId: Int) {
    require(pieces.nonEmpty, "empty unigram vocab")
    require(unkId == -1 || (unkId >= 0 && unkId < pieces.length),
      s"unk_id $unkId out of [0, ${pieces.length}) (or -1 = none)")
    // byte-fallback pieces (<0xNN> — the Llama-family layout): byte
    // value → piece id. Like the unk piece they are IDs, not matchable
    // text (SentencePiece types them BYTE, never TEXT).
    @transient private lazy val byteIds: Map[Int, Int] = {
      val re = "^<0x([0-9A-Fa-f]{2})>$".r
      pieces.zipWithIndex.flatMap {
        case (re(h), i) => Some(Integer.parseInt(h, 16) -> i)
        case _ => None
      }.toMap
    }
    // the unk piece is an ID, not matchable text (SentencePiece treats
    // UNKNOWN-type pieces the same way): a document containing the
    // literal "<unk>" string must segment through chars/unk arcs, never
    // match the piece — its score (often 0.0, the best in the vocab)
    // would otherwise hijack the Viterbi (review r17-2-1)
    @transient private lazy val ids: Map[String, Int] = {
      val excluded = byteIds.values.toSet
      pieces.zipWithIndex
        .filter { case (_, i) => i != unkId && !excluded.contains(i) }
        .toMap
    }
    @transient private lazy val maxPieceLen: Int =
      pieces.iterator.map(_.length).max
    /** Largest piece id — [[Decoder]]'s embedding-row bound check. */
    def maxId: Int = pieces.length - 1
    // unknown-CODEPOINT arc: below every real piece (the SentencePiece
    // unk penalty), so a known covering always wins when one exists
    @transient private lazy val unkScore: Double = scores.min - 10.0

    // word cache: marked word → ids. Bounded (reset at cap) — a
    // skew-heavy corpus cannot grow it without bound (the Bpe contract).
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    private val CacheCap = 65536

    /** Exact unigram Viterbi over one ▁-marked word: best[i] = max score
      * covering the prefix of length i; arcs are vocab pieces ending at i
      * (longest-first on ties) plus — for a codepoint no piece covers —
      * its UTF-8 byte-piece arc (when the vocab ships <0xNN> pieces,
      * scored at their vocab log-probs) or the single-codepoint unk arc.
      * A model with neither (unk_id: null, no byte pieces) rejects
      * un-coverable text. */
    def segment(marked: String): Array[Int] = {
      val cached = cache.get(marked)
      if (cached != null) return cached
      val n = marked.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = new Array[Int](n + 1) // arc start
      val piece = new Array[Int](n + 1) // arc piece id (unkId for unk arc)
      // byte-fallback arcs emit SEVERAL ids per arc — parallel store
      var fb: Array[Array[Int]] = null
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        // a position splitting a surrogate pair is not a codepoint
        // boundary: no arc may end there (review r17-2-2 — a non-BMP
        // char must become ONE unk token, not one per UTF-16 half)
        val midPair = i < n && Character.isHighSurrogate(marked.charAt(i - 1)) &&
          Character.isLowSurrogate(marked.charAt(i))
        if (!midPair) {
          // longest piece first: on equal score the longer piece wins
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            if (best(j) != Double.NegativeInfinity) {
              ids.get(marked.substring(j, i)) match {
                case Some(pid) =>
                  val s = best(j) + scores(pid)
                  if (s > best(i)) { best(i) = s; back(i) = j; piece(i) = pid }
                case None =>
              }
            }
            j += 1
          }
          if (best(i) == Double.NegativeInfinity) {
            // no piece ends here: cover the codepoint ending at i (two
            // UTF-16 units for a surrogate pair) through byte pieces
            // when available (the SentencePiece byte_fallback contract),
            // else one unk arc. −inf propagates through either (a
            // position only a longer piece can span stays unreachable
            // until that piece's end).
            val w = if (i >= 2 && Character.isLowSurrogate(marked.charAt(i - 1)) &&
              Character.isHighSurrogate(marked.charAt(i - 2))) 2 else 1
            val bytes =
              if (byteIds.isEmpty) null
              // a LONE surrogate (malformed upstream decode) must become
              // the U+FFFD replacement bytes — String.getBytes(UTF_8)
              // substitutes '?' (0x3F) for unmappable chars, which would
              // silently tokenize garbage as a literal question mark;
              // real SentencePiece works on UTF-8 and emits EF BF BD
              else if (w == 1 && Character.isSurrogate(marked.charAt(i - 1)))
                Array(0xEF.toByte, 0xBF.toByte, 0xBD.toByte)
              else marked.substring(i - w, i)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            if (bytes != null && bytes.forall(b => byteIds.contains(b & 0xff))) {
              var s = best(i - w)
              val arcIds = new Array[Int](bytes.length)
              var bi = 0
              while (bi < bytes.length) {
                val pid = byteIds(bytes(bi) & 0xff)
                s += scores(pid); arcIds(bi) = pid; bi += 1
              }
              best(i) = s; back(i) = i - w
              if (fb == null) fb = new Array[Array[Int]](n + 1)
              fb(i) = arcIds
            } else if (unkId >= 0) {
              best(i) = best(i - w) + unkScore
              back(i) = i - w
              piece(i) = unkId
            }
          }
        }
        i += 1
      }
      require(n == 0 || best(n) != Double.NegativeInfinity,
        s"unigram model cannot cover '$marked': the vocab lacks pieces " +
          "for some characters and the model has neither byte-fallback " +
          "pieces (<0xNN>) nor an unk_id")
      val out = Array.newBuilder[Int]
      val rev = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var p = n
      while (p > 0) {
        rev += (if (fb != null && fb(p) != null) fb(p) else Array(piece(p)))
        p = back(p)
      }
      rev.reverseIterator.foreach(out ++= _)
      val arr = out.result()
      if (cache.size >= CacheCap) cache.clear()
      cache.put(marked, arr)
      arr
    }

    /** Token ids of `text`: UNICODE-whitespace words ((?U)\s — NBSP,
      * ideographic space, NEL all split; r18 ADVICE), each ▁-marked and
      * Viterbi-segmented. Empty/whitespace-only text → no tokens. */
    def encode(text: String): Array[Int] =
      UnicodeWs.split(Option(text).getOrElse("").strip).iterator
        .filter(_.nonEmpty)
        .flatMap(w => segment(WordBoundary + w))
        .toArray

    def countTokens(text: String): Int = {
      var n = 0
      UnicodeWs.split(Option(text).getOrElse("").strip).iterator
        .filter(_.nonEmpty)
        .foreach(w => n += segment(WordBoundary + w).length)
      n
    }
  }

  // ------------------------------------------------------------ artifacts

  /** Whether a tokenizer.json carries a Unigram model — [[graft.embed.Decoder]]
    * consults this before parsing, so a checkpoint shipping a DIFFERENT
    * tokenizer family's tokenizer.json (BPE-type is common) falls back to
    * its vocab.txt/hash tokenization instead of failing to load. */
  def isUnigramJson(json: String): Boolean =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(json)
      if (root == null || !root.isObject) false
      else {
        val model = if (root.has("model")) root.get("model") else root
        Option(model.get("type")).exists(_.asText() == "Unigram")
      }
    } catch { case _: Exception => false }

  /** Parse the HF `tokenizer.json` Unigram layout: the model node is
    * either the root's `model` field or the root itself (a bare model
    * dump); `vocab` is the [[piece, score]] array whose POSITIONS are the
    * ids. */
  def parseTokenizerJson(json: String): Model = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    require(root != null && root.isObject, "tokenizer.json is not an object")
    val model = if (root.has("model")) root.get("model") else root
    val tpe = Option(model.get("type")).map(_.asText()).getOrElse("")
    require(tpe == "Unigram",
      s"tokenizer.json model type '$tpe' is not Unigram")
    val vocabNode = model.get("vocab")
    require(vocabNode != null && vocabNode.isArray,
      "tokenizer.json Unigram model has no vocab array")
    val pieces = Array.newBuilder[String]
    val scores = Array.newBuilder[Double]
    vocabNode.forEach { entry =>
      require(entry.isArray && entry.size == 2 && entry.get(0).isTextual &&
        entry.get(1).isNumber,
        s"vocab entry is not [piece, score]: $entry")
      pieces += entry.get(0).asText()
      scores += entry.get(1).asDouble()
    }
    val ps = pieces.result()
    require(ps.toSet.size == ps.length,
      "tokenizer.json vocab has duplicate pieces")
    // HF allows unk_id: null (and absence) — that means NO unk piece
    // (sentinel -1, no unk arc), NOT piece 0: defaulting to 0 would
    // silently mark piece 0 unmatchable and change the segmentation of
    // text containing its literal string (ADVICE r17)
    val unkNode = model.get("unk_id")
    val unkId =
      if (unkNode == null || unkNode.isNull) -1 else unkNode.asInt()
    Model(ps, scores.result(), unkId)
  }

  /** Load `tokenizer.json` from a directory (or the SparkFiles shipping
    * fallback, as [[Bpe.load]]). */
  def load(dir: String): Model = {
    val f0 = new java.io.File(dir)
    val f =
      if (f0.isDirectory) f0
      else new java.io.File(org.apache.spark.SparkFiles.get(f0.getName))
    val tf = new java.io.File(f, "tokenizer.json")
    if (!tf.isFile)
      throw new java.io.FileNotFoundException(
        s"unigram artifact not found under $dir (need tokenizer.json)")
    parseTokenizerJson(java.nio.file.Files.readString(tf.toPath))
  }

  /** Write a tokenizer.json (fixture/gate artifacts): vocab array order =
    * id order. */
  def writeModel(dir: String, vocab: Seq[(String, Double)],
                 unkId: Int = 0): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val model = root.putObject("model")
    model.put("type", "Unigram")
    if (unkId == -1) model.putNull("unk_id") // the no-unk-piece layout
    else model.put("unk_id", unkId)
    val arr = model.putArray("vocab")
    vocab.foreach { case (p, s) =>
      val e = arr.addArray(); e.add(p); e.add(s)
    }
    java.nio.file.Files.write(new java.io.File(d, "tokenizer.json").toPath,
      om.writeValueAsBytes(root))
  }

  // one load per dir per JVM — the Bpe.sharedModel lifecycle (and the
  // same computeIfAbsent single-read guarantee under concurrent tasks)
  private[embed] val loadCount = new java.util.concurrent.atomic.AtomicLong
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()
  def sharedModel(dir: String): Model =
    shared.computeIfAbsent(dir, _ => { loadCount.incrementAndGet(); load(dir) })
  def evictShared(dir: String): Boolean = shared.remove(dir) != null

  // --------------------------------------------------------------- stage

  /** Append real unigram token ids (`idsCol: array<int>`, optional)
    * and/or the token count (`countCol: int`, optional) for `textCol` —
    * the [[Bpe.tokenizeStage]] contract for the SentencePiece family. */
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
