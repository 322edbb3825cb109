package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the LLM-pipeline surface (BASELINE
  * brief; no reference implementation to cite — designed Spark-first):
  * tokenization, n-gram shingles, language ID, quality scoring, and a
  * rolling-hash document fingerprint.
  *
  * All functions are Catalyst expression trees; as of r21 the hot ones are
  * kernel-backed CODEGEN expressions ([[TextKernels]], the
  * [[graft.vector.Distances]] pattern): the original
  * higher-order-function forms are CodegenFallback in Spark — every element
  * evaluation walks an interpreted tree (~µs per element), which dominated
  * the corpus-sweep queries — while the kernel forms make ONE static JIT'd
  * call per row inside whole-stage codegen. Each original tree lives on as
  * a `*Tree` twin; TextKernelsSpec pins kernel == tree bit-for-bit
  * (including null/empty/whitespace/unicode edges), and every function
  * keeps an exactly-equivalent DuckDB SQL form used by the oracle gates.
  *
  * Determinism conventions: float scores are emitted as floor(score * 1e6)
  * micro-units (floor of identical IEEE doubles is engine-stable, unlike
  * round), and the rolling hash is computed mod 1e9+7 at every step so the
  * accumulator never overflows (Spark 4 runs ANSI mode: Long overflow
  * throws).
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text. Empty/whitespace-only text
    * yields an empty array (the raw split would yield [""]); null → null. */
  def tokens(c: Column): Column = textKernels.tokens(c)

  /** The original expression tree of [[tokens]] (spec twin). */
  private[pipeline] def tokensTree(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** BPE-ish lexer tokens: alphanumeric runs or single punctuation marks. */
  def byteishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles (the MinHash input). Documents shorter
    * than n tokens — and null documents — yield an empty array. */
  def shingles(c: Column, n: Int): Column =
    coalesce(textKernels.shingles(c, n),
      lit(Array.empty[String]).cast("array<string>"))

  /** The original expression tree of [[shingles]] (spec twin).
    *
    * The token array is BOUND to a lambda variable (transform over a
    * 1-element array) so tokenization runs once per row — naively
    * referencing `tokens(c)` inside the per-shingle lambda would re-inline
    * the split() subtree into every element evaluation (measured 20x+ cost
    * on the shingle corpus query). */
  private[pipeline] def shinglesTree(c: Column, n: Int): Column =
    element_at(transform(array(tokensTree(c)), w =>
      when(size(w) >= n,
        array_distinct(transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*))))
        .otherwise(array().cast("array<string>"))), 1)

  /** Language-marker stopword sets (tiny, deterministic n-gram-free
    * heuristic — scorable identically in SQL). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est"),
    "es" -> Seq("el", "los", "y", "es")
  )

  /** Predicted language: argmax of marker hits over distinct tokens with a
    * fixed tie order (en > de > fr > es), 'und' when nothing matches.
    * NULL text → 'und' (the tree's otherwise-arm semantics, here an
    * explicit branch over the null-safe kernel). */
  def langId(c: Column): Column =
    when(c.isNull, lit("und")).otherwise(textKernels.langId(c))

  /** The original expression tree of [[langId]] (spec twin). */
  private[pipeline] def langIdTree(c: Column): Column = {
    val w = array_distinct(tokensTree(c))
    val s = langMarkers.map { case (lang, ms) =>
      lang -> size(array_intersect(w, lit(ms.toArray)))
    }.toMap
    // NULL text: every marker count is NULL, so every when condition is
    // NULL (treated false) and evaluation falls through to the otherwise
    // — which must NOT label null rows Spanish (review r18-6).
    when(s.values.map(_ === 0).reduce(_ && _), lit("und"))
      .when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), lit("en"))
      .when(s("de") >= s("fr") && s("de") >= s("es"), lit("de"))
      .when(s("fr") >= s("es"), lit("fr"))
      .otherwise(when(c.isNull, lit("und")).otherwise(lit("es")))
  }

  /** English stopword set used by the quality score. */
  val stopwords: Seq[String] = langMarkers.head._2

  /** [[stopwords]] as a set for the JIT'd kernel. */
  private[pipeline] val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  /** Heuristic quality score in [0,1] scaled to micro-units:
    * 0.4·stopword-ratio + 0.4·alpha-char-ratio + 0.2·min(tokens/100, 1).
    * Empty/whitespace-only → 0; null → null. */
  def qualityMicros(c: Column): Column = textKernels.qualityMicros(c)

  /** The original expression tree of [[qualityMicros]] (spec twin). */
  private[pipeline] def qualityMicrosTree(c: Column): Column = {
    val w = tokensTree(c)
    val stopRatio = size(filter(w, t => array_contains(lit(stopwords.toArray), t)))
      .cast("double") / size(w)
    val alphaRatio = length(regexp_replace(c, "[^A-Za-z]", ""))
      .cast("double") / length(c)
    val lenNorm = least(size(w).cast("double") / 100.0, lit(1.0))
    // Empty/whitespace-only text scores 0 (also keeps the divisions
    // ANSI-safe — Spark 4 raises DIVIDE_BY_ZERO instead of returning NULL).
    when(length(c) === 0 || size(w) === 0, lit(0L))
      .otherwise(floor((lit(0.4) * stopRatio + lit(0.4) * alphaRatio
        + lit(0.2) * lenNorm) * 1000000).cast("long"))
  }

  /** Rolling polynomial hash over characters, mod 1e9+7 per step:
    * fp = fold(chars, 0, (acc, ch) -> (acc*31 + codepoint(ch)) mod p).
    * Empty text → 0; null → null. Kernel-backed ([[fingerprintScala]] is
    * the arithmetic; TextFunctionsSpec pins it equal to the tree incl.
    * non-ASCII). */
  def fingerprint(c: Column): Column = textKernels.fingerprint(c)

  /** The original expression tree of [[fingerprint]] (spec twin). */
  private[pipeline] def fingerprintTree(c: Column): Column = {
    val codes = transform(sequence(lit(1), length(c)), i =>
      ascii(c.substr(i, lit(1))).cast("long"))
    // Empty text is pinned to 0: Spark's sequence(1,0) would run DESCENDING
    // and DuckDB's unicode('') is -1 — both artifacts, neither a hash.
    when(length(c) === 0, lit(0L))
      .otherwise(aggregate(codes, lit(0L), (acc, ch) => (acc * 31 + ch) % 1000000007L))
  }

  /** Exact token count (whitespace). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** ALL word n-grams (with repeats — [[shingles]] is the deduped set);
    * < n tokens (and null) → empty array. */
  private[pipeline] def allNgrams(c: Column, n: Int): Column =
    coalesce(textKernels.allNgrams(c, n),
      lit(Array.empty[String]).cast("array<string>"))

  /** The original expression tree of [[allNgrams]] (spec twin). */
  private[pipeline] def allNgramsTree(c: Column, n: Int): Column =
    element_at(transform(array(tokensTree(c)), w =>
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*)))
        .otherwise(array().cast("array<string>"))), 1)

  /** Duplicate-n-gram fraction in micro-units: 1 − distinct/total over the
    * document's word n-grams — the Gopher/RefinedWeb repetition filter
    * (boilerplate and template spam score high; clean prose near 0).
    * Exact rational arithmetic only (integer counts, one IEEE division),
    * so the DuckDB oracle reproduces every bit; < n tokens (and null) → 0. */
  def dupNgramRatioMicros(c: Column, n: Int): Column =
    coalesce(textKernels.dupNgramRatioMicros(c, n), lit(0L))

  /** The original expression tree of [[dupNgramRatioMicros]] (spec twin). */
  private[pipeline] def dupNgramRatioMicrosTree(c: Column, n: Int): Column =
    element_at(transform(array(allNgramsTree(c, n)), g =>
      when(size(g) === 0, lit(0L))
        .otherwise(floor((lit(1.0) -
          size(array_distinct(g)).cast("double") / size(g)) * 1000000)
          .cast("long"))), 1)

  /** Both repetition metrics from ONE n-gram build — the corpus-sweep form.
    * Returns struct(dup_micros, top_micros); < n tokens (and null) →
    * struct(0, 0). */
  def repetitionMicros(c: Column, n: Int): Column =
    coalesce(textKernels.repetitionMicros(c, n),
      struct(lit(0L).as("dup_micros"), lit(0L).as("top_micros")))

  /** The original expression tree of [[repetitionMicros]] (spec twin). */
  private[pipeline] def repetitionMicrosTree(c: Column, n: Int): Column =
    element_at(transform(array(allNgramsTree(c, n)), g =>
      struct(
        when(size(g) === 0, lit(0L))
          .otherwise(floor((lit(1.0) -
            size(array_distinct(g)).cast("double") / size(g)) * 1000000)
            .cast("long")).as("dup_micros"),
        when(size(g) === 0, lit(0L))
          .otherwise(floor(
            array_max(transform(array_distinct(g), d =>
              size(filter(g, x => x === d)))).cast("double") / size(g)
            * 1000000).cast("long")).as("top_micros"))), 1)

  /** Most-frequent-n-gram fraction in micro-units: count of the modal
    * n-gram over the total — high when one phrase dominates the document
    * (the other half of the repetition rule family); < n tokens (and
    * null) → 0. */
  def topNgramRatioMicros(c: Column, n: Int): Column =
    coalesce(textKernels.topNgramRatioMicros(c, n), lit(0L))

  /** The original expression tree of [[topNgramRatioMicros]] (spec twin). */
  private[pipeline] def topNgramRatioMicrosTree(c: Column, n: Int): Column =
    element_at(transform(array(allNgramsTree(c, n)), g =>
      when(size(g) === 0, lit(0L))
        .otherwise(floor(
          array_max(transform(array_distinct(g), d =>
            size(filter(g, x => x === d)))).cast("double") / size(g)
          * 1000000).cast("long"))), 1)

  /** PII scrubbing — the pre-training redaction pass (mask, don't drop:
    * the surrounding prose keeps its training value). Three conservative
    * patterns chosen to mean the same thing in Java regex (Spark codegen)
    * and RE2 (DuckDB/ripgrep-class engines), applied URL-first so an
    * address inside a URL masks as part of the URL:
    *   - `https?://\S+`            → `<URL>`
    *   - `local@domain.tld`        → `<EMAIL>`
    *   - 7+ consecutive digits     → `<NUM>` (phone/account-number class;
    *     short quantities and years survive)
    * All three are `regexp_replace` chains — codegen'd, no UDF. */
  def maskPii(c: Column): Column = {
    val url = regexp_replace(c, "https?://[^\\s]+", "<URL>")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email, "[0-9]{7,}", "<NUM>")
  }

  /** The Gopher/MassiveText "required words": a quality document contains
    * at least 2 of these (the published rule's word list). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER QUALITY STATS (the published MassiveText filter inputs, as
    * exact integers): word count, mean word length (milli), symbol-to-word
    * ratio (micro — the COUNT of `#` and `...` occurrences divided by the
    * word count, the published definition, not the fraction of words
    * containing one), fraction of words with an alphabetic character
    * (micro), and how many of the required stopwords appear. One JIT'd
    * kernel call per document — the downstream rules read the struct, so
    * the stats compute once. NULL text → a struct of NULL fields (the
    * tree's arithmetic-over-null semantics). */
  def gopherStats(c: Column): Column =
    when(c.isNull, struct(
      lit(null).cast("long").as("n_words"),
      lit(null).cast("long").as("mean_word_len_milli"),
      lit(null).cast("long").as("symbol_ratio_micros"),
      lit(null).cast("long").as("alpha_frac_micros"),
      lit(null).cast("long").as("stop_hits")))
      .otherwise(textKernels.gopherStats(c))

  /** The original expression tree of [[gopherStats]] (spec twin). */
  private[pipeline] def gopherStatsTree(c: Column): Column = {
    val w = tokensTree(c)
    val n = size(w)
    val totalLen = aggregate(w, lit(0L), (a, t) => a + length(t))
    val alphaWords = size(filter(w, t => t.rlike("[A-Za-z]")))
    // occurrences via length deltas (replace drops non-overlapping
    // matches left-to-right in both Java and DuckDB, so the delta is
    // engine-consistent); each removed `...` is exactly 3 chars
    val symbolWords = aggregate(w, lit(0L), (a, t) =>
      a + (length(t) - length(replace(t, lit("#"), lit("")))).cast("long") +
        ((length(t) - length(replace(t, lit("..."), lit("")))) / lit(3))
          .cast("long"))
    val stopHits = size(array_intersect(array_distinct(w),
      lit(gopherStopwords.toArray)))
    struct(
      n.cast("long").as("n_words"),
      when(n === 0, 0L).otherwise(
        floor(lit(1000.0) * totalLen / n).cast("long"))
        .as("mean_word_len_milli"),
      when(n === 0, 0L).otherwise(
        floor(lit(1000000.0) * symbolWords / n).cast("long"))
        .as("symbol_ratio_micros"),
      when(n === 0, 0L).otherwise(
        floor(lit(1000000.0) * alphaWords / n).cast("long"))
        .as("alpha_frac_micros"),
      stopHits.cast("long").as("stop_hits"))
  }

  /** The published Gopher pass rule over [[gopherStats]] (integer
    * thresholds only, so both engines decide identically): 50–100k words,
    * mean word length 3–10 chars, symbol ratio ≤ 10%, ≥ 80% alphabetic
    * words, ≥ 2 required stopwords. */
  def gopherPass(stats: Column): Column =
    stats("n_words").between(50L, 100000L) &&
      stats("mean_word_len_milli").between(3000L, 10000L) &&
      stats("symbol_ratio_micros") <= 100000L &&
      stats("alpha_frac_micros") >= 800000L &&
      stats("stop_hits") >= 2L

  /** Scala twin of [[fingerprint]] — identical values (same codepoint
    * sequence, same per-step mod; TextFunctionsSpec asserts equality incl.
    * non-ASCII), JIT'd loop speed for the pipeline path. */
  def fingerprintScala(text: String): Long = {
    val t = Option(text).getOrElse("")
    if (t.isEmpty) 0L
    else {
      var acc = 0L
      val it = t.codePoints().iterator()
      while (it.hasNext) acc = (acc * 31 + it.next()) % 1000000007L
      acc
    }
  }
}
