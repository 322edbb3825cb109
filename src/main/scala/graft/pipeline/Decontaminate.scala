package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Benchmark decontamination — the training-data step that removes (or
  * flags) corpus documents overlapping an evaluation/benchmark set, so held
  * -out metrics are not inflated by memorized test items. (Beyond the
  * reference's own operators — SURVEY §"beyond the reference"; the
  * technique is the published n-gram-collision check used by large-model
  * training pipelines.)
  *
  * Semantics: a (corpus doc, eval doc) pair is reported when the corpus
  * document contains at least `minOverlap` of the eval document's distinct
  * word n-gram shingles AND the containment ratio
  * `|S_corpus ∩ S_eval| / |S_eval|` reaches `minContainment`. Containment
  * (not jaccard) is the right asymmetry: a short benchmark question pasted
  * into a long web page is 100% contained while its jaccard is tiny.
  *
  * 100 TB design:
  *  - The eval side is SMALL by definition (benchmark suites are thousands
  *    of items, not billions) — its exploded (eval_id, shingle) frame and
  *    its per-doc shingle counts both BROADCAST, so the corpus makes one
  *    codegen pass: explode → broadcast-hash probe → partial-aggregated
  *    (corpus_id, eval_id) counts. The only shuffle carries matched-pair
  *    partial counts, never shingles of unmatched documents (the broadcast
  *    probe drops them map-side).
  *  - Never all-pairs: candidates come from the shingle equi-join; cost
  *    scales with the collision count, not |corpus|·|eval|.
  *  - Shingling is the same expression tree the dedup family uses
  *    ([[TextFunctions.shingles]]) — codegen'd, no UDFs.
  */
object Decontaminate {

  /** Contaminated (corpus, eval) pairs with their overlap evidence:
    * `(corpus_id, eval_id, overlap, containment_micros)`, where `overlap`
    * counts shared distinct shingles and containment is
    * `overlap / |eval shingles|` in floor-micros (engine-stable). Eval
    * documents shorter than `shingleN` tokens have no shingles and never
    * match; id columns must be integral. */
  /** @param broadcastEval hint the eval side into broadcast joins (the
    *                      default — benchmark suites are small by
    *                      definition). Pass false for an outsized eval
    *                      corpus: the probe becomes a shuffled equi-join
    *                      on the shingle key, same semantics. */
  def overlaps(corpus: DataFrame, evalSet: DataFrame,
               corpusIdCol: String, corpusTextCol: String,
               evalIdCol: String, evalTextCol: String,
               shingleN: Int = 3, minOverlap: Int = 1,
               minContainment: Double = 0.0,
               broadcastEval: Boolean = true): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1: $shingleN")
    require(minOverlap >= 1, s"minOverlap must be >= 1: $minOverlap")

    import corpus.sparkSession.implicits._

    // localCheckpoint: the shingle HOF (interpreted lambdas — the wall
    // clock on the eval side) otherwise re-runs over the whole eval set
    // for the postings AND the sizes branch (review r18-6); the
    // checkpointed frame is eval-set-sized (small by contract) and
    // lineage-free.
    val evalSh = evalSet
      .select(col(evalIdCol).cast("long").as("eval_id"),
        TextFunctions.shingles(col(evalTextCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .localCheckpoint(true)

    // Both eval-side frames broadcast (by default): the exploded postings
    // feed the map-side probe; the sizes join resolves containment after
    // the pair aggregate.
    def hint(df: DataFrame): DataFrame =
      if (broadcastEval) broadcast(df) else df
    val evalPostings = hint(
      evalSh.select(col("eval_id"), explode(col("__sh")).as("__shingle")))
    val evalSizes = hint(
      evalSh.select(col("eval_id"), size(col("__sh")).as("__es")))

    // Corpus-side shingling runs the JIT'd Scala twin of
    // TextFunctions.shingles (bit-equal, DedupSpec-pinned): the corpus is
    // the big side and the interpreted higher-order-function lambdas cost
    // the wall clock there, exactly like the MinHash kernel.
    val corpusPostings = corpus
      .select(col(corpusIdCol).cast("long").as("corpus_id"),
        col(corpusTextCol).as("__text"))
      // a null (or non-castable) corpus id crashes the non-nullable tuple
      // encoder; the eval side and clean()'s anti-join tolerate nulls, so
      // the kernel side must too (r19 review)
      .filter(col("corpus_id").isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Dedup.shinglesScala(text, shingleN).map(s => (id, s))
      }
      .toDF("corpus_id", "__shingle")

    corpusPostings
      .join(evalPostings, "__shingle")
      .groupBy("corpus_id", "eval_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
      .join(evalSizes, "eval_id")
      .withColumn("__cont", col("overlap").cast("double") / col("__es"))
      .filter(col("__cont") >= minContainment)
      .select(col("corpus_id"), col("eval_id"), col("overlap"),
        floor(col("__cont") * 1000000).cast("long").as("containment_micros"))
  }

  /** The clean corpus: rows of `corpus` with NO contaminated pair under
    * the same parameters (left-anti join on the flagged ids). */
  def clean(corpus: DataFrame, evalSet: DataFrame,
            corpusIdCol: String, corpusTextCol: String,
            evalIdCol: String, evalTextCol: String,
            shingleN: Int = 3, minOverlap: Int = 1,
            minContainment: Double = 0.0,
            broadcastEval: Boolean = true): DataFrame = {
    val flagged = overlaps(corpus, evalSet, corpusIdCol, corpusTextCol,
      evalIdCol, evalTextCol, shingleN, minOverlap, minContainment,
      broadcastEval)
      .select(col("corpus_id"))
      .distinct()
    corpus.join(flagged,
      corpus(corpusIdCol).cast("long") === flagged("corpus_id"),
      "left_anti")
  }
}
