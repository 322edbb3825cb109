package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic mixture sampling — the training-data "data mixing" step
  * (beyond the reference's own operators, SURVEY §"beyond the
  * reference"): downsample each source/domain to a target rate so the
  * final mixture matches a recipe (e.g. 30% web, 20% code, …).
  *
  * The keep decision is a pure function of the row id — NOT an RNG draw:
  * `sample()`/`sampleBy()` redraw per partition attempt, so task retries
  * and repartitions change the selected set, which poisons incremental
  * reruns and makes train/validation splits irreproducible. Here a row is
  * kept iff
  * {{{ (id * 69069 + 12345) mod 2^20  <  floor(rate * 2^20) }}}
  * (a Knuth-style LCG mix over a 2^20 resolution space, exact long math) —
  * the same rows are kept on every engine, every rerun, every cluster
  * size. A production deployment at 100 TB would swap the mixer for
  * `xxhash64(id)` (64-bit dispersion); the LCG form is what the DuckDB
  * oracle can replay literally, and the seam is one expression.
  *
  * 100 TB design: rates ship as a BROADCAST table keyed by the source
  * column (a recipe can list thousands of domains) — the scan stays one
  * pass, the filter is codegen'd arithmetic, nothing shuffles.
  */
object Mix {

  /** Resolution of the rate space: rates quantize to 1/2^20 ≈ 1e-6. */
  val Resolution: Long = 1L << 20

  /** The scaled hash of a row id: uniform over [0, 2^20). The id reduces
    * mod 2^20 BEFORE the LCG multiply — mod distributes over ·, so the
    * result is bit-identical to the direct form, but the product stays
    * ≤ (2^20−1)·69069 ≈ 7.2e10: the direct `id * 69069` overflows long
    * (and under ANSI mode THROWS) for any id ≥ 2^63/69069 ≈ 1.3e14 —
    * snowflake-style and xxhash64-derived 64-bit ids (review r18-4). */
  def hashScaled(id: Column): Column =
    pmod(pmod(id, lit(Resolution)) * lit(69069L) + lit(12345L),
      lit(Resolution))

  /** Keep each row of `df` whose `srcCol` is listed in `rates` with the
    * listed probability (deterministic in `idCol`). Sources absent from
    * the recipe are DROPPED (an explicit recipe is the contract — a
    * silent keep-all for an unlisted source would skew the mixture). */
  def bySource(df: DataFrame, idCol: String, srcCol: String,
               rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "empty mixture recipe")
    rates.foreach { case (s, r) =>
      require(r >= 0.0 && r <= 1.0, s"rate for '$s' out of [0,1]: $r") }
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = rates.toSeq.map { case (s, r) => (s, threshold(r)) }
      .toDF(srcCol, "__graft_thr")
    val joined = df.join(broadcast(thresholds), Seq(srcCol))
    joined.filter(hashScaled(col(idCol)) < col("__graft_thr"))
      .drop("__graft_thr")
      // restore the caller's column order (the join moved srcCol first)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** The integer keep-threshold a rate quantizes to (rate 1.0 → 2^20,
    * above every hash value — keep all). */
  def threshold(rate: Double): Long = math.floor(rate * Resolution).toLong

  /** TOKEN-BUDGET selection: within each `groupCol`, rank rows by
    * (`scoreCol` DESC, `idCol` ASC) and keep rows while the running sum of
    * `weightCol` (inclusive) stays within `budget` — "take the best
    * documents up to N tokens per source". Appends `cum_weight` (the
    * inclusive running sum, deciding column of the cut). Weights must be
    * non-negative; a row is kept iff its inclusive running sum <= budget.
    *
    * 100 TB design — the naive form is ONE window partitioned by group,
    * which serializes each source through a single task (a web-scale
    * source is billions of rows). Instead the cut evaluates in two
    * exact phases:
    *  1. aggregate to per-(group, score) weight sums (map-side combined
    *     — the frame is |distinct scores| per group, not |rows|), window
    *     over THAT to get each score-run's starting offset, and prune
    *     runs that start past the budget (for non-negative weights no
    *     row of theirs can be kept);
    *  2. join the surviving offsets back (equi-join on (group, score))
    *     and window partitioned by (group, score) — orders of magnitude
    *     finer than by group alone — adding the within-run prefix.
    * Both decisions use exact integer arithmetic over the same total
    * order, so the result is identical to the naive single window —
    * MixSpec pins the equivalence on randomized data. */
  def byBudget(df: DataFrame, idCol: String, groupCol: String,
               weightCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    // NULL scores are EXCLUDED up front (explicitly, not as a join
    // artifact): an unscored row has no rank in the quality order, and
    // leaving the drop implicit in the (group, score) equi-join would
    // make it look accidental.
    val scored = df.filter(col(scoreCol).isNotNull)
    // The run-pruning phase is only exact for NON-NEGATIVE weights (a
    // negative weight could pull a later run back under budget), so the
    // precondition is ENFORCED, not just documented: the first pass over
    // the rows fails loudly on a negative weight (raise_error is codegen'd
    // into the same scan — no extra job). Every in-scope row flows through
    // this aggregate, so one guard covers both phases.
    val wGuard = when(col(weightCol) < 0, raise_error(concat(
        lit(s"Mix.byBudget: negative $weightCol: "),
        col(weightCol).cast("string"))).cast("long"))
      .otherwise(col(weightCol))
    val byScore = scored.groupBy(col(groupCol), col(scoreCol))
      .agg(sum(wGuard).as("__w"))
    val runs = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byScore
      .withColumn("__off", coalesce(sum(col("__w")).over(runs), lit(0L)))
      .filter(col("__off") <= budget)
      .select(col(groupCol), col(scoreCol), col("__off"))
    val inRun = Window.partitionBy(col(groupCol), col(scoreCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    scored.join(offsets, Seq(groupCol, scoreCol))
      .withColumn("cum_weight",
        col("__off") + sum(col(weightCol)).over(inRun))
      .filter(col("cum_weight") <= budget)
      .select((df.columns :+ "cum_weight").map(col).toIndexedSeq: _*)
  }

  /** Safety factor of the stratified prefilter: the filter keeps an
    * expected `PrefilterMargin × n` rows per group of `minGroupRows`
    * size, so losing a winner to the filter is a large-deviation event —
    * and the rescue pass makes even that exact, not just likely. */
  val PrefilterMargin: Long = 8L

  /** STRATIFIED sample: exactly `n` rows per `groupCol` value (fewer when
    * the group is smaller), chosen as the n smallest [[hashScaled]] ids —
    * deterministic across engines/reruns/cluster sizes, uniform within
    * each group.
    *
    * The base shape is ONE window partitioned by the group column — right
    * when groups are many and moderate (the usual per-source case). A
    * single billion-row group would serialize its rank through one task;
    * pass `minGroupRows` (a LOWER-bound estimate of the interesting group
    * sizes — e.g. from the file-stats catalog) and the operator applies
    * the hash prefilter AUTOMATICALLY (r13 VERDICT #7): only rows with
    * `hashScaled(id) < PrefilterMargin·n/minGroupRows` of the hash space
    * rank, cutting the window's input by orders of magnitude. The result
    * is EXACT, not approximate: the decision column is the same hash, so
    * a group with ≥ n surviving rows provably kept all n winners; groups
    * with fewer survivors (small groups, or an over-estimate) are rescued
    * by re-ranking their full rows — an equi-join-scoped second pass, not
    * a full recompute. PackMixSpec pins selected-set identity with and
    * without the prefilter on a skewed fixture. */
  def stratified(df: DataFrame, idCol: String, groupCol: String,
                 n: Int, minGroupRows: Option[Long] = None): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    def pick(src: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(hashScaled(col(idCol)), col(idCol))
      src.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n)
        .select(df.columns.map(col).toIndexedSeq: _*)
    }
    minGroupRows.foreach(est =>
      require(est >= 1, s"minGroupRows must be >= 1: $est"))
    minGroupRows.filter(est => est > PrefilterMargin * n) match {
      case None => pick(df)
      case Some(est) =>
        // keep-threshold over the 2^20 hash space; +1 keeps it a strict
        // over-estimate after the floor division
        val keep = math.min(Resolution,
          Resolution * PrefilterMargin * n / est + 1L)
        val pre = df.filter(hashScaled(col(idCol)) < lit(keep))
        // a group with >= n survivors provably kept all n winners (the
        // winners are the n smallest hashes, all below any threshold that
        // admits n rows). Everything else — few survivors, ZERO survivors
        // (absent from pre's groups entirely), or a null group key (never
        // equi-matched) — is rescued by re-ranking its full rows.
        val bigEnough = pre.groupBy(col(groupCol))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= n)
          .select(col(groupCol))
        val sg = df.select(col(groupCol)).distinct()
          .join(bigEnough, Seq(groupCol), "left_anti")
          .withColumnRenamed(groupCol, "__g")
        val confident = pick(
          pre.join(sg, col(groupCol) <=> col("__g"), "left_anti"))
        val rescued = pick(
          df.join(sg, col(groupCol) <=> col("__g"), "left_semi"))
        confident.unionByName(rescued)
    }
  }
}
