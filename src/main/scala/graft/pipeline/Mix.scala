package graft.pipeline

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

  /** The scaled hash of a row id: uniform over [0, 2^20). */
  def hashScaled(id: Column): Column =
    pmod(id * lit(69069L) + lit(12345L), lit(Resolution))

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
}
