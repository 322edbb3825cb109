package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Banded range (interval) join — pairs `(l, r)` with
  * `|l.ts - r.ts| <= width` and NO equality key.
  *
  * A pure inequality join degenerates to a broadcast-nested-loop / cartesian
  * in Spark (O(|L|·|R|) comparisons). This operator manufactures the missing
  * equi-key: bucket both sides by `floor(ts / width)`; a qualifying pair can
  * only differ by at most one bucket, so probing buckets {b-1, b, b+1} from
  * the left covers every match exactly once. The 3x left-side fanout buys an
  * ordinary shuffled hash join — at 100 TB that is shuffle + hash probe,
  * never a cross product, and AQE handles bucket skew like any hot join key.
  *
  * Event-time columns may be `TimestampType`, `TimestampNTZType`, or an
  * integral epoch column ([[EventTime]]); timestamps normalize to exact
  * epoch NANOS internally, so `width` is in nanoseconds for timestamp
  * inputs and in the column's own unit for integral inputs.
  *
  * (The reference library has no range-join operator — SURVEY §2.6; this is
  * part of the engine's pipeline surface, e.g. nearby-event correlation and
  * time-window audit joins.)
  */
object RangeJoin {

  /** True floor-division bucket, exact in long arithmetic: truncating
    * `div` corrected by one when a negative value had a remainder —
    * negative timestamps bucket correctly (plain `div` truncates toward
    * zero, which made bucket 0 double-width around the origin — ADVICE
    * r4), and unlike the earlier `(ts - pmod(ts, w)) div w` form the
    * subtraction-free shape cannot overflow near Long.MinValue (the
    * saturated sentinel EventTime.epochNanos now emits — review r18-5;
    * the same truncate-then-correct EventTime.nanosToMicros uses). */
  private[relational] def bucket(ts: String,
                                 width: Long): org.apache.spark.sql.Column =
    expr(s"($ts div $width) + (CASE WHEN $ts % $width < 0 THEN -1 ELSE 0 END)")

  /** Join rows of `left` and `right` whose `tsL`/`tsR` lie within `width`
    * of each other. Output = left columns + right columns; callers ensure
    * the names are disjoint. */
  def bandJoin(left: DataFrame, right: DataFrame,
               tsL: String, tsR: String, width: Long): DataFrame = {
    require(width > 0, "band width must be positive")
    val l = left
      .withColumn("__lns", EventTime.epochNanos(left, tsL))
      .withColumn("__lb", bucket("__lns", width))
      .withColumn("__probe", explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)))
    val r = right
      .withColumn("__rns", EventTime.epochNanos(right, tsR))
      .withColumn("__rb", bucket("__rns", width))
    l.join(r, l("__probe") === r("__rb") &&
        abs(col("__lns") - col("__rns")) <= lit(width))
      .drop("__lns", "__lb", "__probe", "__rns", "__rb")
  }

  /** POINT-IN-INTERVAL join: pairs each `points` row with every
    * `intervals` row whose `[lo, hi]` contains its timestamp (inclusive
    * both ends), optionally under an equality key.
    *
    * Scale shape: bucket width = `typicalLen`, and each interval explodes
    * to EVERY bucket it touches (`sequence(bucket(lo), bucket(hi))` —
    * ⌈len/width⌉+1 rows), so containment is an ordinary shuffled hash
    * join on (bucket [, key]) — never a cartesian, and correctness never
    * depends on interval lengths: an outsized interval costs
    * proportionally more explode rows, it is never silently missed. Size
    * `typicalLen` near the common interval length (≈2 rows per
    * interval); empty/negative intervals (`hi < lo`) match nothing.
    * Intervals spanning more than `spark.graft.rangeJoin.maxBucketsPerInterval`
    * buckets (default 4096) take a SEPARATE non-bucketed arm — a plain
    * containment join (hash-join on the key when one is given, else a
    * broadcast-nested-loop over the few broad intervals) unioned with
    * the bucketed arm (review r18-5): an OPEN interval ending at a
    * far-future sentinel like TIMESTAMP '9999-12-31' would otherwise
    * explode to ~10^15 bucket rows (and before the epochNanos saturation
    * fix it silently wrapped negative and dropped). Both arms are exact;
    * the split costs NO extra job — classification is a per-row
    * predicate.
    * Event-time columns may be any [[EventTime]] representation;
    * `typicalLen` is nanos for timestamps, the column's own unit for
    * integral inputs. Callers ensure point/interval column names are
    * disjoint (the [[bandJoin]] contract). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointTs: String, loCol: String, hiCol: String,
                   typicalLen: Long,
                   pointKey: Option[String] = None,
                   intervalKey: Option[String] = None): DataFrame = {
    require(typicalLen > 0, "typicalLen must be positive")
    require(pointKey.isDefined == intervalKey.isDefined,
      "pointKey and intervalKey must be given together")
    val maxBuckets = points.sparkSession.conf
      .getOption("spark.graft.rangeJoin.maxBucketsPerInterval")
      .flatMap(_.toLongOption).filter(_ >= 1L).getOrElse(4096L)
    val p = points
      .withColumn("__pns", EventTime.epochNanos(points, pointTs))
      .withColumn("__pb", bucket("__pns", typicalLen))
    val iv0 = intervals
      .withColumn("__lons", EventTime.epochNanos(intervals, loCol))
      .withColumn("__hins", EventTime.epochNanos(intervals, hiCol))
      .filter(col("__hins") >= col("__lons"))
      .withColumn("__blo", bucket("__lons", typicalLen))
      .withColumn("__bhi", bucket("__hins", typicalLen))
    // per-row arm split (a predicate, never a driver job). The span
    // compares in DOUBLE — saturated sentinel bounds could overflow a
    // long subtraction, and a misclassification near 2^53 only picks the
    // other (equally exact) arm.
    val broadPred =
      col("__bhi").cast("double") - col("__blo").cast("double") >
        lit(maxBuckets.toDouble)
    def keyCond(pp: DataFrame, ii: DataFrame) =
      pointKey.map(k => pp(k) === ii(intervalKey.get)).getOrElse(lit(true))
    // narrow arm: ≤ maxBuckets explode rows per interval, equi-join
    val ivN = iv0.filter(!broadPred)
      .withColumn("__b", explode(sequence(col("__blo"), col("__bhi"))))
      .drop("__blo", "__bhi")
    val narrow = p.join(ivN, p("__pb") === ivN("__b") &&
        p("__pns") >= ivN("__lons") && p("__pns") <= ivN("__hins") &&
        keyCond(p, ivN))
      .drop("__pns", "__pb", "__lons", "__hins", "__b")
    // broad arm: no bucketing — plain containment (hash join on the key
    // when given; else BNL over the few broad intervals). An interval
    // this wide contains MOST points, so its output is join-sized
    // regardless; bucketing would only multiply its storage.
    val ivB = iv0.filter(broadPred).drop("__blo", "__bhi")
    val broad = p.join(ivB,
        p("__pns") >= ivB("__lons") && p("__pns") <= ivB("__hins") &&
        keyCond(p, ivB))
      .drop("__pns", "__pb", "__lons", "__hins")
    narrow.unionByName(broad)
  }

  /** Per-row neighbor counts within `±width` of each row of `df` (self band
    * join, excluding the row itself). Emits only rows with >= 1 neighbor. */
  def selfNeighborCounts(df: DataFrame, idCol: String, tsCol: String,
                         width: Long): DataFrame = {
    val a = df.select(col(idCol).as("__aid"), col(tsCol).as("__ats"))
    val b = df.select(col(idCol).as("__bid"), col(tsCol).as("__bts"))
    bandJoin(a, b, "__ats", "__bts", width)
      .filter(col("__aid") =!= col("__bid"))
      .groupBy(col("__aid").as(idCol))
      .agg(count(lit(1)).as("n_neighbors"))
  }
}
