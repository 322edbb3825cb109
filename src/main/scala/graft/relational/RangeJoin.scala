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

  /** True floor-division bucket, exact in long arithmetic: `ts - pmod` is an
    * exact multiple of `width`, so truncating `div` on it IS floor division —
    * negative timestamps bucket correctly (plain `div` truncates toward zero,
    * which made bucket 0 double-width around the origin — ADVICE r4). */
  private def bucket(ts: String, width: Long): org.apache.spark.sql.Column =
    expr(s"($ts - pmod($ts, $width)) div $width")

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
