package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Event-time column normalization — the single place the engine decides
  * what an event-time column IS.
  *
  * The reference treats TIMESTAMP as a first-class predicate type
  * (common/filter.cpp:29-31); our event-time operators (as-of join, banded
  * range join, sessionization, stream windows, RANGE frames) must accept
  * every representation users actually store:
  *
  *   - `TimestampType` — Spark's instant type (micros precision);
  *   - `TimestampNTZType` — what Parquet `timestamp[us], isAdjustedToUTC =
  *     false` infers to on read. The engine pins
  *     `spark.sql.session.timeZone=UTC` everywhere (Graft/Bench/Verify/
  *     SparkT), so the NTZ→TZ cast is an exact micros-preserving relabel,
  *     never a wall-clock shift;
  *   - integral epoch columns (assumed NANOSECONDS for the conversions that
  *     must pick a unit — the events fixture's historical encoding).
  *
  * All arithmetic stays in exact integer long math: epoch nanos (~1.7e18)
  * exceed double's 2^53 range, so any float detour can flip a window/bucket
  * boundary. Hence `expr(col div 1000)` instead of Column `/`.
  */
object EventTime {

  private[relational] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def unsupported(c: String, dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"event-time column '$c' must be TIMESTAMP, TIMESTAMP_NTZ or an " +
        s"integral epoch column, found $dt")

  /** Exact epoch-nanoseconds long. Timestamps carry micros precision, so
    * `unix_micros * 1000` is exact — SATURATING at ±Long range: Spark
    * timestamps reach year 294247 but nanos-long only 2262, and the
    * unchecked multiply silently wrapped an open-interval sentinel like
    * TIMESTAMP '9999-12-31' NEGATIVE, dropping every interval it closed
    * (review r18-5). The clamp is monotone, so comparisons/buckets built
    * on it stay order-correct; instants beyond ±2262 collapse to the
    * same extreme (indistinguishable from each other, correctly beyond
    * every physical instant). Integral columns pass through in their own
    * unit (callers state widths/frames in that unit). */
  def epochNanos(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => microsToNanosSat(unix_micros(col(c)))
      case TimestampNTZType =>
        microsToNanosSat(unix_micros(col(c).cast(TimestampType)))
      case dt if integral(dt) => col(c).cast(LongType)
      case dt => unsupported(c, dt)
    }

  private def microsToNanosSat(us: Column): Column = {
    val maxUs = Long.MaxValue / 1000L
    when(us > lit(maxUs), lit(Long.MaxValue))
      .when(us < lit(-maxUs), lit(Long.MinValue))
      .otherwise(us * lit(1000L))
  }

  /** Integral nanos → micros by FLOOR division (never float). Spark's
    * `div` TRUNCATES (rounds toward zero), which for a PRE-EPOCH
    * nanosecond value would round the opposite way from `unix_micros`
    * (which floors) and from DuckDB's `//` — truncate-then-correct
    * (subtract 1 when a negative value had a remainder) floors for both
    * signs WITHOUT the overflow a `(x - pmod(x, 1000))` subtraction has
    * near Long.MinValue (r12 verdict nit; fixtures are post-epoch, but
    * the divergence was real for negative instants). */
  private def nanosToMicros(c: String): Column =
    expr(s"(`$c` div 1000) + (CASE WHEN `$c` % 1000 < 0 THEN -1 ELSE 0 END)")

  /** Exact epoch-microseconds long (integral inputs are epoch NANOS,
    * floor-divided — consistent with `unix_micros` pre-epoch). */
  def epochMicros(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case dt if integral(dt) => nanosToMicros(c)
      case dt => unsupported(c, dt)
    }

  /** The column as a plain `TimestampType` instant (what `window`/
    * `session_window`/`withWatermark`/stream-stream joins want). Integral
    * inputs are epoch NANOS, floor-divided to micros in integer math. */
  def asTimestamp(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => col(c)
      case TimestampNTZType => col(c).cast(TimestampType)
      case dt if integral(dt) => timestamp_micros(nanosToMicros(c))
      case dt => unsupported(c, dt)
    }

  /** `df` with column `c` replaced by its [[asTimestamp]] normalization —
    * the one-liner the streaming operators open with. */
  def normalized(df: DataFrame, c: String): DataFrame =
    if (df.schema(c).dataType == TimestampType) df
    else df.withColumn(c, asTimestamp(df, c))
}
