package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate algebra with the same logical surface as the reference's
  * `Filter_t` (common/filter.h:48-68): VALUES / RANGE / FLOATRANGE / STRINGS
  * / NOTNULL filter types (filter.h:28-36), NOT-composition (`m_bExclude`),
  * open/closed and left/right-unbounded range bounds (filter.h:58-61), and
  * ALL/ANY quantifiers over sorted multi-value array columns (`MvaAggr_e`,
  * filter.h:39-44).
  *
  * Compilation targets Catalyst `Column`s, so predicate pushdown and
  * zone-map skipping are *inherited* from the Parquet scan instead of being
  * re-implemented: the reference's analyzer/prefilter machinery
  * (columnar/columnar.cpp:594-646) ≙ Catalyst `PushDownPredicates` + Parquet
  * row-group/page-index pruning; its 32 compile-time int-range template
  * variants (accessorint.cpp:1241-1283) ≙ whole-stage codegen.
  *
  * NULL model: the reference has no column-level nulls — "empty" is a
  * length-0 string/array, and an empty value never matches an include filter
  * but always matches an exclude filter (accessormva.cpp:38-45, 61-62).
  * We reproduce that by evaluating the include form null-safely
  * (`coalesce(p, false)`) and taking exclude as its uniform negation,
  * mirroring the `bAnyEqual ^ (!bEq)` pattern at accessorint.cpp:506.
  * (This intentionally diverges from SQL `NOT IN` null semantics.)
  */
sealed trait GFilter {
  def exclude: Boolean

  /** Include-form predicate, before NOT-composition. */
  protected def include: Column

  /** Final Catalyst predicate (null-safe, exclude-composed).
    *
    * The include form is emitted RAW: in a Filter, a NULL predicate drops
    * the row exactly like false, and wrapping it in `coalesce(p, false)`
    * would make the whole predicate untranslatable for Parquet pushdown —
    * zone maps would never fire for any filter (caught by PruningSpec Z1).
    * Only the exclude form needs the null guard, because there NULL must
    * flip to TRUE (the reference's empty-matches-exclude rule,
    * accessormva.cpp:61-62) — excludes are engine-evaluated, as they are in
    * the reference (inverted bitmaps, blockreader.cpp:563-573). */
  final def toColumn: Column =
    if (exclude) !coalesce(include, lit(false)) else include
}

/** MVA quantifier (MvaAggr_e NONE/ALL/ANY — common/filter.h:39-44). */
sealed trait Quant
case object AnyQ extends Quant
case object AllQ extends Quant

/** IN-list over integral columns (FilterType_e::VALUES, accessorint.cpp:920-1027).
  * Single-value fast path mirrors accessorint.cpp:930. */
final case class Values(colName: String, values: Seq[Long],
                        exclude: Boolean = false) extends GFilter {
  protected def include: Column =
    if (values.size == 1) col(colName) === lit(values.head)
    else col(colName).isin(values: _*)
}

/** Integer range with open/closed/unbounded bounds (FilterType_e::RANGE;
  * bound algebra = ValueInInterval, common/interval.h:24-67). */
final case class IntRange(colName: String,
                          lo: Option[Long] = None, hi: Option[Long] = None,
                          loIncl: Boolean = true, hiIncl: Boolean = true,
                          exclude: Boolean = false) extends GFilter {
  protected def include: Column = Ranges.compile(col(colName),
    lo.map(lit(_)), hi.map(lit(_)), loIncl, hiIncl)
}

/** Float/double range (FilterType_e::FLOATRANGE, common/filter.cpp:48-63);
  * integer filters on float columns are promoted here, as in filter.cpp:53. */
final case class FloatRange(colName: String,
                            lo: Option[Double] = None, hi: Option[Double] = None,
                            loIncl: Boolean = true, hiIncl: Boolean = true,
                            exclude: Boolean = false) extends GFilter {
  protected def include: Column = Ranges.compile(col(colName),
    lo.map(lit(_)), hi.map(lit(_)), loIncl, hiIncl)
}

/** Timestamp range; the reference stores TIMESTAMP as uint32 epoch seconds
  * and ranges it like UINT32 (common/filter.cpp:29-31) — ours is a first-
  * class timestamp range. The test tables carry naive (NTZ) timestamps, so
  * bounds are ISO-8601 local datetimes ("1995-03-15T00:00:00"). */
final case class TsRange(colName: String,
                         lo: Option[String] = None, hi: Option[String] = None,
                         loIncl: Boolean = true, hiIncl: Boolean = true,
                         exclude: Boolean = false) extends GFilter {
  private def b(s: String): Column = lit(java.time.LocalDateTime.parse(s))
  protected def include: Column = Ranges.compile(col(colName),
    lo.map(b), hi.map(b), loIncl, hiIncl)
}

/** String-set equality filter (FilterType_e::STRINGS; the reference compares
  * via collation fn or rewrites to a hash-column VALUES filter —
  * accessorstr.cpp:599-642, common/filter.cpp:77-90). Catalyst pushes
  * `IN(strings)` to the Parquet scan, which is the same fast path. */
final case class Strings(colName: String, values: Seq[String],
                         exclude: Boolean = false) extends GFilter {
  protected def include: Column =
    if (values.size == 1) col(colName) === lit(values.head)
    else col(colName).isin(values: _*)
}

object NotNull {
  /** Column kind for NOTNULL semantics (empty ≠ missing). */
  sealed trait Kind
  case object Scalar extends Kind
  case object Str extends Kind
  case object Arr extends Kind
}

/** Non-empty test (FilterType_e::NOTNULL, common/filter.h:35). The reference
  * defines "null" as a length-0 string/MVA, so for strings/arrays we also
  * require length/size > 0. */
final case class NotNullF(colName: String,
                          kind: NotNull.Kind = NotNull.Scalar,
                          exclude: Boolean = false) extends GFilter {
  protected def include: Column = kind match {
    case NotNull.Scalar => col(colName).isNotNull
    case NotNull.Str    => col(colName).isNotNull && length(col(colName)) > 0
    case NotNull.Arr    => col(colName).isNotNull && size(col(colName)) > 0
  }
}

/** VALUES filter with an ALL/ANY quantifier over a sorted multi-value array
  * column (MvaAny_T / MvaAll_T, accessormva.cpp:31-139). Empty-array rows
  * never match the include form (GFilter.toColumn handles exclude). The
  * reference exploits set sortedness with binary search; `arrays_overlap` /
  * `forall` are codegen'd over the array, which is the Spark-shaped
  * equivalent. */
final case class MvaValues(colName: String, values: Seq[Long], quant: Quant,
                           exclude: Boolean = false) extends GFilter {
  protected def include: Column = quant match {
    case AnyQ => arrays_overlap(col(colName), lit(values.toArray))
    case AllQ => size(col(colName)) > 0 &&
      forall(col(colName), x => x.isin(values: _*))
  }
}

/** RANGE filter with an ALL/ANY quantifier over an array column. The
  * reference's ALL-range uses the first/last element trick valid on sorted
  * sets (accessormva.cpp:59-67); `forall` is order-insensitive and equally
  * codegen'd. */
final case class MvaRange(colName: String,
                          lo: Option[Long] = None, hi: Option[Long] = None,
                          loIncl: Boolean = true, hiIncl: Boolean = true,
                          quant: Quant = AnyQ,
                          exclude: Boolean = false) extends GFilter {
  private def cond(x: Column): Column =
    Ranges.compile(x, lo.map(lit(_)), hi.map(lit(_)), loIncl, hiIncl)
  protected def include: Column = quant match {
    case AnyQ => exists(col(colName), cond)
    case AllQ => size(col(colName)) > 0 && forall(col(colName), cond)
  }
}

/** Row-id window pseudo-filter ("@rowid", columnar/columnar.cpp:575-611,
  * RowidRange_t common/filter.h:70-74): restricts the scan to a dense key
  * window. On Parquet this is just a range predicate on the surrogate key —
  * sorted writes make it a pure zone-map prune. */
final case class RowidWindow(colName: String, lo: Long, hi: Long,
                             exclude: Boolean = false) extends GFilter {
  protected def include: Column = col(colName) >= lit(lo) && col(colName) < lit(hi)
}

private object Ranges {
  /** Bound algebra shared by all range filters: 4 open/closed combos ×
    * left/right-unbounded = the 16 variants the reference instantiates as
    * templates (accessorint.cpp:1252-1283). */
  def compile(c: Column, lo: Option[Column], hi: Option[Column],
              loIncl: Boolean, hiIncl: Boolean): Column = {
    val loC = lo.map(b => if (loIncl) c >= b else c > b)
    val hiC = hi.map(b => if (hiIncl) c <= b else c < b)
    (loC, hiC) match {
      case (Some(a), Some(b)) => a && b
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => lit(true)
    }
  }
}

object Filters {
  /** Conjunction of filters — the reference's multi-filter analyzer set
    * (CreateAnalyzerOrPrefilter + host-side rowid-stream intersection,
    * columnar.cpp:721-746). One `filter()` call keeps the whole conjunction
    * inside a single scan's pushed predicates. */
  def compileAll(fs: Seq[GFilter]): Column =
    fs.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
}
