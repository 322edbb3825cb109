package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Backward as-of join — for each left row, the single right row with the
  * greatest `rightTs <= leftTs` for the same key.
  *
  * The reference library has no as-of operator (joins are the host daemon's
  * job, SURVEY §2.6); this is one of the training-data-pipeline operators the
  * engine adds first-class (align a fact stream to the latest upstream state:
  * model-version-at-event-time, latest-profile-before-interaction, …).
  *
  * Spark has no native as-of join, and the naive encoding
  * (`JOIN ON key AND rts <= lts` + groupBy max) explodes to O(|L|·|R|/keys)
  * intermediate rows. This implementation is the union+window form:
  *
  *   1. tag both inputs and UNION them (no join at all);
  *   2. one shuffle: window partitioned by key, ordered by
  *      (ts, side, rightId) — right rows sort BEFORE left rows at equal ts,
  *      so `<=` semantics fall out of the ordering;
  *   3. `last(payload, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
  *      carries the most recent right payload forward onto each left row.
  *
  * Cost at 100 TB: exactly one hash shuffle of |L|+|R| rows + a per-partition
  * sort — the same plan shape as any window aggregate; no intermediate blowup,
  * no driver involvement. Skewed keys behave like any window (salt upstream
  * via [[graft.tables.Skew]] if one key dominates).
  *
  * Determinism: ties on (key, ts) among right rows resolve to the greatest
  * `rightId` (the window order makes it the last seen), so the result is a
  * function of the data, not of partitioning.
  */
object AsofJoin {

  /** @param payload right-side columns to carry onto each left row
    *                (emitted as `asof_<name>`); the matched right timestamp
    *                is always emitted as `asof_ts`.
    * @param rightId a unique, deterministic right-side tiebreak column.
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightId: String, payload: Seq[String] = Nil): DataFrame =
    directional(left, right, leftKey, rightKey, leftTs, rightTs, rightId,
      payload, ascending = true)

  /** FORWARD as-of: for each left row, the single right row with the
    * SMALLEST `rightTs >= leftTs` for the same key — the mirror of
    * [[backward]] (align to the next upcoming state: next-maintenance-
    * window-after-event, first-response-after-request). Identical plan
    * shape — the window scans time DESCENDING, so "last right seen" is
    * the nearest future row; equal-(key, ts) right rows still resolve to
    * the greatest `rightId`. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTs: String, rightTs: String,
              rightId: String, payload: Seq[String] = Nil): DataFrame =
    directional(left, right, leftKey, rightKey, leftTs, rightTs, rightId,
      payload, ascending = false)

  /** NEAREST as-of: the right row minimizing `|rightTs - leftTs|`; exact
    * ties between the backward and forward candidates resolve BACKWARD
    * (the conventional default). Two window passes + one equi-join on
    * (`leftId`, every left column) — still no pair blowup; `leftId` must
    * uniquely identify left rows. Event-time columns may be any
    * [[EventTime]] representation; distances compare in exact micros. */
  def nearest(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTs: String, rightTs: String,
              rightId: String, leftId: String,
              payload: Seq[String] = Nil): DataFrame = {
    val b = backward(left, right, leftKey, rightKey, leftTs, rightTs,
      rightId, payload)
    val asofCols = "asof_ts" +: payload.map(c => s"asof_$c")
    val f = forward(left, right, leftKey, rightKey, leftTs, rightTs,
        rightId, payload)
      .select(col(leftId) +: asofCols.map(c => col(c).as(s"__f_$c")): _*)
    val joined = b.join(f, Seq(leftId))
    // distances compare in epochNanos: exact for timestamps (micros×1000)
    // AND for integral columns, which pass through in their own unit —
    // epochMicros would integer-divide an integral (nanos-contract) column
    // by 1000 and collapse sub-microsecond distances into false ties.
    // DECIMAL(38,0) arithmetic: a long subtraction wraps when the two
    // sides straddle the saturated/sentinel extremes (e.g. a MaxValue
    // open-interval sentinel vs a pre-1970 instant), silently electing
    // the far side (r19 review); the no-match sentinel is decimal-max,
    // above any real distance (≤ ~1.9e19)
    val lNs = EventTime.epochNanos(joined, leftTs).cast("decimal(38,0)")
    val farSentinel = lit(new java.math.BigDecimal("9" * 38))
    def dist(c: String) = when(col(c).isNull, farSentinel)
      .otherwise(abs(
        EventTime.epochNanos(joined, c).cast("decimal(38,0)") - lNs))
    val useB = dist("asof_ts") <= dist("__f_asof_ts")
    val out = joined
      .select((left.columns.map(col) ++ asofCols.map(c =>
        when(col("asof_ts").isNull && col("__f_asof_ts").isNull,
          lit(null).cast(b.schema(c).dataType))
          .when(useB, col(c)).otherwise(col(s"__f_$c")).as(c))).toIndexedSeq: _*)
    out
  }

  private def directional(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          rightId: String, payload: Seq[String],
                          ascending: Boolean): DataFrame = {
    // Fail fast on a non-integral tiebreak column: the long cast below would
    // silently null it out, quietly destroying the documented deterministic
    // tie resolution instead of erroring (ADVICE r4).
    val ridType = right.schema(rightId).dataType
    require(EventTime.integral(ridType),
      s"rightId '$rightId' must be an integral column, found $ridType")
    // Fail fast on output-name collisions (review r18-5): a payload column
    // named `rightTs` (both would emit asof_ts) or a left input already
    // holding an asof_* output name would surface later as an ambiguous-
    // column AnalysisException far from the misuse site.
    val outNames = "asof_ts" +: payload.map(c => s"asof_$c")
    require(outNames.distinct.size == outNames.size,
      s"as-of payload would emit duplicate output columns: $outNames — " +
        s"a payload column named '$rightTs' collides with the asof_ts " +
        "match-timestamp output")
    val collide = left.columns.toSet.intersect(outNames.toSet)
    require(collide.isEmpty,
      s"left input already carries as-of output name(s) $collide — " +
        "rename them before the join")
    val leftCols = left.columns.toSeq
    val payStruct = struct(
      col(rightTs).as("asof_ts") +: payload.map(c => col(c).as(s"asof_$c")): _*)
    val payType = right.select(payStruct).schema.head.dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__rid"),
      lStruct.as("__l"), lit(null).cast(payType).as("__p"))
    // a NULL-timestamp right row can never be an as-of match, but the
    // window ordering would park it at a partition END (asc = nulls
    // first, desc = nulls last) where `last(__p, ignoreNulls)` hands its
    // payload to left rows with NO real match — drop such rows up front
    // (r19 review)
    val r = right
      .filter(col(rightTs).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTs).as("__t"),
        lit(0).as("__side"), col(rightId).cast("long").as("__rid"),
        lit(null).cast(lType).as("__l"), payStruct.as("__p"))

    // Right rows order before left rows at equal ts (asc on __side), giving
    // inclusive match on both directions; among equal-ts right rows the
    // greatest __rid wins (it is the last right row the scan sees).
    val tsOrd = if (ascending) col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tsOrd, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      // a NULL-timestamp LEFT row has no as-of position either — under
      // desc (forward) ordering it would sort after every right row and
      // inherit the last payload as a phantom match (r19 review)
      .withColumn("__asof",
        when(col("__t").isNull, lit(null).cast(payType))
          .otherwise(last(col("__p"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__asof.*"))
  }
}
