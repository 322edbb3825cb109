package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Structured Streaming operators over the events stream (SURVEY §2.6: the
  * reference library has no streaming surface — the host daemon ingests;
  * our engine exposes Spark's native streaming model directly).
  *
  * All three transforms take an UNBOUNDED input (readStream) and are also
  * valid on batch DataFrames — the Spark unification the engine leans on
  * for backfill = replay of the same pipeline.
  *
  * 100 TB / always-on design: every operator is keyed (shuffle by key once),
  * watermarked (state is bounded — late data beyond the watermark is
  * dropped, state for closed windows/sessions is freed), and incremental
  * (partial aggregation per micro-batch).
  *
  * Event-time polymorphism: the `ts` column may be `TimestampType`,
  * `TimestampNTZType` (what Parquet `timestamp[us]` infers to), or an
  * integral epoch-nanos column — every operator normalizes through
  * [[graft.relational.EventTime]] before watermarking/windowing, so a
  * data-shape change in the source never breaks the surface.
  */
object EventStreams {

  /** Exact event-time micros from a java.sql.Timestamp: getTime is MILLIS
    * — sorting on it would reorder same-millisecond events and diverge
    * from the batch operator (review r12-3). ONE definition for both
    * funnel variants (review r18-5). */
  private def micros(e: TypedEvent): Long =
    e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000


  private def norm(df: DataFrame, c: String = "ts"): DataFrame =
    graft.relational.EventTime.normalized(df, c)

  /** Tumbling-window counts/sums per event type with a late-data watermark.
    * State per (window × type) is freed once the watermark passes. */
  def windowedCounts(events: DataFrame, windowDur: String,
                     watermark: String): DataFrame =
    norm(events)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization with the built-in session_window (dynamic
    * windows that extend while events keep arriving within `gap`). */
  def sessionWindows(events: DataFrame, gap: String,
                     watermark: String): DataFrame =
    norm(events)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Streaming exact dedup: drop re-deliveries of the same key arriving
    * within the watermark horizon (at-least-once ingestion → exactly-once
    * rows). State holds one entry per key seen in the horizon and is freed
    * as the watermark advances — bounded regardless of stream length.
    * On a BATCH input Spark rejects the watermark variant outright; the
    * fallback is full-history dropDuplicates — a STRICTLY STRONGER
    * guarantee, not an identical one: a re-delivery arriving beyond the
    * watermark horizon is emitted again by the stream (its key's state
    * expired) but deduped by the batch replay. The two agree exactly under
    * the at-least-once delivery model this operator exists for
    * (re-deliveries arrive within the horizon); a backfill additionally
    * collapses late duplicates the live stream could not have caught. */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           keys: Seq[String]): DataFrame = {
    // empty keys crashed the streaming arm with a bare NoSuchElement and
    // silently whole-row-deduped the batch arm — same invalid input, two
    // behaviors (r19 review)
    require(keys.nonEmpty,
      "dedupWithinWatermark needs at least one key column")
    if (events.isStreaming)
      norm(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else
      // norm() on BOTH arms: a backfill must emit the same ts type/values
      // as the live stream (an integral nanos or NTZ ts column otherwise
      // appends a conflicting schema to the same sink — r19 review)
      norm(events).dropDuplicates(keys)
  }

  /** Event-time-bounded stream-stream inner join: each purchase pairs with
    * the same user's views inside [p_ts - lookback, p_ts]. Both sides are
    * watermarked and the join condition bounds event time on both, so the
    * join state (buffered unmatched rows) is bounded and purged as the
    * watermarks advance — the only stream-stream join shape that survives
    * an always-on 100 TB/day pipeline. */
  def purchaseViewJoin(views: DataFrame, purchases: DataFrame,
                       watermark: String, lookback: String): DataFrame = {
    val v = norm(views).select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val p = norm(purchases).select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    p.join(v, expr("v_user = p_user AND " +
      s"v_ts BETWEEN p_ts - INTERVAL $lookback AND p_ts"))
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserAgg(user_id: Long, n: Long, sum: Double)

  /** Custom per-key state via mapGroupsWithState (the
    * KeyValueGroupedDataset custom-state path): running per-user count/sum
    * that survives across micro-batches, emitted in Update mode. */
  def runningUserAgg(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          var n = prev.n
          var s = prev.sum
          batch.foreach { e => n += 1; s += e.value }
          val next = UserAgg(uid, n, s)
          state.update(next)
          next
      }
  }

  final case class TypedEvent(user_id: Long, ts: java.sql.Timestamp,
                              event_type: String)
  final case class FunnelHit(user_id: Long, step_us: Seq[Long])

  /** STREAMING funnel: the per-user greedy earliest-completion chain of
    * [[graft.relational.Funnel.earliestChain]] as a live state machine —
    * one row emitted the moment a user's final step lands (optionally
    * within `withinMicros` of their first step, inclusive).
    *
    * State per user is just the chain times consumed so far (k longs) via
    * flatMapGroupsWithState — bounded regardless of event volume. Each
    * micro-batch's group is processed in event-time order; once a step
    * time is consumed it is never revised, so a LATE event that would
    * have chained earlier does not rewrite history (the documented
    * streaming relaxation — with in-order delivery the output is exactly
    * the batch operator's, which StreamingSpec pins; completed users
    * clear their state and re-entering events start a fresh chain only
    * after a completion, never duplicate one). */
  def funnelState(events: Dataset[TypedEvent], steps: Seq[String],
                  withinMicros: Option[Long] = None): Dataset[FunnelHit] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    // the batch operators' r18-5 fail-fast, mirrored (r19 review): a
    // non-positive window silently reports zero completions forever
    withinMicros.foreach(w => require(w > 0, s"window must be positive: $w"))
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TypedEvent], state: GroupState[Seq[Long]]) =>
          var chain = state.getOption.getOrElse(Seq.empty[Long])
          val hits = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
          batch.toSeq
            .filter(e => stepIdx.contains(e.event_type))
            .sortBy(e => (micros(e), e.event_type))
            .foreach { e =>
              val us = micros(e)
              val next = chain.size
              if (next < steps.size && stepIdx(e.event_type) == next &&
                  (chain.isEmpty || us > chain.last)) {
                chain = chain :+ us
                if (chain.size == steps.size) {
                  if (withinMicros.forall(w => chain.last - chain.head <= w))
                    hits += FunnelHit(uid, chain)
                  chain = Seq.empty // completed: fresh chain may start
                }
              }
            }
          if (chain.nonEmpty) state.update(chain) else state.remove()
          hits.iterator
      }
  }

  /** STREAMING funnel under OUT-OF-ORDER delivery (r13 VERDICT #6): real
    * streams are not in-order, and [[funnelState]]'s consume-irrevocably
    * relaxation lets a late step event miss its chain. This variant
    * BUFFERS the step events per user (bounded: events inside the
    * lateness window all carry — their population is capped by the
    * watermark delay SLA × arrival rate, the stream-stream-join state
    * model — while WATERMARK-SEALED events keep only the earliest
    * `maxPerStep` per non-final step, trimmed only AFTER the batch's
    * epochs consume; only a user cycling through more than maxPerStep
    * SEALED same-step events can lose later re-entry chains) and
    * RE-RESOLVES the batch operator's greedy earliest-completion chain
    * over the buffer each micro-batch.
    *
    * A completed chain is emitted only once it is WATERMARK-SEALED
    * (completion time ≤ current watermark): any event still admissible
    * has ts ≥ watermark ≥ every chain time, and the greedy chain is built
    * from minima, so no admissible future event can alter it — under any
    * arrival order the emitted chains equal the batch operator over the
    * delivered events (StreamingSpec shuffles delivery and pins it). A
    * chain that completes ahead of the watermark registers an event-time
    * timeout at its completion instant, so it emits as soon as the
    * watermark passes even if the user never sends another event.
    * Consumed epochs clear their events; re-entering events chain afresh,
    * the same re-entry contract as [[funnelState]].
    *
    * 100 TB note: state per user is ≤ steps·maxPerStep (step, micros)
    * pairs — bounded regardless of volume; the watermark (`delay`) is the
    * lateness SLA, applied here so callers pass the raw typed stream.
    *
    * `idleTtlMicros` (default 7 event-time days) evicts a user's PARTIAL
    * chain once the watermark passes the last buffered event by that
    * horizon — without it a user who stalls mid-funnel holds state
    * forever. This is a deliberate bounded-state default, same spirit as
    * maxPerStep: a funnel whose steps legitimately span longer than the
    * TTL must RAISE it (e.g. Long.MaxValue / 2 for effectively-unbounded
    * retention), or late completions past the horizon re-enter as fresh
    * chains instead of completing the evicted one. */
  def funnelStateBuffered(events: Dataset[TypedEvent], steps: Seq[String],
                          withinMicros: Option[Long] = None,
                          delay: String = "10 seconds",
                          maxPerStep: Int = 256,
                          idleTtlMicros: Long = 7L * 24 * 3600 * 1000000L)
      : Dataset[FunnelHit] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    require(maxPerStep >= 1, s"maxPerStep must be >= 1: $maxPerStep")
    require(idleTtlMicros > 0, s"idleTtlMicros must be > 0: $idleTtlMicros")
    withinMicros.foreach(w => require(w > 0, s"window must be positive: $w"))
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(Int, Long)], FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[TypedEvent],
         state: GroupState[Seq[(Int, Long)]]) =>
          // ArrayBuffer accumulation: per-event `Seq :+` on the default
          // List is O(n) — O(n²) per micro-batch for a hot user near the
          // state bound (r19 review); one distinct pass stays
          val acc = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Long)]
          acc ++= state.getOption.getOrElse(Seq.empty[(Int, Long)])
          batch.foreach { e =>
            stepIdx.get(e.event_type).foreach(si => acc += (si -> micros(e)))
          }
          var buf: Seq[(Int, Long)] = acc.toSeq
          buf = buf.distinct
          // BATCH execution strips the watermark node entirely
          // (EliminateEventTimeWatermark), and getCurrentWatermarkMs
          // throws without one — a backfill replay over a batch Dataset
          // must behave as "everything delivered, everything sealed"
          // (watermark = +inf), not crash (review r18-5). The huge-but-
          // not-MaxValue seal keeps the *1000 and TTL sums overflow-free.
          val (wmMs, isBatch) =
            try (state.getCurrentWatermarkMs(), false)
            catch { case _: UnsupportedOperationException =>
              (Long.MaxValue / 4000L, true) }
          val wmUs = wmMs * 1000L
          // the batch operator's greedy chain over the buffered events
          def resolve(): Option[Vector[Long]] = {
            var chain = Vector.empty[Long]
            var i = 0
            while (i < k) {
              val next = buf.iterator
                .filter(e => e._1 == i && (chain.isEmpty || e._2 > chain.last))
                .map(_._2)
              if (next.isEmpty) return None
              chain = chain :+ next.min
              i += 1
            }
            Some(chain)
          }
          val hits = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
          var pendingTimeoutMs: Option[Long] = None
          var done = false
          while (!done) {
            resolve() match {
              case Some(chain) if chain.last <= wmUs =>
                if (withinMicros.forall(w => chain.last - chain.head <= w))
                  hits += FunnelHit(uid, chain)
                buf = buf.filter(_._2 > chain.last) // consume the epoch
              case Some(chain) =>
                // complete but not sealed: wake up when the watermark
                // passes the completion instant (ceil to ms)
                pendingTimeoutMs = Some(chain.last / 1000L + 1L)
                done = true
              case None => done = true
            }
          }
          // Bound the CARRIED state only AFTER this batch's epochs have
          // consumed (trimming first would throw away events a
          // just-resolved epoch's successor needs). Events INSIDE the
          // lateness window (ts > watermark) are never count-trimmed —
          // a late-arriving earlier-step anchor may still need ANY of
          // them (review r18-5: the old uniform earliest-maxPerStep trim
          // dropped in-window later-step events a late anchor needed,
          // losing genuine completions); their population is bounded by
          // the watermark delay SLA x arrival rate, the same state model
          // as a stream-stream join. SEALED events (ts <= watermark):
          // last-step ones are provably dead (their predecessors would
          // need ts < watermark — no longer admissible — and resolve()
          // already consumed every sealed chain), the rest keep the
          // earliest maxPerStep per step — a user cycling through more
          // than maxPerStep sealed same-step events can lose later
          // re-entry chains, the documented bounded-state relaxation.
          buf = buf.groupBy(_._1).iterator.flatMap { case (si, es) =>
            val (sealed0, fresh) = es.partition(_._2 <= wmUs)
            val sealedKept =
              if (si == k - 1) Nil
              else sealed0.sortBy(_._2).take(maxPerStep)
            sealedKept ++ fresh
          }.toSeq
          // TTL: a user who stalls mid-funnel would otherwise keep state
          // resident forever. Once the watermark is idleTtlMicros past the
          // LAST buffered event, the partial chain is evicted — a late
          // completing event after that horizon starts afresh (documented
          // bounded-state relaxation, same spirit as maxPerStep).
          val lastUs = if (buf.isEmpty) 0L else buf.iterator.map(_._2).max
          val expired =
            pendingTimeoutMs.isEmpty && wmUs >= lastUs + idleTtlMicros
          if (buf.nonEmpty && !expired) {
            state.update(buf)
            // Always arm a wake-up: the chain-seal instant when one is
            // pending, else the TTL horizon (so eviction fires without
            // needing another event from this user).
            // single division AFTER the sum: two independent floors could
            // land the timer ~1 ms before the horizon, firing a wake-up
            // whose expiry check then fails (review r14).
            // NOT in batch: the one-shot replay has no timers, and BOTH
            // getCurrentWatermarkMs and setTimeoutTimestamp throw without
            // a watermark — reachable whenever a backfill leaves
            // unexpired state, e.g. a raised idleTtlMicros (r19 review;
            // the wmMs fallback above already knows the mode)
            if (!isBatch)
              state.setTimeoutTimestamp(math.max(
                pendingTimeoutMs
                  .getOrElse((lastUs + idleTtlMicros) / 1000L + 1L),
                wmMs + 1L))
          } else state.remove()
          hits.iterator
      }
  }
}
