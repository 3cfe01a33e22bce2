package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expressions of the engine's window operators
  * (SURVEY.md §2.10 / §7.2 phase E): the same computations the batch queries
  * declare, over an unbounded `events` stream.
  */
object StreamOps {

  /** Tumbling-window counts/averages per event type with a watermark: the
    * streaming form of the daily aggregation behind q04/q06. `complete`
    * output in tests; on a real stream use append + watermark-closed windows.
    */
  def windowedTypeStats(events: DataFrame, window_ : String = "1 day", watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("avg_value"))

  /** Sliding-window per-type counts: each event lands in window_/slide
    * windows (epoch-aligned). Same watermarked stateful-agg machinery as
    * the tumbling form above, multiplied state ∝ window_/slide.
    */
  def slidingTypeCounts(
      events: DataFrame,
      window_ : String = "7 days",
      slide: String = "1 day",
      watermark: String = "7 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  case class SessionState(lastTs: Long, sessions: Long, events: Long)

  /** Stateful sessionization via flatMapGroupsWithState — the streaming
    * equivalent of the batch q24 (gap > `gapSeconds` starts a session).
    * Within a micro-batch the group's events are sorted by (ts, event_id);
    * state carries (last event time, session count) across batches.
    *
    * BOUNDED-REPLAY FORM ONLY: per-user state under NoTimeout grows with
    * the number of distinct users ever seen — the Update-mode running
    * totals (n_sessions/n_events since the beginning of time) require
    * exactly that unbounded memory. The production operator is
    * [[sessionizeEventTtl]], which emits per-SESSION rows in append mode
    * and evicts each user's state one gap after their last event — for
    * sessionization that eviction is LOSSLESS (see its contract), so
    * unbounded state buys nothing but the running-total output shape.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapSeconds: Long): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            val newSession = s.lastTs == Long.MinValue || (t - s.lastTs) > gapSeconds * 1000
            s = SessionState(t, s.sessions + (if (newSession) 1 else 0), s.events + 1)
          }
          state.update(s)
          Iterator(SessionSummary(userId, s.sessions, s.events))
      }
  }

  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)
  case class OpenSession(start: Timestamp, last: Timestamp, lastId: Long, n: Long)

  /** Event-time μs of a Timestamp: getTime() floors to ms, so sub-ms
    * precision (the testdata ships μs-precision events) must come from the
    * nanos field — ordering/gap arithmetic at anything coarser than the
    * data's own precision silently disagrees with a batch min/max(ts)
    * oracle on same-ms ties.
    */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** EVENT-TIME-TTL'd sessionization — the PRODUCTION form of
    * [[sessionize]] for an unbounded user key space (the q24/q28 family's
    * 100-TB shape). Emits one append-mode row per CLOSED session
    * (user_id, session_start, session_end, n_events); a session closes when
    *
    *  - a later event of the same user arrives with gap > `gapSeconds`
    *    (enforced INSIDE the fold), or
    *  - the event-time watermark passes lastTs + gap and the state-store
    *    timeout flushes it (EventTimeTimeout; per-user state is REMOVED,
    *    so a quiet user costs nothing after one gap).
    *
    * Unlike [[transitionsEventTtl]] — where the TTL intentionally DROPS
    * pairs spanning a quiet gap — this eviction is LOSSLESS: once the
    * watermark passes lastTs + gap, every event the engine will still
    * accept (ts ≥ watermark) necessarily starts a NEW session under the
    * same gap rule, so flushing the old session early can never change
    * which sessions exist or their contents. Output is therefore a pure
    * function of the events plus the final watermark (which only gates
    * WHICH trailing sessions have flushed yet), and a replay value-checks
    * against the batch lag()-window sessionization (q236): a session
    * appears iff it is followed by a later same-user session, or
    * floor-ms(session_end) + gap·1000 < floor-ms(max ts) − watermarkDelay
    * (the engine's ms-granularity watermark/timeout arithmetic, mirrored
    * exactly in the oracle via epoch_ms).
    *
    * Gap comparisons inside the fold run on integer MICROSECONDS (strict
    * `>`, matching the batch `epoch(ts − prev) > gap` predicate exactly);
    * the stale-straggler guard of [[transitionsEventTtl]] applies verbatim:
    * a cross-batch arrival at or before the user's state (μs, event_id) is
    * skipped — no emission, no state regression — so disorder within the
    * watermark costs at most that event's own membership, never a
    * corrupted session chain.
    */
  def sessionizeEventTtl(
      spark: SparkSession,
      events: Dataset[Event],
      gapSeconds: Long,
      watermarkDelay: String): Dataset[Session] = {
    import spark.implicits._
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n))
          } else {
            val sorted = it.toVector.sortBy(e => (micros(e.ts), e.event_id))
            val out = Vector.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case None =>
                  cur = Some(OpenSession(e.ts, e.ts, e.event_id, 1L))
                case Some(s) =>
                  val last = micros(s.last)
                  // stale cross-batch straggler: skip (see header)
                  if (!(t < last || (t == last && e.event_id <= s.lastId))) {
                    if (t - last > gapUs) {
                      out += Session(userId, s.start, s.last, s.n)
                      cur = Some(OpenSession(e.ts, e.ts, e.event_id, 1L))
                    } else {
                      cur = Some(OpenSession(s.start, e.ts, e.event_id, s.n + 1))
                    }
                  }
              }
            }
            cur.foreach { s =>
              val wm = state.getCurrentWatermarkMs()
              if (s.last.getTime + gapMs < wm) {
                // the open session is ALREADY gap-expired against the current
                // watermark — possible when the only arrivals this batch were
                // skipped stale stragglers, so the fold never closed it but
                // its timeout would have fired this very trigger. Emit now
                // and drop state: re-arming at wm+1 would strand the session
                // forever if the watermark never advances again, diverging
                // from the "pure function of events + final watermark"
                // contract (q236's oracle closure predicate).
                if (state.exists) state.remove()
                out += Session(userId, s.start, s.last, s.n)
              } else {
                state.update(s)
                // timeout must land strictly beyond the current watermark; a
                // session already past its gap flushes next trigger
                state.setTimeoutTimestamp(
                  math.max(s.last.getTime + gapMs, wm + 1))
              }
            }
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup — the streaming leg of the LLM dedup suite: drop
    * any row whose content digest has been seen before, emitting the FIRST
    * occurrence (append mode). State holds one digest per distinct row,
    * expired by the watermark: duplicates are recognized only within the
    * watermark horizon — the standard bounded-state trade for an unbounded
    * stream (exact global dedup of an infinite stream needs infinite state).
    * At scale the state is ~32 B per distinct key in the horizon, sharded by
    * digest across executors.
    */
  def dedupByDigest(
      events: DataFrame,
      digest: org.apache.spark.sql.Column,
      tsCol: String,
      watermark: String): DataFrame =
    events
      .withColumn("_digest", digest)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_digest")
      .drop("_digest")

  /** Stream-static enrichment join: each micro-batch joins against a static
    * dimension snapshot — the streaming leg of the star join (J1). The
    * static side is explicitly broadcast: a dimension small enough to
    * snapshot per batch is small enough to ship to every executor, and the
    * alternative (shuffling every micro-batch on the join key) adds a
    * per-batch exchange on the unbounded side. Inner stream-static joins are
    * stateless — no watermark needed.
    */
  def enrich(stream: DataFrame, dim: DataFrame, joinExpr: org.apache.spark.sql.Column): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), joinExpr)

  /** Stream-stream inner interval join (the J-family × phase E): each left
    * row pairs with right rows of the same key whose event time falls in
    * [leftTs − before, leftTs]. Both sides carry watermarks AND the join
    * condition bounds the two event times against each other — together
    * they let Spark expire join state (a right row is dropped once the
    * left watermark passes rightTs + before), so state stays bounded on an
    * unbounded stream. Append-mode only, per the stream-stream contract.
    *
    * `before` is a SQL interval literal body, e.g. "1 hour".
    */
  def intervalJoin(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      before: String,
      watermark: String): DataFrame =
    left
      .withWatermark(leftTs, watermark)
      .join(
        right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
          col(rightTs) <= col(leftTs))

  /** Per-user event-type transitions as a stateful streaming operator: the
    * streaming form of the batch lead()-window transition counting (q208).
    * State carries the last event (time, id, type) per user across
    * micro-batches; each batch's group slice is sorted by (ts, event_id)
    * before folding, so with in-order arrival the emitted (src, dst) pairs
    * equal the batch window exactly. State is O(1) per user, sharded by
    * user key — the bounded-state analog of the batch shuffle.
    */
  case class TypedEvent(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  case class Transition(src: String, dst: String)
  case class TransState(lastTs: Long, lastId: Long, lastType: String)

  def transitions(
      spark: SparkSession,
      events: Dataset[TypedEvent],
      stateTtl: Option[String] = None): Dataset[Transition] = {
    import spark.implicits._
    // Production contract: pass a TTL ("30 minutes") so per-user state is
    // EVICTED once a user goes quiet — on an unbounded user key space,
    // NoTimeout grows the state store forever. The bounded replay harness
    // (and the batch-oracle equivalence) keeps the NoTimeout default: an
    // evicted user's next event starts a fresh chain, so a TTL'd stream
    // intentionally drops the transition that spans the quiet gap.
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Long, it: Iterator[TypedEvent], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            var prev = state.getOption
            val out = Vector.newBuilder[Transition]
            sorted.foreach { e =>
              prev.foreach(p => out += Transition(p.lastType, e.event_type))
              prev = Some(TransState(e.ts.getTime, e.event_id, e.event_type))
            }
            prev.foreach(state.update)
            stateTtl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** EVENT-TIME-TTL'd transitions — the production form of [[transitions]]
    * for an unbounded user key space: a (src → dst) pair is emitted iff dst
    * follows src for the user AND dst.ts − src.ts ≤ `ttl`; per-user state is
    * EVICTED by the state store once the event-time watermark passes
    * lastTs + ttl (EventTimeTimeout), so a user who goes quiet costs nothing
    * after one TTL. The gap rule is ALSO enforced inside the fold, which
    * makes the OUTPUT a pure function of the event data — independent of
    * micro-batch boundaries and of exactly when eviction fires (eviction may
    * lag the watermark by a trigger; an un-evicted quiet chain still never
    * emits a spanning pair). That purity is what lets a replay value-check
    * against a batch lead()-window oracle (q232) while keeping state
    * bounded. Events later than the watermark are dropped by the engine
    * before the operator (standard late-data filtering).
    *
    * Out-of-order arrivals WITHIN the watermark: inside one micro-batch the
    * fold sorts by (ts, event_id), so disorder there is invisible; an event
    * that arrives in a LATER batch but carries an event time at or before
    * the user's current state is STALE — it is skipped (no emission, no
    * state regression), never folded as a bogus negative-gap transition.
    * The purity contract is therefore: output equals the batch gap-filtered
    * lead() window whenever cross-batch arrival respects per-user (ts, id)
    * order; a cross-batch straggler costs at most its own two adjacent
    * pairs, and can never fabricate a pair the oracle lacks or corrupt
    * later chains by moving state backwards.
    */
  def transitionsEventTtl(
      spark: SparkSession,
      events: Dataset[TypedEvent],
      ttl: scala.concurrent.duration.FiniteDuration,
      watermarkDelay: String): Dataset[Transition] = {
    import spark.implicits._
    val ttlMs = ttl.toMillis
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[TypedEvent], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            var prev = state.getOption
            val out = Vector.newBuilder[Transition]
            sorted.foreach { e =>
              // stale cross-batch straggler (event time not after the
              // state's): skip — folding it would emit a negative-gap pair
              // the batch oracle never produces and regress state to an
              // older event, corrupting every later gap in the chain
              val stale = prev.exists(p =>
                e.ts.getTime < p.lastTs ||
                  (e.ts.getTime == p.lastTs && e.event_id <= p.lastId))
              if (!stale) {
                prev.foreach { p =>
                  if (e.ts.getTime - p.lastTs <= ttlMs)
                    out += Transition(p.lastType, e.event_type)
                }
                prev = Some(TransState(e.ts.getTime, e.event_id, e.event_type))
              }
            }
            prev.foreach { p =>
              state.update(p)
              // the engine requires a timeout strictly beyond the current
              // watermark; a chain already past its TTL evicts next trigger
              state.setTimeoutTimestamp(
                math.max(p.lastTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming Count-Min maintenance: the identical declarative sketch
    * graft.functions.CountMin.sketch builds in batch, maintained
    * incrementally over an unbounded stream (same expression tree — the
    * streaming planner turns the groupBy into a stateful agg). The state is
    * BOUNDED BY CONSTRUCTION: at most depth·width keys regardless of stream
    * length or item cardinality, which is what makes an unwatermarked
    * running aggregation safe here — contrast per-key aggregations over
    * unbounded key spaces, which need watermark eviction. This is the
    * streaming answer to "frequency profile of an unbounded ingest feed":
    * heavy-hitter estimates at any moment via CountMin.estimate on the
    * current cell table.
    */
  def cmsCells(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      depth: Int,
      width: Int): DataFrame =
    graft.functions.CountMin.sketch(stream, item, depth, width)

  /** WINDOWED streaming Count-Min — the frequency member of the
    * sketch × event-time-window matrix (HLL: [[windowedHllCells]],
    * histogram: [[windowedHistCells]], THIS: frequency): per tumbling
    * window the same depth·width cell table as [[cmsCells]],
    * watermark-CLOSED in append mode — state is bounded at
    * (open windows)·depth·width cells and old windows evict, unlike the
    * running [[cmsCells]] whose single sketch lives forever by design.
    * Returns (ws = window start, d, bucket, cnt); per-window frequency
    * estimates via CountMin.estimate over any one window's drained cells.
    */
  def windowedCmsCells(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      depth: Int,
      width: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame = {
    val hashed = graft.functions.TextFunctions.bindOnce(item) { it =>
      org.apache.spark.sql.functions.array(
        (0 until depth).map(d => graft.functions.CountMin.bucket(it, d, width)): _*)
    }
    stream.where(item.isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"), posexplode(hashed).as(Seq("d", "bucket")))
      .groupBy(window(col("ts"), window_), col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("d"), col("bucket"), col("cnt"))
  }

  /** Streaming HyperLogLog maintenance — the distinct-count dual of
    * [[cmsCells]]: the same declarative cell table
    * graft.functions.HyperLogLog.cells builds in batch, maintained as a
    * running streaming aggregation (the planner turns the groupBy-max into
    * a stateful agg). State is BOUNDED BY CONSTRUCTION at 2^p cells
    * regardless of stream length or key cardinality — "how many distinct
    * users/tokens has this unbounded feed seen" at any moment via
    * HyperLogLog.estimate over the current cells.
    */
  def hllCells(stream: DataFrame, item: org.apache.spark.sql.Column, p: Int): DataFrame =
    graft.functions.HyperLogLog.cells(stream, item, p)

  /** WINDOWED streaming HyperLogLog — the sketch × event-time-window
    * composition ("distinct users per day" on an unbounded feed): per
    * tumbling window the same ≤ 2^p cell table as [[hllCells]], with the
    * watermark CLOSING windows in append mode — state is bounded at
    * (open windows)·2^p cells and old windows are evicted, unlike the
    * running [[hllCells]] whose single sketch lives forever by design.
    * Returns (ws = window start, bucket, r); estimate per window via
    * HyperLogLog.estimate over the drained cells (q241).
    */
  def windowedHllCells(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      p: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    stream.where(item.isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), window_),
        graft.functions.HyperLogLog.bucket(item, p).as("bucket"))
      .agg(max(graft.functions.HyperLogLog.rho(item)).as("r"))
      .select(col("window.start").as("ws"), col("bucket"), col("r"))

  /** Streaming fixed-bin histogram maintenance — the order-statistics third
    * of the sketch tier ([[cmsCells]] = frequency, [[hllCells]] = distinct):
    * the same cell table graft.functions.QuantileSketch.cells builds in
    * batch, maintained as a running streaming groupBy-count. State is
    * BOUNDED BY CONSTRUCTION at `bins` cells regardless of stream length —
    * "what is the p99 of this unbounded feed right now" at any moment via
    * QuantileSketch.quantiles over the current cells.
    */
  def histCells(
      stream: DataFrame,
      value: org.apache.spark.sql.Column,
      lo: Double,
      hi: Double,
      bins: Int): DataFrame =
    graft.functions.QuantileSketch.cells(stream, value, lo, hi, bins)

  /** WINDOWED streaming fixed-bin histogram — the sketch × event-time
    * window composition for ORDER STATISTICS ("this hour's value
    * distribution", the [[windowedHllCells]] dual): per tumbling window
    * the same dyadic-width bin cells as [[histCells]], watermark-CLOSED in
    * append mode — state is bounded at (open windows)·bins cells and old
    * windows evict, unlike the running [[histCells]] whose single
    * histogram lives forever by design. Returns (ws = window start, bin,
    * cnt); read quantiles per window via QuantileSketch.quantiles over the
    * drained cells, or score distribution drift per window against a
    * reference with [[graft.operators.Drift.psiByPeriod]] (q254).
    */
  def windowedHistCells(
      stream: DataFrame,
      value: org.apache.spark.sql.Column,
      lo: Double,
      hi: Double,
      bins: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    stream.where(value.isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), window_),
        graft.functions.QuantileSketch.bin(value, lo, hi, bins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("bin"), col("cnt"))

  /** WINDOWED streaming EMBEDDING-marginal cells — the drift tier's
    * embedding substrate ([[graft.operators.Drift.embeddingCells]]) as a
    * watermark-closed per-window form, so a standing deployment drains
    * per-day per-dimension component marginals and schedules
    * `Drift.embeddingPsiByPeriod` / `Drift.ksByPeriod(keyCols = Seq("dim"))`
    * over them (one posexplode pass, two alarm semantics — the q254/q268
    * pattern extended to the embedding column type): posexplode the vector,
    * bin each component at the declared (lo, hi, bins) (the
    * QuantileSketch dyadic-width clamp — identical bins to the batch
    * build), count per (window, keyCols…, dim, bin). State is bounded at
    * (open windows) × keys × dims × bins cells and old windows evict in
    * append mode. Returns (ws = window start, keyCols…, dim, bin, cnt) —
    * cells from different drains merge like any fixed-range cell table
    * (same declaration, QuantileSketch.merge with `keyCols :+ "dim"`).
    * Deliberately centroid-free, like the batch form: every bin decision
    * is a pure function of raw component values and literals, so a second
    * engine re-derives the drained cells exactly.
    */
  def windowedEmbeddingCells(
      stream: DataFrame,
      embCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour",
      keyCols: Seq[String] = Nil): DataFrame = {
    val clash = Set("dim", "pos", "col").intersect(keyCols.toSet)
    require(clash.isEmpty,
      s"windowedEmbeddingCells reserves (dim, pos, col) as working columns: " +
        s"$clash — rename them")
    stream.where(col(embCol).isNotNull)
      .withWatermark("ts", watermark)
      .select((col("ts") +: keyCols.map(col)) :+ posexplode(col(embCol)): _*)
      .withColumnRenamed("pos", "dim")
      // drop null COMPONENTS, not just null arrays — the batch build
      // (QuantileSketch.cells) drops null values before binning, and the
      // "identical bins to the batch build" contract needs this side to
      // match; without it a null component would land in a bin=NULL cell
      // and inflate the per-(window, dim) totals
      .where(col("col").isNotNull)
      .groupBy((window(col("ts"), window_) +: keyCols.map(col)) ++ Seq(col("dim"),
        graft.functions.QuantileSketch.bin(col("col").cast("double"), lo, hi, bins)
          .as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
      .select((col("window.start").as("ws") +: keyCols.map(col)) ++
        Seq(col("dim"), col("bin"), col("cnt")): _*)
  }

  /** Streaming KMV maintenance — the distinct-SAMPLE fourth of the running
    * sketch tier ([[cmsCells]] = frequency, [[hllCells]] = count,
    * [[histCells]] = order statistics): per-group bottom-k buffers
    * maintained as a running streaming aggregation (complete mode). State
    * is BOUNDED BY CONSTRUCTION at one ≤ 2k-entry (hash, item) buffer per
    * group — "show me k representative distinct users of this unbounded
    * feed, and how many there are" at any moment via
    * graft.functions.Kmv.explodeBufs + Kmv.estimate over the drained
    * buffers (the batch estimator applies unchanged, q242/q246).
    */
  def kmvBufs(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      k: Int,
      groupCols: Seq[String] = Nil): DataFrame =
    graft.functions.Kmv.bufs(stream, item, k, groupCols)

  /** WINDOWED streaming KMV — the distinct-SAMPLE member of the
    * sketch × event-time-window matrix ("k representative distinct users
    * per day, plus how many there were"): per tumbling window one bounded
    * bottom-k buffer, watermark-closed in append mode — state =
    * (open windows) · ≤ 2k entries, old windows evict, unlike the running
    * [[kmvBufs]] whose buffers live forever by design. Returns
    * (ws = window start, _buf); explode with
    * `Kmv.explodeBufs(df, Seq("ws"))` and estimate per window with
    * `Kmv.estimate` — the batch read-offs apply unchanged (q256).
    */
  def windowedKmvBufs(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      k: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    stream.where(item.isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"), graft.functions.Kmv.hash(item).as("h"),
        item.cast("string").as("item"))
      .groupBy(window(col("ts"), window_))
      .agg(graft.functions.Kmv.aggExpr(k, col("h"), col("item")).as("_buf"))
      .select(col("window.start").as("ws"), col("_buf"))

  /** WINDOWED streaming ES weighted sample — the weighted-SAMPLE member of
    * the sketch × event-time-window matrix ("this day's weight-proportional
    * k-item sample per group"): per (tumbling window, `groupCol`) one
    * bounded top-k buffer over the ES keys, watermark-closed in append
    * mode — state = (open windows · groups) · ≤ 2k entries. Returns
    * (ws, groupCol, _tk); explode with
    * `TopK.explodeBufs(df, Seq("ws", groupCol))` — sim/id/tag are the
    * es_key/id/weight columns, exactly the [[esBufs]] read-off (q257).
    */
  def windowedEsBufs(
      stream: DataFrame,
      groupCol: String,
      idCol: String,
      weight: org.apache.spark.sql.Column,
      k: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.WeightedSample
    stream
      .where(col(idCol).isNotNull && weight.isNotNull && weight > 0)
      .select(col("ts"), col(groupCol),
        WeightedSample.esKey(col(idCol), weight).as("_ek"),
        col(idCol).cast("long").as("_id"),
        WeightedSample.checkedWeight(weight).as("_w"))
      .withWatermark("ts", watermark)
      // the TopK null contract (bufsPerKey's filter, owned here)
      .filter(col("_ek").isNotNull && col("_id").isNotNull && col("_w").isNotNull)
      .groupBy(window(col("ts"), window_), col(groupCol))
      .agg(graft.functions.TopK.aggExpr(k, col("_ek"), col("_id"), col("_w")).as("_tk"))
      .select(col("window.start").as("ws"), col(groupCol), col("_tk"))
  }

  /** Streaming Efraimidis–Spirakis weighted sample — the weighted-SAMPLE
    * fifth of the running sketch tier ([[cmsCells]] = frequency,
    * [[hllCells]] = distinct count, [[histCells]] = order statistics,
    * [[kmvBufs]] = uniform distinct sample): per-group bounded top-k
    * buffers over the ln(u)/w ES keys (operators/WeightedSample) maintained
    * as a running streaming aggregation (complete mode, the kmvBufs
    * discipline verbatim). State is BOUNDED BY CONSTRUCTION at one
    * ≤ 2k-entry buffer per group, and the aggregator's merge is re-top-k,
    * so the drained sample is a pure function of the rows seen — "give me
    * a weight-proportional k-doc sample of this unbounded feed per group,
    * right now" with batch-identical membership
    * (WeightedSample.explodeBufs over the drained buffers, q250).
    */
  def esBufs(
      stream: DataFrame,
      groupCol: String,
      idCol: String,
      weight: org.apache.spark.sql.Column,
      k: Int): DataFrame =
    graft.operators.WeightedSample.bufs(stream, groupCol, idCol, weight, k)

  /** Streaming ADAPTIVE dyadic histogram — the unknown-range order-statistics
    * leg ([[histCells]] needs a declared (lo, hi); a stream of an unseen
    * column has neither a declared range nor a second pass for
    * QuantileSketch.probeRange): per-group bounded buffers whose dyadic bin
    * width 2^scale escalates as the observed span grows
    * (functions/AdaptiveHist — deterministic q-digest-style escalation, so
    * the drained cells are a pure function of the values seen and a batch
    * oracle re-derives scale and cells exactly). State is BOUNDED BY
    * CONSTRUCTION at one ≤ 2·maxBins-entry buffer per group; merge aligns
    * scales (floorDiv) and sums — the running-aggregation contract of the
    * rest of the sketch tier (q251).
    */
  def adaptiveHistBufs(
      stream: DataFrame,
      value: org.apache.spark.sql.Column,
      maxBins: Int,
      groupCols: Seq[String] = Nil,
      minScale: Int = 0): DataFrame =
    graft.functions.AdaptiveHist.bufs(stream, value, maxBins, groupCols, minScale)

  /** WINDOWED streaming ADAPTIVE histogram — the sixth and last cell of
    * the sketch × event-time-window matrix (CMS/HLL/fixed-histogram/KMV/ES
    * all have watermark-closed per-window forms; this adds the
    * unknown-range order-statistics member): per (tumbling window,
    * `groupCols`) one bounded [[graft.functions.AdaptiveHistAgg]] buffer,
    * watermark-closed in append mode — state = (open windows · groups) ·
    * ≤ 2·maxBins entries, old windows evict.
    *
    * The windowed subtlety vs the running [[adaptiveHistBufs]]: each
    * window's scale escalates INDEPENDENTLY, driven by its own observed
    * span — a wide-range Monday lands at a coarse 2^s while a narrow
    * Tuesday keeps fine bins, exactly what "this day's value
    * distribution" wants (the running form would hold every day at the
    * lifetime-span scale). Each drained window equals
    * `AdaptiveHist.cells` of that window's batch slice by the aggregator's
    * determinism contract (scale = the smallest span-fitting s — a pure
    * function of the window's value multiset, independent of micro-batch
    * boundaries and merge shape). Returns (ws = window start,
    * groupCols..., _ah); explode with
    * `AdaptiveHist.explodeBufs(df, "ws" +: groupCols)` and read quantiles
    * with `AdaptiveHist.quantiles` — the batch read-offs apply unchanged
    * (q259).
    */
  def windowedAdaptiveHistBufs(
      stream: DataFrame,
      value: org.apache.spark.sql.Column,
      maxBins: Int,
      groupCols: Seq[String] = Nil,
      minScale: Int = 0,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    stream.where(value.isNotNull)
      .select(col("ts") +: groupCols.map(col) :+ value.cast("double").as("_v"): _*)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_) +: groupCols.map(col): _*)
      .agg(graft.functions.AdaptiveHist.aggExpr(maxBins, col("_v"), minScale).as("_ah"))
      .select(col("window.start").as("ws") +: groupCols.map(col) :+ col("_ah"): _*)

  /** Streaming Bloom-filter cells — the membership sketch as a running
    * aggregation (an unbounded item feed folds into a FIXED bit budget):
    * per-group (word, bits) rows maintained by `bit_or`, state BOUNDED BY
    * CONSTRUCTION at ≤ ⌈m/32⌉ rows per group regardless of stream length.
    * OR is associative/commutative/idempotent, so the drained cells are a
    * pure function of the item SET seen — micro-batch boundaries, replays,
    * and merge shape cannot move a bit (the batch oracle re-derives every
    * word exactly; no other member of the sketch tier has idempotence, so
    * this is the one sketch that is also replay-tolerant). Probe the
    * drained cells with [[graft.functions.Bloom.positiveItems]]; the
    * standing-service use is the decontamination index
    * ([[graft.operators.Decontaminate.benchIndex]]) absorbing benchmark
    * additions as they arrive.
    */
  def bloomCells(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      m: Int,
      k: Int,
      groupCols: Seq[String] = Nil): DataFrame =
    graft.functions.Bloom.cells(stream, item, m, k, groupCols)

  /** WINDOWED streaming Bloom cells — the membership sketch joins the
    * event-time-window matrix (its seventh member, after the six
    * frequency/distinct/order-statistics/sample cells): per tumbling
    * window one ≤ ⌈m/32⌉-row (word, bits) filter over the window's item
    * set, watermark-closed in append mode — state = (open windows) ·
    * ⌈m/32⌉ cells, old windows evict, unlike the running [[bloomCells]]
    * whose single filter absorbs forever by design. The ask it answers:
    * "give me each day's membership filter as a stored artifact" —
    * per-day filters probe independently
    * ([[graft.functions.Bloom.positiveItems]] with `ws` in groupCols),
    * OR-merge into coarser periods losslessly (merge ≡ whole-data build),
    * and inherit the one-sidedness contract per window. Returns
    * (ws = window start, word, bits).
    */
  def windowedBloomCells(
      stream: DataFrame,
      item: org.apache.spark.sql.Column,
      m: Int,
      k: Int,
      window_ : String = "1 day",
      watermark: String = "1 hour"): DataFrame = {
    // same fail-loud contract as every batch Bloom entry point — an
    // unguarded (m, k) would emit silently corrupt cells (negative
    // positions truncate to the wrong word and wrap the shift)
    graft.functions.Bloom.checkParams(m, k)
    // the word/mask packing mirrors Bloom.cells (the window() grouping
    // expression is why this can't delegate to it directly)
    stream.where(item.isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(graft.functions.Bloom.positions(item, m, k)).as("_pos"))
      .select(col("ts"),
        (col("_pos") / 32).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT))").as("_mask"))
      .groupBy(window(col("ts"), window_), col("word"))
      .agg(expr("bit_or(_mask)").as("bits"))
      .select(col("window.start").as("ws"), col("word"), col("bits"))
  }

  /** Streaming trend detection (the VEG adjacent-period comparison as a
    * stateful operator): per (event_type) group, compare each micro-batch's
    * day-average against the previous day's retained in state and emit
    * up/down/flat transitions.
    */
  case class DayStat(event_type: String, day: java.sql.Date, avg_value: Double)
  case class Trend(event_type: String, day: java.sql.Date, trend: String)
  case class TrendState(lastDay: Long, lastAvg: Double)

  def trendDetect(spark: SparkSession, days: Dataset[DayStat], band: Double = 0.05): Dataset[Trend] = {
    import spark.implicits._
    days
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[DayStat], state: GroupState[TrendState]) =>
          val sorted = it.toVector.sortBy(_.day.getTime)
          val out = Vector.newBuilder[Trend]
          var s = state.getOption.orNull
          sorted.foreach { d =>
            if (s != null) {
              val label =
                if (d.avg_value > s.lastAvg * (1 + band)) "up"
                else if (d.avg_value < s.lastAvg * (1 - band)) "down"
                else "flat"
              out += Trend(key, d.day, label)
            }
            s = TrendState(d.day.getTime, d.avg_value)
          }
          if (s != null) state.update(s)
          out.result().iterator
      }
  }
}
