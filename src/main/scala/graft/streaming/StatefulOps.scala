package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming (per-record incremental) forms of the reference's four keyed
  * stateful operators, as `flatMapGroupsWithState` transforms over typed
  * Datasets. These carry the Flink keyed-state semantics faithfully:
  * one state object per key, per-record emission, explicit clear/reset.
  *
  * State-shape mapping (SURVEY.md §1.4-1.5):
  *  - ValueState            → `GroupState[MaxSoFar]`           (runningMax)
  *  - ValueState+ReducingState → `GroupState[BlockAcc]`        (blockAverage)
  *  - MapState<subkey,max>  → `GroupState[Map[subkey, max]]`   (runningMaxBySubkey)
  *  - ListState (size only) → `GroupState[GapCount]`           (thresholdGaps)
  *
  * Ordering: Flink guarantees per-key arrival order from a single source;
  * Spark guarantees iterator order neither within a micro-batch group nor in
  * batch-mode groups. Callers MUST establish order explicitly — these ops
  * take an `ord` field and sort each group's batch slice before folding,
  * which is exact when each key's records arrive within one micro-batch in
  * any order, and exact across micro-batches when batches are time-ordered
  * (the file-replay case). At 100 TB the same contract holds: state is O(1)
  * per key (not O(rows)), so executor memory is bounded by
  * keys-per-partition, never by data volume.
  *
  * All four run in BOTH batch mode (Dataset.groupByKey on a bounded input —
  * Spark executes flatMapGroupsWithState with batch-specific semantics:
  * each group processed once) and streaming mode (state persisted in the
  * state store across micro-batches).
  */
object StatefulOps {

  /** (key, ord, value) input record for the value-typed ops. */
  case class KV(key: String, ord: Long, value: Double)
  /** (key, subkey, ord, value) input for the MapState-shaped op. */
  case class KSV(key: String, subkey: String, ord: Long, value: Double)

  case class KeyedOut(key: String, ord: Long, out: Double)
  /** [[blockAverage]] emission: `block` is the per-key block index CARRIED
    * IN STATE (not recovered downstream by ranking emissions, which would
    * re-rank per micro-batch and break across batches); `out` is None for a
    * block whose every summed record was non-finite, mirroring the batch
    * twin's NULL DECIMAL sum. */
  case class KeyedOutN(key: String, ord: Long, block: Long, out: Option[Double])
  case class SubkeyOut(key: String, subkey: String, ord: Long, out: Double)
  case class GapOut(key: String, ord: Long, gap: Long)

  case class MaxSoFar(max: Double)
  /** Block accumulator in integer cents: for inputs with <= 2 decimals the
    * sum is exact, so the emitted average is bit-identical to the
    * DECIMAL(18,2)-exact batch form (and to the DuckDB oracle) regardless of
    * accumulation order. */
  case class BlockAcc(count: Int, cents: Long, nFinite: Int, block: Long)
  case class SubkeyMax(m: Map[String, Double])
  case class GapCount(n: Long)

  private implicit val kvOutEnc: Encoder[KeyedOut] = Encoders.product[KeyedOut]
  private implicit val kvOutNEnc: Encoder[KeyedOutN] = Encoders.product[KeyedOutN]
  private implicit val skOutEnc: Encoder[SubkeyOut] = Encoders.product[SubkeyOut]
  private implicit val gapOutEnc: Encoder[GapOut] = Encoders.product[GapOut]
  private implicit val maxEnc: Encoder[MaxSoFar] = Encoders.product[MaxSoFar]
  private implicit val accEnc: Encoder[BlockAcc] = Encoders.product[BlockAcc]
  private implicit val subEnc: Encoder[SubkeyMax] = Encoders.product[SubkeyMax]
  private implicit val gapEnc: Encoder[GapCount] = Encoders.product[GapCount]
  private implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Spark SQL / DuckDB comparison order on doubles: NaN sorts GREATEST.
    * Every op here is registered under a SQL oracle (and has declarative /
    * TWS twins), so a plain JVM `>`/`>=` — false for any NaN operand —
    * would silently diverge on NaN data. Shared by the max-like folds and
    * the breach test ([[thresholdGaps]]); NanParitySpec plants NaN to pin
    * all twins to this rule. */
  private[streaming] def sqlGe(a: Double, b: Double): Boolean =
    java.lang.Double.isNaN(a) || (!java.lang.Double.isNaN(b) && a >= b)

  /** Q1 analogue (MaximumClosingPrice.java:47-82, ValueState): per key, emit
    * the running max for EVERY record. */
  def runningMax(ds: Dataset[KV], mode: OutputMode = OutputMode.Append()): Dataset[KeyedOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[MaxSoFar, KeyedOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[MaxSoFar]) =>
          var cur = if (state.exists) state.get.max else Double.NegativeInfinity
          val out = rows.toSeq.sortBy(_.ord).map { r =>
            if (!sqlGe(cur, r.value)) cur = r.value
            KeyedOut(key, r.ord, cur)
          }
          state.update(MaxSoFar(cur))
          out.iterator
      }

  /** Q2 analogue (RollingAverageHighPrice.java:56-113, ValueState +
    * ReducingState): accumulate 50 records, the 51st triggers emission of
    * sum/50, clears state, and is discarded. */
  def blockAverage(ds: Dataset[KV], blockSize: Int = 51, emitCount: Int = 50,
                   mode: OutputMode = OutputMode.Append()): Dataset[KeyedOutN] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BlockAcc, KeyedOutN](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[BlockAcc]) =>
          var acc = if (state.exists) state.get else BlockAcc(0, 0L, 0, 0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[KeyedOutN]
          rows.toSeq.sortBy(_.ord).foreach { r =>
            if (acc.count < emitCount) {
              // HALF_UP on the decimal string, matching the batch twin's
              // CAST(value AS DECIMAL(18,2)) (and the DuckDB oracle) for
              // inputs with >2 decimal places — not rint on a binary product.
              // Non-finite values: the batch CAST yields NULL (sum skips it,
              // the row still counts toward block completeness); nFinite
              // tracks whether ANY record contributed, so an all-non-finite
              // block emits None exactly like the batch NULL sum.
              if (java.lang.Double.isFinite(r.value)) {
                val cents = (BigDecimal(r.value)
                  .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
                acc = BlockAcc(acc.count + 1, acc.cents + cents, acc.nFinite + 1, acc.block)
              } else
                acc = BlockAcc(acc.count + 1, acc.cents, acc.nFinite, acc.block)
            } else { // the trigger record: emit and discard it
              val avg = if (acc.nFinite == 0) None
                        else Some((acc.cents.toDouble / 100.0) / emitCount)
              out += KeyedOutN(key, r.ord, acc.block, avg)
              acc = BlockAcc(0, 0L, 0, acc.block + 1L)
            }
          }
          state.update(acc)
          out.iterator
      }

  /** Q3 analogue (MaxTradeVolumePerYearPerMonth.java:53-91, MapState): per
    * key, a map subkey → running max; emit (key, subkey, running max) per
    * record. The reference keys by (year,month) making its MapState
    * single-entry (SURVEY.md §2.1 A3); here the map is real: key coarser,
    * subkey in state. */
  def runningMaxBySubkey(ds: Dataset[KSV],
                         mode: OutputMode = OutputMode.Append()): Dataset[SubkeyOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SubkeyMax, SubkeyOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[SubkeyMax]) =>
          var m = if (state.exists) state.get.m else Map.empty[String, Double]
          val out = rows.toSeq.sortBy(_.ord).map { r =>
            val cur = m.get(r.subkey) match {
              case Some(prev) if sqlGe(prev, r.value) => prev
              case _                                  => r.value
            }
            m = m.updated(r.subkey, cur)
            SubkeyOut(key, r.subkey, r.ord, cur)
          }
          state.update(SubkeyMax(m))
          out.iterator
      }

  /** Session input: `ts` must be the WATERMARKED event-time column (the
    * engine requires it present in the grouped Dataset for event-time
    * timeouts); micros are derived from it. */
  case class SessionEv(key: String, ts: java.sql.Timestamp)
  case class SessionState(start_us: Long, end_us: Long, n: Long)
  case class SessionOut(key: String, start_us: Long, end_us: Long, n_events: Long)
  private implicit val sessStEnc: Encoder[SessionState] = Encoders.product[SessionState]
  private implicit val sessOutEnc: Encoder[SessionOut] = Encoders.product[SessionOut]

  /** Streaming session windows with EVENT-TIME TIMEOUT: a session closes and
    * emits when the watermark passes its end + gap. This is the streaming
    * twin of [[graft.operators.Sessionize.sessionize]] and goes beyond the
    * reference (which has no timers/event-time at all — SURVEY.md §2.2):
    * state is one (start, end, count) triple per open session per key, so
    * memory is O(keys), and expiry is driven by the engine's watermark, not
    * by data arrival.
    *
    * The input Dataset must carry a watermarked event-time column; pass its
    * values here as epoch micros in `ts_us`.
    *
    * ORDERING: exact for time-ordered cross-batch arrival only (each
    * batch's slice is sorted here, but a late-but-within-watermark row in
    * a LATER micro-batch arrives behind an already-closed session) — the
    * [[sessionizeOooStream]] twin buffers until the watermark settles the
    * order and is the disorder-safe form.
    */
  def sessionizeStream(ds: Dataset[SessionEv], gapMinutes: Int = 60): Dataset[SessionOut] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.start_us, s.end_us, s.n))
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime * 1000L + (t.getNanos % 1000000) / 1000
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            rows.toSeq.map(r => micros(r.ts)).sorted.foreach { tsUs =>
              cur match {
                case Some(s) if tsUs - s.end_us <= gapUs =>
                  cur = Some(SessionState(s.start_us, math.max(s.end_us, tsUs), s.n + 1))
                case Some(s) => // gap exceeded within the batch: close + start new
                  out += SessionOut(key, s.start_us, s.end_us, s.n)
                  cur = Some(SessionState(tsUs, tsUs, 1))
                case None =>
                  cur = Some(SessionState(tsUs, tsUs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes session end + gap
              state.setTimeoutTimestamp(s.end_us / 1000L + gapMinutes.toLong * 60000L)
            }
            out.iterator
          }
      }
  }

  /** Closed-but-not-yet-emittable session accumulator for
    * [[sessionizeOooStream]]: rows strictly below the watermark, compacted
    * to the (start, end, count) the output needs. */
  case class SessGen(start_us: Long, end_us: Long, n: Long)
  case class SessOooAcc(gens: Seq[SessGen], pend: Seq[Long])
  private implicit val sessOooAccEnc: Encoder[SessOooAcc] = Encoders.product[SessOooAcc]

  /** [[sessionizeStream]] hardened for OUT-OF-ORDER arrival — the
    * [[ttlDedupOooStream]] construction applied to gap sessions. The base
    * op folds each batch's rows against the state's open session, which is
    * exact only for time-ordered cross-batch arrival: a late-but-within-
    * watermark row landing in a LATER micro-batch can belong inside — or
    * BRIDGE — a session the op already closed and emitted within an
    * earlier batch (its in-batch sort cannot help; the session is gone).
    * Real streams are disordered inside the watermark slack, so this form
    * buffers until the watermark settles the order:
    *
    *  - Every event first lands in `pend`, raw. Each invocation re-sorts
    *    pend ∪ batch — a late arrival takes its TRUE time position.
    *  - Rows strictly below the watermark compact into [[SessGen]]
    *    accumulators via the gap fold. Sound because kept and future rows
    *    all have us ≥ watermark: the engine drops later-batch rows below
    *    it, so nothing can ever sort before a compacted row again — the
    *    fold only extends the NEWEST session forward; older ones are
    *    separated from all future rows by their already-materialized
    *    > gap silence.
    *  - A session EMITS (exactly once, final) when `end + gap <
    *    watermark`: any future kept row has us ≥ watermark > end + gap,
    *    whose gap opens a NEW session, so the emitted row can never be
    *    invalidated — the same finalization rule the base op reaches via
    *    `setTimeoutTimestamp`, now proof-bearing under disorder.
    *    Finalizable sessions are a prefix (end_us is increasing), and
    *    emitted sessions leave the state immediately — state is bounded by
    *    O(events within gap + watermark slack) per active key.
    *  - `EventTimeTimeout` at the earliest unemitted session's
    *    `end + gap` (ceil to ms) drives the flush when no further data
    *    arrives for the key — including the trailing no-data batch a
    *    far-future sentinel row unlocks.
    *
    * Output contract matches [[sessionizeStream]]; registered under the
    * same q13 batch oracle (sessions are a pure function of the
    * time-sorted event list, which this op reconstructs exactly regardless
    * of micro-batch slicing). */
  def sessionizeOooStream(ds: Dataset[SessionEv], gapMinutes: Int = 60): Dataset[SessionOut] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SessOooAcc, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessOooAcc]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos % 1000000) / 1000
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(SessOooAcc(Nil, Nil))
          val all = (prev.pend ++ rows.map(r => micros(r.ts))).sorted
          var gens = prev.gens.toVector
          val keep = Vector.newBuilder[Long]
          all.foreach { us =>
            if (us < wmUs) {
              gens = gens.lastOption match {
                // us > g.end_us always (compacted rows sit strictly below
                // every watermark any kept/new row ever cleared), so the
                // fold only extends forward
                case Some(g) if us - g.end_us <= gapUs =>
                  gens.init :+ SessGen(g.start_us, us, g.n + 1L)
                case _ => gens :+ SessGen(us, us, 1L)
              }
            } else keep += us
          }
          val (done, live) = gens.span(g => g.end_us + gapUs < wmUs)
          val pend = keep.result()
          if (live.isEmpty && pend.isEmpty) {
            if (state.exists || state.hasTimedOut) state.remove()
          } else {
            state.update(SessOooAcc(live, pend))
            // wake when the earliest unemitted session becomes final; ceil
            // to ms so the wake never precedes finalizability. Always > the
            // current watermark: live means end_us + gap >= wmUs, and pend
            // rows have us >= wmUs
            val earliestUs = live.headOption.map(_.end_us).getOrElse(pend.head)
            state.setTimeoutTimestamp((earliestUs + gapUs) / 1000L + 1L)
          }
          done.iterator.map(g => SessionOut(key, g.start_us, g.end_us, g.n))
      }
  }

  /** (fingerprint, doc_id) input for [[exactDedupStream]]. */
  case class FpRec(fp: String, doc_id: Long)
  /** Cumulative per-fingerprint state: smallest doc id seen, total count. */
  case class DupAcc(min_id: Long, n: Long)
  case class DupOut(fp: String, keep_id: Long, n_dups: Long)
  private implicit val dupAccEnc: Encoder[DupAcc] = Encoders.product[DupAcc]
  private implicit val dupOutEnc: Encoder[DupOut] = Encoders.product[DupOut]

  /** Streaming exact dedup: per content fingerprint, the state carries the
    * CUMULATIVE (min doc_id, count) and every micro-batch that touches the
    * group emits the current cumulative row. Unlike the four reference ops
    * this is ORDER-INSENSITIVE (min and count are commutative), so it is
    * exact for any arrival order and any micro-batch slicing; the final
    * decision is recovered downstream with
    * `groupBy(fp).agg(min(keep_id), max(n_dups))` — min of cumulative
    * minima is the global min, max of cumulative counts is the total — and
    * that post-aggregation only sees sink-sized data (one row per
    * (fingerprint, batch) the fingerprint appeared in). The state IS
    * load-bearing: were it lost between batches, max(n_dups) would collapse
    * to the largest batch-local count. */
  def exactDedupStream(ds: Dataset[FpRec],
                       mode: OutputMode = OutputMode.Append()): Dataset[DupOut] =
    ds.groupByKey(_.fp)
      .flatMapGroupsWithState[DupAcc, DupOut](mode, GroupStateTimeout.NoTimeout) {
        (fp, rows, state: GroupState[DupAcc]) =>
          var acc = if (state.exists) state.get else DupAcc(Long.MaxValue, 0L)
          rows.foreach { r =>
            acc = DupAcc(math.min(acc.min_id, r.doc_id), acc.n + 1L)
          }
          state.update(acc)
          Iterator.single(DupOut(fp, acc.min_id, acc.n))
      }

  /** Per-document input for [[manifestDedupStream]]: content fingerprint
    * plus the quality verdicts computed by the upstream STATELESS
    * projection riding alongside. */
  case class ManifestRec(fp: String, doc_id: Long,
                         quality_score: Double, lang_guess: String)
  /** The fingerprint's current owner (smallest doc_id seen). */
  case class OwnerAcc(min_id: Long)
  case class ManifestOut(doc_id: Long, keep: Long,
                         quality_score: Double, lang_guess: String)
  private implicit val ownerEnc: Encoder[OwnerAcc] = Encoders.product[OwnerAcc]
  private implicit val mOutEnc: Encoder[ManifestOut] = Encoders.product[ManifestOut]

  /** Streaming curation-manifest core: PER-DOCUMENT exact-dedup decisions
    * with the quality gate's verdicts riding through — the composition
    * proof that the pipeline's stateless projection (quality scoring, zero
    * state) and its state-store dedup coexist in ONE streaming query. Per
    * content fingerprint the state carries the owner (smallest doc_id
    * seen); each document emits exactly one row in its arrival batch:
    * keep=1 iff it becomes the owner. For doc_id-ordered arrival (the
    * replay contract — batches split at a doc_id boundary, each batch
    * slice sorted here) this equals the batch manifest's min-per-
    * fingerprint decision; the state is load-bearing across batches, since
    * without it a later batch would re-elect an owner for every
    * fingerprint it touches. */
  def manifestDedupStream(ds: Dataset[ManifestRec],
                          mode: OutputMode = OutputMode.Append()): Dataset[ManifestOut] =
    ds.groupByKey(_.fp)
      .flatMapGroupsWithState[OwnerAcc, ManifestOut](mode, GroupStateTimeout.NoTimeout) {
        (fp, rows, state: GroupState[OwnerAcc]) =>
          var owner = if (state.exists) state.get.min_id else Long.MaxValue
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val keep = if (r.doc_id < owner) { owner = r.doc_id; 1L } else 0L
            ManifestOut(r.doc_id, keep, r.quality_score, r.lang_guess)
          }
          state.update(OwnerAcc(owner))
          out.iterator
      }

  /** (key, ord, typ) input for [[transitionsStream]]. */
  case class TransEv(key: String, ord: Long, typ: String)
  /** One emitted transition: the key's previous event type → this one's. */
  case class TransOut(key: String, from_type: String, to_type: String)
  /** Last event seen per key — the ValueState of the transition op. */
  case class LastEv(ord: Long, typ: String)

  private implicit val transEnc: Encoder[TransEv] = Encoders.product[TransEv]
  private implicit val transOutEnc: Encoder[TransOut] = Encoders.product[TransOut]
  private implicit val lastEnc: Encoder[LastEv] = Encoders.product[LastEv]

  /** Streaming EVENT-SEQUENCE TRANSITIONS: per key, emit (previous type →
    * this type) for every consecutive ord-ordered pair — the streaming form
    * of the batch `lead()` window in the Markov transition matrix. State is
    * ONE [[LastEv]] per key (a ValueState in Flink terms), so a sequence
    * spanning micro-batches emits its boundary transition from state — the
    * load-bearing cross-batch claim. Each batch's slice sorts by ord
    * (arrival order within a batch is arbitrary); the replay contract
    * splits batches at an ord boundary, so the global per-key order is the
    * concatenation of sorted slices. */
  def transitionsStream(ds: Dataset[TransEv],
                        mode: OutputMode = OutputMode.Append()): Dataset[TransOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LastEv, TransOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[LastEv]) =>
          var last = state.getOption
          val out = rows.toSeq.sortBy(_.ord).flatMap { r =>
            val t = last.map(l => TransOut(key, l.typ, r.typ))
            last = Some(LastEv(r.ord, r.typ))
            t
          }
          last.foreach(state.update)
          out.iterator
      }

  /** (key, ord, µs, value) input for [[leadIntervalsStream]]. */
  case class LeadEv(key: String, ord: Long, us: Long, v: Double)
  /** One holding interval: the key's PREVIOUS event held value `v_prev`
    * for `dt_us` microseconds (until this event arrived). */
  case class LeadOut(key: String, dt_us: Long, v_prev: Double)
  /** The previous event per key — the ValueState of the interval op. */
  case class LastUsV(us: Long, v: Double)

  private implicit val leadEnc: Encoder[LeadEv] = Encoders.product[LeadEv]
  private implicit val leadOutEnc: Encoder[LeadOut] = Encoders.product[LeadOut]
  private implicit val lastUsVEnc: Encoder[LastUsV] = Encoders.product[LastUsV]

  /** Streaming HOLDING INTERVALS: per key, each event closes the previous
    * event's interval, emitting (Δt, previous value) — the streaming form
    * of the batch `lead()` window behind time-weighted averaging (TWAP).
    * State is ONE (µs, value) pair per key, so an interval spanning
    * micro-batches closes from state — the cross-batch claim. The last
    * event of each key never emits (no successor closes it), identical to
    * the batch form's null-lead filter. Batch slices sort by ord; the
    * replay contract splits batches at an ord boundary. */
  def leadIntervalsStream(ds: Dataset[LeadEv],
                          mode: OutputMode = OutputMode.Append()): Dataset[LeadOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LastUsV, LeadOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[LastUsV]) =>
          var last = state.getOption
          val out = rows.toSeq.sortBy(_.ord).flatMap { r =>
            val emit = last.map(l => LeadOut(key, r.us - l.us, l.v))
            last = Some(LastUsV(r.us, r.v))
            emit
          }
          last.foreach(state.update)
          out.iterator
      }

  /** (key, ord, µs, type) input for [[attributionStream]]; pre-filtered to
    * the view/purchase types the operator reads. */
  case class AttrEv(key: Long, ord: Long, us: Long, typ: String)
  /** One attributed purchase: the user's most recent strictly-preceding
    * view's µs timestamp, null when none qualifies within the lookback. */
  case class AttrOut(event_id: Long, user_id: Long, purchase_us: Long,
                     attributed_view_us: Option[Long])
  /** Most recent view's µs timestamp — the ValueState of the attribution
    * op (one scalar per user, the classic Flink ValueState shape). */
  case class LastView(us: Long)

  private implicit val attrKeyEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val attrEnc: Encoder[AttrEv] = Encoders.product[AttrEv]
  private implicit val attrOutEnc: Encoder[AttrOut] = Encoders.product[AttrOut]
  private implicit val lastViewEnc: Encoder[LastView] = Encoders.product[LastView]

  /** Streaming LAST-TOUCH ATTRIBUTION: per user, each purchase emits the
    * most recent preceding view's timestamp when it falls inside the
    * lookback — the streaming form of the batch conditional window max
    * (`Sessionize.attributionLastTouch`). State is ONE [[LastView]] µs
    * scalar per user, so a view in one micro-batch attributes a purchase
    * arriving batches later from state — the load-bearing cross-batch
    * claim (the two-file median replay forces it). Each batch's slice
    * sorts by ord (arrival order within a batch is arbitrary); the replay
    * contract splits batches at an ord boundary, so per-key order is the
    * concatenation of sorted slices. A view at the purchase's own
    * timestamp but a later ord does not attribute — it is processed after
    * the purchase — matching the batch frame's 1-PRECEDING end. */
  def attributionStream(ds: Dataset[AttrEv], lookbackUs: Long,
                        mode: OutputMode = OutputMode.Append()): Dataset[AttrOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LastView, AttrOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[LastView]) =>
          var lastView = state.getOption.map(_.us)
          val out = rows.toSeq.sortBy(_.ord).flatMap { r =>
            if (r.typ == "purchase")
              Some(AttrOut(r.ord, key, r.us,
                lastView.filter(v => r.us - v <= lookbackUs)))
            else { // pre-filtered: anything else IS a view
              lastView = Some(r.us)
              None
            }
          }
          lastView.foreach(v => state.update(LastView(v)))
          out.iterator
      }

  /** One PENDING view (an open partial match) for [[cepStream]]. */
  case class CepView(ord: Long, us: Long)
  /** The per-user NFA state: pending views, arrival-ordered. */
  case class CepPend(views: List[CepView])
  case class CepOut(user_id: Long, event_id: Long, view_us: Long,
                    purchase_us: Long)
  private implicit val cepPendEnc: Encoder[CepPend] = Encoders.product[CepPend]
  private implicit val cepOutEnc: Encoder[CepOut] = Encoders.product[CepOut]

  /** CEP "view FOLLOWED BY purchase within the horizon, no error between"
    * as a keyed NFA over REAL streaming state ([[graft.operators
    * .Sessionize.cepFunnelFollowedBy]]'s semantics, the Flink-CEP query
    * class run through `flatMapGroupsWithState`): the state is the user's
    * list of PENDING views — open partial matches; a purchase COMPLETES
    * (and clears) every pending view still inside the horizon, because
    * skip-till-next-match means each view's first following purchase is
    * this one — an older pending view was either completed by an earlier
    * purchase, killed by an error, or expired; an error KILLS all pending
    * matches (the view's first following error now precedes any future
    * purchase); and every arrival first EXPIRES views older than the
    * horizon (no later purchase can be inside their window), so state is
    * bounded by each key's views-per-horizon arrival rate, never the
    * tape. Input must be pre-filtered to view/purchase/error rows
    * (anything else is a view — [[attributionStream]]'s contract); the
    * same sorted-slice ordering contract applies. */
  def cepStream(ds: Dataset[AttrEv], withinUs: Long,
                mode: OutputMode = OutputMode.Append()): Dataset[CepOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CepPend, CepOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[CepPend]) =>
          var pending = state.getOption.map(_.views).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[CepOut]
          rows.toSeq.sortBy(_.ord).foreach { r =>
            pending = pending.filter(v => r.us - v.us <= withinUs)
            r.typ match {
              case "purchase" =>
                pending.foreach(v => out += CepOut(key, v.ord, v.us, r.us))
                pending = Nil
              case "error" => pending = Nil
              case _ => pending = pending :+ CepView(r.ord, r.us)
            }
          }
          if (pending.isEmpty) state.remove() else state.update(CepPend(pending))
          out.iterator
      }

  /** The single previous event [[cepNextStream]] carries per user. */
  case class NextAcc(typ: String, ord: Long, us: Long)
  case class NextOut(user_id: Long, event_id: Long, view_us: Long,
                     purchase_us: Long)
  private implicit val nextAccEnc: Encoder[NextAcc] = Encoders.product[NextAcc]
  private implicit val nextOutEnc: Encoder[NextOut] = Encoders.product[NextOut]

  /** CEP STRICT CONTIGUITY — `A.next(B).within(W)` ([[graft.operators
    * .Sessionize.cepNextMatch]]'s semantics) as the minimal keyed NFA:
    * state is exactly ONE previous event per user (type, ord, time); a
    * purchase matches iff the carried previous event is a view within the
    * horizon, and EVERY arrival — click, error, anything — overwrites the
    * carried event, which is precisely what makes the contiguity strict
    * (the input must NOT be pre-filtered to view/purchase rows, unlike
    * [[cepStream]]/[[cepTimesStream]]: dropping an intervening click
    * would silently turn `next` into `followedBy`). The view→purchase
    * adjacency crosses micro-batch boundaries through the carried state;
    * ordering contract as everywhere (sorted slice, ordered per-key
    * arrival). */
  def cepNextStream(ds: Dataset[AttrEv], withinUs: Long,
                    mode: OutputMode = OutputMode.Append()): Dataset[NextOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[NextAcc, NextOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[NextAcc]) =>
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[NextOut]
          rows.toSeq.sortBy(_.ord).foreach { r =>
            prev.foreach { p =>
              if (p.typ == "view" && r.typ == "purchase" &&
                  r.us - p.us <= withinUs)
                out += NextOut(key, p.ord, p.us, r.us)
            }
            prev = Some(NextAcc(r.typ, r.ord, r.us))
          }
          prev.foreach(state.update)
          out.iterator
      }

  /** One OPEN times-quantifier match: a completed burst awaiting its
    * first following purchase. */
  case class TimesOpen(ord: Long, bstart: Long, us: Long)
  /** Per-user times-NFA state: the last ≤ n−1 view times (the
    * quantifier's ring — O(n), NOT horizon-sized) plus the open completed
    * bursts (bounded by views-per-follow-horizon). */
  case class TimesPend(recent: List[CepView], open: List[TimesOpen])
  case class TimesOut(user_id: Long, event_id: Long, burst_start_us: Long,
                      view_us: Long, purchase_us: Long)
  private implicit val timesPendEnc: Encoder[TimesPend] = Encoders.product[TimesPend]
  private implicit val timesOutEnc: Encoder[TimesOut] = Encoders.product[TimesOut]

  /** CEP TIMES QUANTIFIER — `A.times(n).within(W) followedBy B` (the
    * [[graft.operators.Sessionize.cepTimesBurst]] semantics) as a keyed
    * NFA: the state's RING is the last n−1 view times, so a new view
    * completes a burst exactly when the ring is full and its oldest entry
    * lies within the window — the sequential evaluation the batch form's
    * row-ordered `lag(n−1)` was deliberately defined to match (its ring
    * spans micro-batch boundaries, the CepSpec witness). A completed
    * burst becomes an OPEN match; the first following purchase inside the
    * follow horizon completes (and clears) every open match — an open
    * match whose horizon a later arrival has passed expires unseen,
    * because any purchase that could have completed it sorts strictly
    * earlier under ordered per-key arrival and was already processed.
    * Input must be pre-filtered to view/purchase rows (anything else IS a
    * view — [[attributionStream]]'s contract); the sorted-slice ordering
    * contract applies. */
  def cepTimesStream(ds: Dataset[AttrEv], n: Int, winUs: Long, followUs: Long,
                     mode: OutputMode = OutputMode.Append()): Dataset[TimesOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[TimesPend, TimesOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[TimesPend]) =>
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          var open = state.getOption.map(_.open).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[TimesOut]
          rows.toSeq.sortBy(_.ord).foreach { r =>
            open = open.filter(o => r.us - o.us <= followUs)
            r.typ match {
              case "purchase" =>
                open.foreach(o =>
                  out += TimesOut(key, o.ord, o.bstart, o.us, r.us))
                open = Nil // skip-till-next-match: this purchase was first
              case _ => // pre-filtered: anything else IS a view
                if (recent.length == n - 1 && r.us - recent.head.us <= winUs)
                  open = open :+ TimesOpen(r.ord, recent.head.us, r.us)
                recent = (recent :+ CepView(r.ord, r.us)).takeRight(n - 1)
            }
          }
          if (recent.isEmpty && open.isEmpty) state.remove()
          else state.update(TimesPend(recent, open))
          out.iterator
      }

  /** (key, order, event-time, type) input for [[cepAbsenceStream]]; `ts`
    * must be the WATERMARKED event-time column (event-time timeouts
    * require it in the grouped Dataset). */
  case class CepTimedEv(key: Long, ord: Long, ts: java.sql.Timestamp,
                        typ: String)
  case class CepAlert(user_id: Long, event_id: Long, view_us: Long,
                      deadline_us: Long)
  private implicit val cepAlertEnc: Encoder[CepAlert] =
    Encoders.product[CepAlert]

  /** CEP ABSENCE pattern — "view NOT followed by a purchase within the
    * horizon" (Flink-CEP's `notFollowedBy(...).within(...)`, the timeout
    * half of the pattern library: the alert a monitoring pipeline pages
    * on) — as a keyed NFA whose NEGATIVE verdicts need EVENT-TIME TIMERS:
    * a match emits when something arrives, but an absence alert emits
    * when nothing does, so the deadline must fire off the WATERMARK, not
    * off data. Two emission paths, both exact under ordered per-key
    * arrival:
    *
    *  - DATA-DRIVEN: any arrival first flushes pending views whose
    *    horizon it has passed (`us − view_us > withinUs`) as alerts —
    *    every purchase that could have completed them sorts strictly
    *    earlier and was already processed; a purchase then silently
    *    completes (drops) every still-live pending view.
    *  - TIMER-DRIVEN: tape-end views see no later arrival at all, so the
    *    state registers an `EventTimeTimeout` at the EARLIEST pending
    *    deadline, rounded UP to the engine's ms granularity (flooring
    *    could fire up to 999 µs early, alerting a view whose completing
    *    purchase is still inside the horizon — the ttlDedupStream rule).
    *    On fire, views whose deadline the watermark passed alert and
    *    leave state; the rest re-register at their earliest deadline
    *    (strictly above the watermark by the same rounding, so the
    *    re-registration never violates the engine's monotonicity check).
    *
    * State is bounded by views-per-horizon per key — the watermark frees
    * everything else. Input must be pre-filtered to view/purchase rows
    * (anything else is a view); the replay's far-future sentinel (a
    * PURCHASE for a key no real row uses, completing nothing and leaving
    * no state) advances the final watermark so every tape-end deadline
    * fires. */
  def cepAbsenceStream(ds: Dataset[CepTimedEv], withinUs: Long,
                       mode: OutputMode = OutputMode.Append()): Dataset[CepAlert] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CepPend, CepAlert](
        mode, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[CepPend]) =>
          def alert(v: CepView) = CepAlert(key, v.ord, v.us, v.us + withinUs)
          def deadlineMs(v: CepView): Long = (v.us + withinUs + 999L) / 1000L
          def park(pending: List[CepView]): Unit =
            if (pending.isEmpty) state.remove()
            else {
              state.update(CepPend(pending))
              state.setTimeoutTimestamp(pending.map(deadlineMs).min)
            }
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val (expired, live) = state.getOption.map(_.views).getOrElse(Nil)
              .partition(v => deadlineMs(v) <= wm)
            park(live)
            expired.map(alert).iterator
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime * 1000L + (t.getNanos % 1000000) / 1000
            var pending = state.getOption.map(_.views).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[CepAlert]
            rows.toSeq.map(r => (micros(r.ts), r.ord, r.typ)).sorted.foreach {
              case (us, ord, typ) =>
                val (expired, live) = pending.partition(v => us - v.us > withinUs)
                expired.foreach(v => out += alert(v))
                pending =
                  if (typ == "purchase") Nil // completes every live view
                  else live :+ CepView(ord, us)
            }
            park(pending)
            out.iterator
          }
      }

  /** (fingerprint, event-time, record id) input for [[ttlDedupStream]]; `ts`
    * must be the WATERMARKED event-time column (the engine requires it in
    * the grouped Dataset for event-time timeouts). */
  case class TtlRec(fp: String, ts: java.sql.Timestamp, id: Long)
  /** One dedup GENERATION per fingerprint: opened by the first occurrence,
    * extended while successive occurrences arrive within the horizon,
    * closed (and a NEW generation opened) by a larger gap. */
  case class TtlAcc(start_us: Long, last_us: Long, min_id: Long, n: Long)
  case class TtlOut(fp: String, start_us: Long, keep_id: Long, n_dups: Long)
  private implicit val ttlAccEnc: Encoder[TtlAcc] = Encoders.product[TtlAcc]
  private implicit val ttlOutEnc: Encoder[TtlOut] = Encoders.product[TtlOut]

  /** Streaming exact dedup with BOUNDED state — the unbounded-ingest answer
    * to [[exactDedupStream]], whose state grows by one entry per distinct
    * fingerprint forever. Here a fingerprint's state lives only while the
    * fingerprint stays "warm": semantically, occurrences ≤ `horizonUs`
    * apart deduplicate into one GENERATION (identified by its first
    * occurrence's event time), and a gap beyond the horizon starts a fresh
    * generation — dedup-within-horizon, the semantics
    * `dropDuplicatesWithinWatermark` offers for the keep-first-only case,
    * generalized to carry (min id, count) decisions.
    *
    * Two mechanisms share the horizon and must not be conflated:
    *  - CORRECTNESS is data-driven: the generation break compares each
    *    record's event time against the state's `last_us` — exact for
    *    time-ordered per-key arrival regardless of micro-batch slicing or
    *    watermark pace.
    *  - MEMORY BOUNDING is watermark-driven: `EventTimeTimeout` removes a
    *    generation's state once the watermark passes `last_us + horizon`.
    *    Removal never changes an answer: any later arrival of that
    *    fingerprint is above the watermark, hence > horizon past `last_us`,
    *    so the data-driven rule would have opened a new generation anyway.
    *    State is therefore O(fingerprints-within-horizon), not O(distinct
    *    fingerprints ever) — the difference between a week of warm keys and
    *    an unbounded 100 TB ingest history.
    *
    * Emission mirrors [[exactDedupStream]]: every batch that touches a
    * generation emits its cumulative (min id, count) row — a mid-batch gap
    * break emits the closed generation's final row immediately — and the
    * decision is recovered downstream with
    * `groupBy(fp, start_us).agg(min(keep_id), max(n_dups))`, which only
    * sees sink-sized data. */
  def ttlDedupStream(ds: Dataset[TtlRec], horizonUs: Long): Dataset[TtlOut] =
    ds.groupByKey(_.fp)
      .flatMapGroupsWithState[TtlAcc, TtlOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (fp, rows, state: GroupState[TtlAcc]) =>
          if (state.hasTimedOut) {
            // every batch already emitted the cumulative row; expiry only
            // frees the state
            state.remove()
            Iterator.empty
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime * 1000L + (t.getNanos % 1000000) / 1000
            val out = scala.collection.mutable.ArrayBuffer.empty[TtlOut]
            var cur = state.getOption
            rows.toSeq.map(r => (micros(r.ts), r.id)).sorted.foreach { case (us, id) =>
              cur match {
                case Some(a) if us - a.last_us <= horizonUs =>
                  cur = Some(TtlAcc(a.start_us, us, math.min(a.min_id, id), a.n + 1L))
                case Some(a) => // horizon exceeded within the batch: close + reopen
                  out += TtlOut(fp, a.start_us, a.min_id, a.n)
                  cur = Some(TtlAcc(us, us, id, 1L))
                case None =>
                  cur = Some(TtlAcc(us, us, id, 1L))
              }
            }
            cur.foreach { a =>
              out += TtlOut(fp, a.start_us, a.min_id, a.n)
              state.update(a)
              // free the state once the watermark passes last-seen + horizon.
              // Round UP to the engine's ms granularity: flooring would let
              // state expire up to 999 µs early, and a subsequent occurrence
              // with gap in (horizon - 1ms, horizon] would then open a new
              // generation where the data-driven rule (and the oracle) keeps
              // the old one — "removal never changes an answer" requires the
              // timeout to never undercut the µs horizon
              state.setTimeoutTimestamp((a.last_us + horizonUs + 999L) / 1000L)
            }
            out.iterator
          }
      }

  /** Closed-but-not-yet-emittable generation accumulator for
    * [[ttlDedupOooStream]]: rows strictly below the watermark, compacted to
    * the (start, last, min id, count) the output needs. */
  case class OooGen(start_us: Long, last_us: Long, min_id: Long, n: Long)
  /** A raw occurrence still at-or-above the watermark — a later arrival may
    * yet sort before it, so it cannot be folded. */
  case class OooRow(us: Long, id: Long)
  case class OooAcc(gens: Seq[OooGen], pend: Seq[OooRow])
  private implicit val oooAccEnc: Encoder[OooAcc] = Encoders.product[OooAcc]

  /** [[ttlDedupStream]] hardened for OUT-OF-ORDER arrival: the base op's
    * correctness rule ("gap vs the state's last-seen") is exact only for
    * time-ordered per-key arrival — a late-but-within-watermark row landing
    * in a LATER micro-batch arrives behind `last_us`, and its negative gap
    * folds it into whatever generation happens to be open (even moving
    * `last_us` backward), where the true time order may put it in an
    * earlier generation or have it BRIDGE two. Real streams are disordered
    * inside the watermark slack — that is what the watermark is for — so
    * this form buffers until the watermark settles the order:
    *
    *  - Every occurrence first lands in `pend`, raw. Each invocation
    *    re-sorts pend ∪ batch by (us, id) — a late arrival takes its TRUE
    *    time position, which is the entire point.
    *  - Rows strictly below the watermark compact into [[OooGen]]
    *    accumulators (the gap fold of the base op). Sound because kept and
    *    future rows all have us ≥ watermark: the engine drops later-batch
    *    rows below it, so nothing can ever sort before a compacted row
    *    again — rows folding onto the newest accumulator always extend it
    *    forward. Only the NEWEST accumulator can grow; older ones are
    *    separated from all future rows by their already-materialized
    *    > horizon gap.
    *  - A generation EMITS (exactly once — emission here is final, not
    *    cumulative like the base op's) when `last_us + horizon <
    *    watermark`: any future kept row has us ≥ watermark > last + horizon,
    *    whose gap opens a new generation, so the emitted row can never be
    *    invalidated. Finalizable generations are a prefix (last_us is
    *    increasing), and the condition subsumes expiry — emitted
    *    generations leave the state immediately, bounding state to
    *    O(occurrences within horizon + watermark slack) per warm
    *    fingerprint.
    *  - `EventTimeTimeout` at the earliest unemitted generation's
    *    `last_us + horizon` (ceil to ms) drives the flush when no further
    *    data arrives for the key — including the trailing no-data batch a
    *    far-future sentinel row unlocks.
    *
    * Output contract matches [[ttlDedupStream]] downstream (groupBy
    * (fp, start_us) is a no-op pass-through here since each generation
    * appears once), and the data-driven oracle is unchanged: the
    * generations are a pure function of the (us, id)-sorted occurrence
    * list, which this op reconstructs exactly regardless of micro-batch
    * slicing. */
  def ttlDedupOooStream(ds: Dataset[TtlRec], horizonUs: Long): Dataset[TtlOut] =
    ds.groupByKey(_.fp)
      .flatMapGroupsWithState[OooAcc, TtlOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (fp, rows, state: GroupState[OooAcc]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos % 1000000) / 1000
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(OooAcc(Nil, Nil))
          val all = (prev.pend.map(r => (r.us, r.id)) ++
            rows.map(r => (micros(r.ts), r.id))).sorted
          var gens = prev.gens.toVector
          val keep = Vector.newBuilder[OooRow]
          all.foreach { case (us, id) =>
            if (us < wmUs) {
              gens = gens.lastOption match {
                // us > g.last_us always (compacted rows sit strictly below
                // every watermark any kept/new row ever cleared), so the
                // fold only extends forward
                case Some(g) if us - g.last_us <= horizonUs =>
                  gens.init :+ OooGen(g.start_us, us, math.min(g.min_id, id), g.n + 1L)
                case _ => gens :+ OooGen(us, us, id, 1L)
              }
            } else keep += OooRow(us, id)
          }
          val (done, live) = gens.span(g => g.last_us + horizonUs < wmUs)
          val pend = keep.result()
          if (live.isEmpty && pend.isEmpty) {
            if (state.exists || state.hasTimedOut) state.remove()
          } else {
            state.update(OooAcc(live, pend))
            // wake when the earliest unemitted generation becomes final;
            // ceil to ms so the wake never precedes finalizability. Always
            // > the current watermark: live means last_us + horizon >= wmUs,
            // and pend rows have us >= wmUs
            val earliestUs = live.headOption.map(_.last_us).getOrElse(pend.head.us)
            state.setTimeoutTimestamp((earliestUs + horizonUs) / 1000L + 1L)
          }
          done.iterator.map(g => TtlOut(fp, g.start_us, g.min_id, g.n))
      }

  /** Q4 analogue (DaysSincePriceThreshold.java:61-102, ListState): per key,
    * rows with value >= threshold emit the count of sub-threshold rows since
    * the previous breach, then reset. The reference stores the full list but
    * only uses its size (SURVEY.md §2.1 A4), so state is the counter. */
  def thresholdGaps(ds: Dataset[KV], threshold: Double,
                    mode: OutputMode = OutputMode.Append()): Dataset[GapOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[GapCount, GapOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[GapCount]) =>
          var n = if (state.exists) state.get.n else 0L
          val out = scala.collection.mutable.ArrayBuffer.empty[GapOut]
          rows.toSeq.sortBy(_.ord).foreach { r =>
            if (sqlGe(r.value, threshold)) {
              out += GapOut(key, r.ord, n)
              n = 0L
            } else {
              n += 1L
            }
          }
          state.update(GapCount(n))
          out.iterator
      }

  /** CUSUM accumulator: the running positive deviation sum in integer
    * CENTS (values have 2 decimals — cents are exact longs, so every step
    * is integer arithmetic with no float drift; the BlockAcc precedent). */
  case class CusumAcc(cents: Long)
  /** One CUSUM emission per input row: post-reset statistic + alarm flag. */
  case class CusumOut(key: String, ord: Long, cusum: Double, alarm: Long)

  private implicit val cusumAccEnc: Encoder[CusumAcc] = Encoders.product[CusumAcc]
  private implicit val cusumOutEnc: Encoder[CusumOut] = Encoders.product[CusumOut]

  private def cusumFold(key: String, rows: Iterator[KV],
                        state: GroupState[CusumAcc],
                        targetCents: Long, alarmCents: Long): Iterator[CusumOut] = {
    var s = if (state.exists) state.get.cents else 0L
    rows.map { r =>
      // non-finite values contribute nothing (fixture values are finite;
      // the guard keeps the operator total on dirty data)
      val vc = if (java.lang.Double.isFinite(r.value))
        (BigDecimal(r.value)
          .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
      else 0L
      val raw = math.max(0L, s + vc - targetCents)
      val alarm = if (raw > alarmCents) 1L else 0L
      s = if (alarm == 1L) 0L else raw
      CusumOut(key, r.ord, s.toDouble / 100.0, alarm)
    } ++ { state.update(CusumAcc(s)); Iterator.empty }
  }

  /** EWMA accumulator: last smoothed value (None until the first row). */
  case class EwmaAcc(s: Double)
  case class EwmaOut(key: String, ord: Long, ewma: Double)

  private implicit val ewmaAccEnc: Encoder[EwmaAcc] = Encoders.product[EwmaAcc]
  private implicit val ewmaOutEnc: Encoder[EwmaOut] = Encoders.product[EwmaOut]

  private def ewmaFold(key: String, rows: Iterator[KV],
                       state: GroupState[EwmaAcc], alpha: Double): Iterator[EwmaOut] = {
    var s = if (state.exists) Some(state.get.s) else None
    rows.map { r =>
      val next = s match {
        case None       => r.value
        case Some(prev) => prev + alpha * (r.value - prev)
      }
      s = Some(next)
      EwmaOut(key, r.ord, next)
    } ++ { s.foreach(v => state.update(EwmaAcc(v))); Iterator.empty }
  }

  /** EXPONENTIAL SMOOTHING (EWMA) per key: s₁ = x₁,
    * sₙ = sₙ₋₁ + α·(xₙ − sₙ₋₁) — like [[cusumStream]] a sequential
    * recurrence no window frame expresses (the closed form Σ α(1−α)ⁿ⁻ⁱ xᵢ
    * is float-order-hostile; the fold is the deterministic statement).
    * α must be BINARY-EXACT (0.125 here): then both engines execute the
    * identical IEEE op sequence (sub, mul, add — evaluated op-by-op in
    * DuckDB's vectorized kernels, no FMA contraction) and the recursive-CTE
    * oracle hash-matches bit-for-bit — probed before registering. */
  def ewmaStream(ds: Dataset[KV], alpha: Double,
                 mode: OutputMode = OutputMode.Append()): Dataset[EwmaOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaAcc, EwmaOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[EwmaAcc]) =>
          ewmaFold(key, rows.toSeq.sortBy(_.ord).iterator, state, alpha)
      }

  /** Holt accumulator: level and trend (absent until the first row). */
  case class HoltAcc(l: Double, t: Double)
  case class HoltOut(key: String, ord: Long, level: Double, trend: Double,
                     forecast: Double)

  private implicit val holtAccEnc: Encoder[HoltAcc] = Encoders.product[HoltAcc]
  private implicit val holtOutEnc: Encoder[HoltOut] = Encoders.product[HoltOut]

  private def holtFold(key: String, rows: Iterator[KV], state: GroupState[HoltAcc],
                       alpha: Double, beta: Double): Iterator[HoltOut] = {
    var acc = if (state.exists) Some(state.get) else None
    rows.map { r =>
      val next = acc match {
        case None => HoltAcc(r.value, 0.0)
        case Some(HoltAcc(l0, t0)) =>
          val l = alpha * r.value + (1.0 - alpha) * (l0 + t0)
          HoltAcc(l, beta * (l - l0) + (1.0 - beta) * t0)
      }
      acc = Some(next)
      HoltOut(key, r.ord, next.l, next.t, next.l + next.t)
    } ++ { acc.foreach(state.update); Iterator.empty }
  }

  /** HOLT'S LINEAR TREND (double exponential smoothing) per key — the
    * forecasting extension of [[ewmaStream]] with TWO coupled recurrences:
    * Lₙ = α·xₙ + (1−α)(Lₙ₋₁ + Tₙ₋₁), Tₙ = β(Lₙ − Lₙ₋₁) + (1−β)Tₙ₋₁,
    * one-step forecast Lₙ + Tₙ. Both smoothing factors are BINARY-EXACT
    * (α = 1/4, β = 1/8 at the registered site), so the same bit-level
    * cross-engine parity argument as EWMA's holds for the coupled pair —
    * the recursive oracle carries (level, trend) through the recursion. */
  def holtStream(ds: Dataset[KV], alpha: Double, beta: Double,
                 mode: OutputMode = OutputMode.Append()): Dataset[HoltOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[HoltAcc, HoltOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[HoltAcc]) =>
          holtFold(key, rows.toSeq.sortBy(_.ord).iterator, state, alpha, beta)
      }

  /** Holt-Winters accumulator: level, trend, and the seasonal RING BUFFER
    * s[0..m−1] (oldest first) — the first stateful shape here whose state
    * is a fixed-width ARRAY crossing micro-batch boundaries (the
    * Flink-ListState analogue of holt's two scalars; width m is a
    * constant, so state stays O(m) per key, never history-sized). */
  case class HwAcc(l: Double, t: Double, s: Seq[Double])
  case class HwOut(key: String, ord: Long, level: Double, trend: Double,
                   seasonal: Double, forecast: Double)

  private implicit val hwAccEnc: Encoder[HwAcc] = Encoders.product[HwAcc]
  private implicit val hwOutEnc: Encoder[HwOut] = Encoders.product[HwOut]

  private def hwFold(key: String, rows: Iterator[KV], state: GroupState[HwAcc],
                     alpha: Double, beta: Double, gamma: Double,
                     m: Int): Iterator[HwOut] = {
    var acc = if (state.exists) Some(state.get) else None
    rows.map { r =>
      val next = acc match {
        case None => HwAcc(r.value, 0.0, Vector.fill(m)(0.0))
        case Some(HwAcc(l0, t0, s)) =>
          val s0 = s.head
          val l = alpha * (r.value - s0) + (1.0 - alpha) * (l0 + t0)
          val t = beta * (l - l0) + (1.0 - beta) * t0
          val sn = gamma * (r.value - l) + (1.0 - gamma) * s0
          HwAcc(l, t, s.tail :+ sn)
      }
      acc = Some(next)
      HwOut(key, r.ord, next.l, next.t, next.s.last,
            next.l + next.t + next.s.head)
    } ++ { acc.foreach(state.update); Iterator.empty }
  }

  /** HOLT-WINTERS additive seasonal smoothing (triple exponential) per
    * key — the seasonal completion of the [[ewmaStream]]→[[holtStream]]
    * forecasting ladder, with THREE coupled recurrences:
    * Lₙ = α(xₙ − sₙ₋ₘ) + (1−α)(Lₙ₋₁ + Tₙ₋₁),
    * Tₙ = β(Lₙ − Lₙ₋₁) + (1−β)Tₙ₋₁,
    * sₙ = γ(xₙ − Lₙ) + (1−γ)sₙ₋ₘ, one-step forecast Lₙ + Tₙ + sₙ₋ₘ₊₁.
    * Deterministic cold start: L₁ = x₁, T₁ = 0, seasonal buffer all-zero
    * (components LEARN rather than being pre-fit — the only init both
    * engines can state without a separate fitting pass). All three
    * factors binary-exact (α = γ = 1/4, β = 1/8), so the recursive
    * oracle — which carries the seasonal LIST through the recursion —
    * pins the fold bit-for-bit. */
  def holtWintersStream(ds: Dataset[KV], alpha: Double, beta: Double,
                        gamma: Double, m: Int,
                        mode: OutputMode = OutputMode.Append()): Dataset[HwOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[HwAcc, HwOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[HwAcc]) =>
          hwFold(key, rows.toSeq.sortBy(_.ord).iterator, state,
                 alpha, beta, gamma, m)
      }

  /** [[holtWintersStream]] over a pre-ordered grouping: one lazy pass,
    * O(m) state. */
  def holtWintersOrdered(g: org.apache.spark.sql.KeyValueGroupedDataset[String, KV],
                         alpha: Double, beta: Double, gamma: Double,
                         m: Int): Dataset[HwOut] =
    g.flatMapGroupsWithState[HwAcc, HwOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[HwAcc]) =>
        hwFold(key, rows, state, alpha, beta, gamma, m)
    }

  /** CUSUM CHANGE DETECTION per key: sₙ = max(0, sₙ₋₁ + xₙ − target),
    * alarm and reset when sₙ exceeds the alarm threshold — the classic
    * sequential drift detector (Page 1954). The reset makes the recurrence
    * NON-ASSOCIATIVE: no window frame or aggregate can express it, which
    * is exactly what the keyed sequential-state machinery is for — the
    * first operator class here that is stateful-or-nothing even in batch.
    * Streaming form: each batch's slice sorts by ord, state carries sₙ
    * across micro-batches (the reset boundary can fall between batches). */
  def cusumStream(ds: Dataset[KV], targetCents: Long, alarmCents: Long,
                  mode: OutputMode = OutputMode.Append()): Dataset[CusumOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CusumAcc, CusumOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[CusumAcc]) =>
          cusumFold(key, rows.toSeq.sortBy(_.ord).iterator, state, targetCents, alarmCents)
      }

  // ---- ORDER-ASSUMING batch forms: stream the group, buffer nothing ----
  //
  // The forms above sort each group's slice in-operator because neither
  // batch groups nor micro-batch slices arrive ordered — at the cost of
  // materializing the slice. In BATCH execution the caller can instead
  // establish (key, ord) order in the PLAN — repartition(key) +
  // sortWithinPartitions(key, ord), grouped via the COLUMN form
  // `groupBy(col).as[K, T]` (the lambda form `groupByKey` appends a fresh
  // grouping column, which would force a re-shuffle and destroy the sort) —
  // and the exec's required (distribution, ordering) are both already
  // satisfied, so NO exchange or sort is inserted and the group iterator
  // arrives ord-sorted. The fold is then a single lazy pass: memory through
  // the operator is O(1) per key regardless of group size, the same bound
  // as the q1p–q4p secondary-sort forms, while still exercising the real
  // `flatMapGroupsWithState` API (state is written at iterator exhaustion —
  // batch state is per-group-ephemeral, but the handle discipline is kept).
  // OrderedStatefulSpec pins the no-extra-exchange/no-extra-sort plan shape;
  // a regression there would re-order rows and fail the value oracles too.

  import org.apache.spark.sql.KeyValueGroupedDataset

  /** [[runningMax]] over a pre-ordered grouping: one lazy pass, O(1) state. */
  def runningMaxOrdered(g: KeyValueGroupedDataset[String, KV]): Dataset[KeyedOut] =
    g.flatMapGroupsWithState[MaxSoFar, KeyedOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[MaxSoFar]) =>
        var cur = if (state.exists) state.get.max else Double.NegativeInfinity
        rows.map { r =>
          if (!sqlGe(cur, r.value)) cur = r.value
          KeyedOut(key, r.ord, cur)
        } ++ { state.update(MaxSoFar(cur)); Iterator.empty }
    }

  /** [[blockAverage]] over a pre-ordered grouping: one lazy pass. */
  def blockAverageOrdered(g: KeyValueGroupedDataset[String, KV],
                          emitCount: Int = 50): Dataset[KeyedOutN] =
    g.flatMapGroupsWithState[BlockAcc, KeyedOutN](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[BlockAcc]) =>
        var acc = if (state.exists) state.get else BlockAcc(0, 0L, 0, 0L)
        rows.flatMap { r =>
          if (acc.count < emitCount) {
            if (java.lang.Double.isFinite(r.value)) {
              val cents = (BigDecimal(r.value)
                .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
              acc = BlockAcc(acc.count + 1, acc.cents + cents, acc.nFinite + 1, acc.block)
            } else
              acc = BlockAcc(acc.count + 1, acc.cents, acc.nFinite, acc.block)
            Iterator.empty
          } else {
            val avg = if (acc.nFinite == 0) None
                      else Some((acc.cents.toDouble / 100.0) / emitCount)
            val out = KeyedOutN(key, r.ord, acc.block, avg)
            acc = BlockAcc(0, 0L, 0, acc.block + 1L)
            Iterator.single(out)
          }
        } ++ { state.update(acc); Iterator.empty }
    }

  /** [[runningMaxBySubkey]] over a pre-ordered grouping: one lazy pass,
    * state O(distinct subkeys per key). */
  def runningMaxBySubkeyOrdered(g: KeyValueGroupedDataset[String, KSV]): Dataset[SubkeyOut] =
    g.flatMapGroupsWithState[SubkeyMax, SubkeyOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[SubkeyMax]) =>
        var m = if (state.exists) state.get.m else Map.empty[String, Double]
        rows.map { r =>
          val cur = m.get(r.subkey) match {
            case Some(prev) if sqlGe(prev, r.value) => prev
            case _                                  => r.value
          }
          m = m.updated(r.subkey, cur)
          SubkeyOut(key, r.subkey, r.ord, cur)
        } ++ { state.update(SubkeyMax(m)); Iterator.empty }
    }

  /** [[cusumStream]] over a pre-ordered grouping: one lazy pass, O(1)
    * state — the batch execution of the sequential drift detector. */
  def cusumOrdered(g: KeyValueGroupedDataset[String, KV],
                   targetCents: Long, alarmCents: Long): Dataset[CusumOut] =
    g.flatMapGroupsWithState[CusumAcc, CusumOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[CusumAcc]) =>
        cusumFold(key, rows, state, targetCents, alarmCents)
    }

  /** [[holtStream]] over a pre-ordered grouping: one lazy pass, O(1) state. */
  def holtOrdered(g: KeyValueGroupedDataset[String, KV],
                  alpha: Double, beta: Double): Dataset[HoltOut] =
    g.flatMapGroupsWithState[HoltAcc, HoltOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[HoltAcc]) => holtFold(key, rows, state, alpha, beta)
    }

  /** [[ewmaStream]] over a pre-ordered grouping: one lazy pass, O(1) state. */
  def ewmaOrdered(g: KeyValueGroupedDataset[String, KV], alpha: Double): Dataset[EwmaOut] =
    g.flatMapGroupsWithState[EwmaAcc, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[EwmaAcc]) => ewmaFold(key, rows, state, alpha)
    }

  /** The trailing-n ring [[donchianStream]] carries per key (oldest
    * first, at most n values). */
  case class DonchAcc(ring: List[Long])
  case class DonchOut(key: String, ord: Long, vc: Long, n_prior: Long,
                      donch_hi: Option[Long], donch_lo: Option[Long],
                      breakout_up: Long, breakout_dn: Long)
  private implicit val donchAccEnc: Encoder[DonchAcc] = Encoders.product[DonchAcc]
  private implicit val donchOutEnc: Encoder[DonchOut] = Encoders.product[DonchOut]

  /** DONCHIAN CHANNEL as keyed streaming state — the trailing-n PRIOR
    * window ([[graft.operators.Indicators.donchianByType]]'s semantics)
    * carried as a bounded ring per key: each arrival reads the band off
    * the ring BEFORE appending itself (the batch form's 1-PRECEDING
    * frame), flags fire only on a full ring, and the ring crosses
    * micro-batch boundaries in state — the compound-state shape next to
    * Holt-Winters' seasonal ring, but VALUE-bounded (n cents) rather
    * than season-bounded. `value` must arrive as INTEGER CENTS already
    * cast in the plan (the cusum convention — plan-side `round` is the
    * engine's HALF_UP decimal rule; a JVM-side math.round would diverge
    * on negative halves). Ordering contract as everywhere (sorted
    * slice, ordered per-key arrival). */
  def donchianStream(ds: Dataset[KV], n: Int,
                     mode: OutputMode = OutputMode.Append()): Dataset[DonchOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[DonchAcc, DonchOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[DonchAcc]) =>
          var ring = if (state.exists) state.get.ring else Nil
          val out = rows.toSeq.sortBy(_.ord).map { r =>
            val vc = r.value.toLong
            val nPrior = ring.length.toLong
            val full = ring.length == n
            val hi = if (ring.isEmpty) None else Some(ring.max)
            val lo = if (ring.isEmpty) None else Some(ring.min)
            val up = if (full && hi.exists(vc > _)) 1L else 0L
            val dn = if (full && lo.exists(vc < _)) 1L else 0L
            ring = (ring :+ vc).takeRight(n)
            DonchOut(key, r.ord, vc, nPrior, hi, lo, up, dn)
          }
          state.update(DonchAcc(ring))
          out.iterator
      }

  /** Running-product accumulator ([[productOrdered]]). */
  case class ProdAcc(s: Double)
  case class ProdOut(key: String, ord: Long, product: Double)
  private implicit val prodAccEnc: Encoder[ProdAcc] = Encoders.product[ProdAcc]
  private implicit val prodOutEnc: Encoder[ProdOut] = Encoders.product[ProdOut]

  /** RUNNING PRODUCT per key over a pre-ordered grouping — the sequential
    * multiplicative fold SQL has no window aggregate for (exp(Σln) trades
    * exactness for libm's last ulp — a cross-engine hazard; the fold is
    * the same IEEE multiply sequence a recursive CTE states). O(1) state:
    * the current product, seeded at 1.0 (1.0·x ≡ x bit-exactly, so the
    * first output equals the first factor). Kaplan-Meier's product-limit
    * estimator is the registered consumer. */
  def productOrdered(g: KeyValueGroupedDataset[String, KV]): Dataset[ProdOut] =
    g.flatMapGroupsWithState[ProdAcc, ProdOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[ProdAcc]) =>
        var s = if (state.exists) state.get.s else 1.0
        rows.map { r =>
          s = s * r.value
          ProdOut(key, r.ord, s)
        } ++ { state.update(ProdAcc(s)); Iterator.empty }
    }

  /** Drawdown accumulator: running peak and worst drawdown so far. */
  case class DrawdownAcc(peak: Double, maxDd: Double)
  case class DrawdownOut(key: String, ord: Long, peak: Double,
                         drawdown: Double, max_drawdown: Double)

  private implicit val ddAccEnc: Encoder[DrawdownAcc] = Encoders.product[DrawdownAcc]
  private implicit val ddOutEnc: Encoder[DrawdownOut] = Encoders.product[DrawdownOut]

  private def drawdownFold(key: String, rows: Iterator[KV],
                           state: GroupState[DrawdownAcc]): Iterator[DrawdownOut] = {
    var acc = if (state.exists) Some(state.get) else None
    rows.map { r =>
      val peak = acc match {
        case None    => r.value
        case Some(a) => math.max(a.peak, r.value)
      }
      val dd = peak - r.value
      val maxDd = acc match {
        case None    => dd
        case Some(a) => math.max(a.maxDd, dd)
      }
      acc = Some(DrawdownAcc(peak, maxDd))
      DrawdownOut(key, r.ord, peak, dd, maxDd)
    } ++ { acc.foreach(state.update); Iterator.empty }
  }

  /** RUNNING PEAK / MAX DRAWDOWN per key — the risk statistic every
    * price-series monitor carries: peakₙ = max(peakₙ₋₁, xₙ),
    * ddₙ = peakₙ − xₙ, maxddₙ = max(maxddₙ₋₁, ddₙ). Unlike CUSUM/EWMA
    * this recurrence IS window-expressible (two running maxes and one
    * subtraction), so the batch form is declarative (the Spark-first
    * statement); this stream form exists because a live monitor cannot
    * re-window history — both peak and worst-so-far cross micro-batch
    * boundaries in one ValueState-shaped record. Numerics: max picks an
    * existing double and the subtraction is a single correctly-rounded
    * op, so batch, streaming, and the window oracle agree bit-for-bit. */
  def drawdownStream(ds: Dataset[KV],
                     mode: OutputMode = OutputMode.Append()): Dataset[DrawdownOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[DrawdownAcc, DrawdownOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[DrawdownAcc]) =>
          drawdownFold(key, rows.toSeq.sortBy(_.ord).iterator, state)
      }

  /** OBV accumulator: previous tick's integer cents + the running ledger. */
  case class ObvAcc(prevVc: Long, obv: Long)
  case class ObvOut(key: String, ord: Long, vol: Long, sgn: Long, obv: Long)

  private implicit val obvAccEnc: Encoder[ObvAcc] = Encoders.product[ObvAcc]
  private implicit val obvOutEnc: Encoder[ObvOut] = Encoders.product[ObvOut]

  private def obvFold(key: String, rows: Iterator[KV],
                      state: GroupState[ObvAcc]): Iterator[ObvOut] = {
    var acc = if (state.exists) Some(state.get) else None
    rows.map { r =>
      // HALF_UP on the decimal string of value*100 — the batch twin's
      // round(value * 100.0) (Spark round = BigDecimal HALF_UP), so the
      // cents agree bit-for-bit on any input, not just 2-decimal prices
      val vc = BigDecimal(r.value * 100.0)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLongExact
      val vol = r.ord % 97 + 1
      val sgn = acc match {
        case None    => 0L
        case Some(a) => if (vc > a.prevVc) 1L else if (vc < a.prevVc) -1L else 0L
      }
      val obv = acc.map(_.obv).getOrElse(0L) + sgn * vol
      acc = Some(ObvAcc(vc, obv))
      ObvOut(key, r.ord, vol, sgn, obv)
    } ++ { acc.foreach(state.update); Iterator.empty }
  }

  /** ON-BALANCE VOLUME per key — the signed cumulative volume ledger
    * (obvₙ = obvₙ₋₁ + volₙ·sign(centsₙ − centsₙ₋₁), first tick
    * contributes 0). Window-expressible, so the batch form is declarative
    * ([[graft.operators.Indicators.obvByType]]); this stream form exists
    * because a live ledger cannot re-window history — (previous cents,
    * running obv) cross micro-batch boundaries in one state record. The
    * fold is ALL-INTEGER after the cents quantization, so batch,
    * streaming, and the window oracle agree exactly at any batch split. */
  def obvStream(ds: Dataset[KV],
                mode: OutputMode = OutputMode.Append()): Dataset[ObvOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[ObvAcc, ObvOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[ObvAcc]) =>
          obvFold(key, rows.toSeq.sortBy(_.ord).iterator, state)
      }

  /** Pre-scaled CUSUM accumulator (integer statistic units). */
  case class CusumUAcc(s: Long)
  case class CusumUOut(key: String, ord: Long, ru: Long, cusum_u: Long, alarm: Long)

  private implicit val cusumUAccEnc: Encoder[CusumUAcc] = Encoders.product[CusumUAcc]
  private implicit val cusumUOutEnc: Encoder[CusumUOut] = Encoders.product[CusumUOut]

  /** [[cusumStream]]'s recurrence over ALREADY-QUANTIZED integer inputs:
    * the caller supplies each observation as an integral double (micro
    * units — exact to 2⁵³), and slack/alarm live in the same units. This
    * is the composition-friendly form: upstream stages (e.g. seasonal
    * residuals) own their quantization, the detector stays pure integer
    * arithmetic — sₙ = max(0, sₙ₋₁ + rₙ − slack), alarm + reset past the
    * threshold, bit-free of float drift by construction. */
  def cusumScaledOrdered(g: KeyValueGroupedDataset[String, KV],
                         slackU: Long, alarmU: Long): Dataset[CusumUOut] =
    g.flatMapGroupsWithState[CusumUAcc, CusumUOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[CusumUAcc]) =>
        var s = if (state.exists) state.get.s else 0L
        rows.map { r =>
          val ru = r.value.toLong
          val raw = math.max(0L, s + ru - slackU)
          val alarm = if (raw > alarmU) 1L else 0L
          s = if (alarm == 1L) 0L else raw
          CusumUOut(key, r.ord, ru, s, alarm)
        } ++ { state.update(CusumUAcc(s)); Iterator.empty }
    }

  /** RSI accumulator: previous value + Wilder-smoothed gain/loss averages.
    * `seeded` distinguishes "first diff seeds the averages" from the
    * steady-state smoothing step. */
  case class RsiAcc(prev: Double, ag: Double, al: Double, seeded: Boolean)
  case class RsiOut(key: String, ord: Long, avg_gain: Double,
                    avg_loss: Double, rsi: Double)

  private implicit val rsiAccEnc: Encoder[RsiAcc] = Encoders.product[RsiAcc]
  private implicit val rsiOutEnc: Encoder[RsiOut] = Encoders.product[RsiOut]

  private def rsiFold(key: String, rows: Iterator[KV],
                      state: GroupState[RsiAcc]): Iterator[RsiOut] = {
    var acc = if (state.exists) Some(state.get) else None
    rows.flatMap { r =>
      acc match {
        case None =>
          // first observation per key: no diff yet, nothing emitted
          acc = Some(RsiAcc(r.value, 0.0, 0.0, seeded = false))
          Iterator.empty[RsiOut]
        case Some(a) =>
          val d = r.value - a.prev
          val g = if (d > 0) d else 0.0
          val l = if (d < 0) -d else 0.0
          val (ag, al) =
            if (!a.seeded) (g, l)
            else (0.9375 * a.ag + 0.0625 * g, 0.9375 * a.al + 0.0625 * l)
          acc = Some(RsiAcc(r.value, ag, al, seeded = true))
          val denom = ag + al
          // (100·ag)/denom can land an ulp above 100 when al = 0 (the
          // numerator's rounding); min is exact selection, both engines
          val rsi = if (denom == 0) 50.0
                    else math.min(100.0, (100.0 * ag) / denom)
          Iterator.single(RsiOut(key, r.ord, ag, al, rsi))
      }
    } ++ { acc.foreach(state.update); Iterator.empty }
  }

  /** WILDER'S RELATIVE STRENGTH INDEX per key, α = 1/16: split each
    * one-step diff into gain/loss, smooth both with
    * aₙ = (15/16)·aₙ₋₁ + (1/16)·xₙ, RSI = 100·ag/(ag + al) clamped to
    * 100 (the numerator's rounding can overshoot by an ulp; flat tape →
    * 50). The classic n = 14 smoothing (13/14, 1/14) is replaced by the
    * BINARY-EXACT n = 16 so both coefficient multiplies are single
    * correctly-rounded IEEE ops — the EWMA parity precondition. Averages
    * seed from the FIRST DIFF (not Wilder's n-bar warm-up mean), the
    * streaming-friendly seed: a live monitor has no warm-up buffer. The
    * coupled (prev, ag, al) state crosses micro-batch boundaries as one
    * record; like CUSUM the gain/loss SPLIT makes the recurrence
    * non-associative — no window frame expresses it. */
  def rsiStream(ds: Dataset[KV],
                mode: OutputMode = OutputMode.Append()): Dataset[RsiOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[RsiAcc, RsiOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[RsiAcc]) =>
          rsiFold(key, rows.toSeq.sortBy(_.ord).iterator, state)
      }

  /** [[rsiStream]] over a pre-ordered grouping: one lazy pass, O(1) state. */
  def rsiOrdered(g: KeyValueGroupedDataset[String, KV]): Dataset[RsiOut] =
    g.flatMapGroupsWithState[RsiAcc, RsiOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[RsiAcc]) => rsiFold(key, rows, state)
    }

  /** MACD accumulator: fast EMA, slow EMA, signal EMA. */
  case class MacdAcc(emaF: Double, emaS: Double, sig: Double)
  case class MacdOut(key: String, ord: Long, macd: Double,
                     signal_line: Double, histogram: Double)

  private implicit val macdAccEnc: Encoder[MacdAcc] = Encoders.product[MacdAcc]
  private implicit val macdOutEnc: Encoder[MacdOut] = Encoders.product[MacdOut]

  private def macdFold(key: String, rows: Iterator[KV],
                       state: GroupState[MacdAcc]): Iterator[MacdOut] = {
    var acc = if (state.exists) Some(state.get) else None
    rows.map { r =>
      val next = acc match {
        case None => MacdAcc(r.value, r.value, 0.0)
        case Some(a) =>
          val f = 0.75 * a.emaF + 0.25 * r.value
          val s = 0.9375 * a.emaS + 0.0625 * r.value
          MacdAcc(f, s, 0.875 * a.sig + 0.125 * (f - s))
      }
      acc = Some(next)
      val m = next.emaF - next.emaS
      MacdOut(key, r.ord, m, next.sig, m - next.sig)
    } ++ { acc.foreach(state.update); Iterator.empty }
  }

  /** MACD (moving-average convergence/divergence) per key: fast EMA
    * (α = 1/4) minus slow EMA (α = 1/16), with a signal EMA (α = 1/8) of
    * that difference and histogram = macd − signal. All three smoothing
    * factors are BINARY-EXACT replacements for the classic 12/26/9 spans
    * (whose 2/(n+1) factors are not representable) — the EWMA parity
    * argument then covers all THREE coupled recurrences, which cross
    * micro-batch boundaries together in one state record. Seed: both EMAs
    * start at x₁ (macd₁ = 0 exactly), signal starts at 0. */
  def macdStream(ds: Dataset[KV],
                 mode: OutputMode = OutputMode.Append()): Dataset[MacdOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[MacdAcc, MacdOut](mode, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[MacdAcc]) =>
          macdFold(key, rows.toSeq.sortBy(_.ord).iterator, state)
      }

  /** [[macdStream]] over a pre-ordered grouping: one lazy pass, O(1) state. */
  def macdOrdered(g: KeyValueGroupedDataset[String, KV]): Dataset[MacdOut] =
    g.flatMapGroupsWithState[MacdAcc, MacdOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[MacdAcc]) => macdFold(key, rows, state)
    }

  /** [[thresholdGaps]] over a pre-ordered grouping: one lazy pass. */
  def thresholdGapsOrdered(g: KeyValueGroupedDataset[String, KV],
                           threshold: Double): Dataset[GapOut] =
    g.flatMapGroupsWithState[GapCount, GapOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key, rows, state: GroupState[GapCount]) =>
        var n = if (state.exists) state.get.n else 0L
        rows.flatMap { r =>
          if (sqlGe(r.value, threshold)) {
            val out = GapOut(key, r.ord, n)
            n = 0L
            Iterator.single(out)
          } else {
            n += 1L
            Iterator.empty
          }
        } ++ { state.update(GapCount(n)); Iterator.empty }
    }

  /** Gap-fill event: (key, event time, value). */
  case class LocfEv(key: String, ts: java.sql.Timestamp, value: Double)
  /** One emitted spine hour: active (n_events > 0, its own max) or a gap
    * (n_events = 0, the last active hour's max carried forward). */
  case class LocfOut(key: String, hs: Long, n_events: Long, locf_max: Double)
  /** The OPEN hour: index, its event count and max so far. The open hour
    * is by definition active, so its `mx` IS the LOCF value for any gap
    * hours that follow it — no separate carried value is needed. `closed`
    * marks an hour already emitted by its event-time timeout: the state is
    * KEPT after the timeout-emit so a key that resumes in a later hour
    * still fills the gap rows from the closed hour's max (removing it
    * would silently hole the spine — the timeout proves the HOUR complete,
    * not the key finished). */
  case class LocfAcc(hs: Long, n: Long, mx: Double, closed: Boolean)

  private implicit val locfEvEnc: Encoder[LocfEv]   = Encoders.product[LocfEv]
  private implicit val locfOutEnc: Encoder[LocfOut] = Encoders.product[LocfOut]
  private implicit val locfAccEnc: Encoder[LocfAcc] = Encoders.product[LocfAcc]

  /** STREAMING RESAMPLE + GAP-FILL per key — the micro-batch twin of the
    * batch hourly spine + LOCF window ([[graft.operators.Sessionize
    * .gapfillLocf]]): each key holds exactly its OPEN hour in state; an
    * event in a later hour closes it (emitting the finished hour and one
    * zero-count LOCF row per skipped hour), and the FINAL open hour — which
    * no event can ever close — is flushed by an event-time timeout at its
    * hour end, driven across the finish line by the far-future sentinel's
    * watermark advance, exactly like session expiry. State is O(1) per key
    * — after the timeout-emit it shrinks to one CLOSED marker row (kept so
    * a key that resumes hours later still gets its gap rows; removing it
    * would silently hole the spine); the spine is emitted incrementally,
    * so at no point does any executor hold a per-key hour range.
    *
    * Assumes watermark-ordered arrival per key (the ordered two-file
    * replay; a 0s-delay watermark makes anything else late data the engine
    * drops before this operator) — an in-slice sort by event time absorbs
    * intra-batch scan disorder, and a row behind the open hour fails loudly
    * rather than corrupting the spine. */
  def gapfillLocfStream(ds: Dataset[LocfEv],
                        mode: OutputMode = OutputMode.Append()): Dataset[LocfOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LocfAcc, LocfOut](mode,
          GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[LocfAcc]) =>
          if (state.hasTimedOut) {
            // the watermark passed the open hour's end: no event can ever
            // land in it again — emit it, but KEEP the closed hour in
            // state: a key that resumes in a later hour owes gap rows
            // carrying this hour's max (state stays one row per key; no
            // new timeout is armed, so a silent key costs nothing more)
            val a = state.get
            state.update(a.copy(closed = true))
            Iterator.single(LocfOut(key, a.hs, a.n, a.mx))
          } else {
            val out = Seq.newBuilder[LocfOut]
            var acc = state.getOption
            for (r <- rows.toSeq.sortBy(_.ts.getTime)) {
              // hour index in ms ≡ the batch form's ts_ns div 1h (positive
              // epoch; sub-ms precision cannot move an hour boundary)
              val h = Math.floorDiv(r.ts.getTime, 3600000L)
              acc match {
                case None =>
                  acc = Some(LocfAcc(h, 1L, r.value, closed = false))
                case Some(a) if a.closed =>
                  // the hour was already emitted by its timeout; the
                  // watermark passing its end guarantees h lands beyond it
                  require(h > a.hs,
                    s"key $key: hour $h arrived inside closed hour ${a.hs} — " +
                      "watermark-ordered arrival violated")
                  var g = a.hs + 1L
                  while (g < h) { out += LocfOut(key, g, 0L, a.mx); g += 1L }
                  acc = Some(LocfAcc(h, 1L, r.value, closed = false))
                case Some(a) if h == a.hs =>
                  acc = Some(LocfAcc(a.hs, a.n + 1L, math.max(a.mx, r.value), closed = false))
                case Some(a) =>
                  require(h > a.hs,
                    s"key $key: hour $h arrived behind open hour ${a.hs} — " +
                      "watermark-ordered arrival violated")
                  out += LocfOut(key, a.hs, a.n, a.mx)
                  var g = a.hs + 1L
                  while (g < h) { out += LocfOut(key, g, 0L, a.mx); g += 1L }
                  acc = Some(LocfAcc(h, 1L, r.value, closed = false))
              }
            }
            acc.foreach { a =>
              state.update(a)
              // fires once the watermark proves the hour complete; a slice
              // that only observed an already-closed hour arms nothing new
              if (!a.closed) state.setTimeoutTimestamp((a.hs + 1L) * 3600000L)
            }
            out.result().iterator
          }
      }

  /** One buffered event awaiting watermark settlement (epoch ms + value). */
  case class LocfPendEv(ms: Long, v: Double)
  /** OOO gap-fill state: the unsettled buffer + the open/closed hour. */
  case class LocfOooAcc(pend: Seq[LocfPendEv], open: Option[LocfAcc])

  private implicit val locfOooAccEnc: Encoder[LocfOooAcc] =
    Encoders.product[LocfOooAcc]

  /** [[gapfillLocfStream]] hardened for OUT-OF-ORDER arrival — the same
    * buffer-until-the-watermark-settles-the-order discipline as
    * [[sessionizeOooStream]]:
    *
    *  - rows at or above the watermark wait in the pend buffer (a future
    *    row could still sort before them);
    *  - rows strictly below it are SETTLED — every future engine-admitted
    *    row sorts at or after the watermark, hence after them — and fold
    *    through the ordered open/close/gap logic exactly as the ordered
    *    form does (h can never regress: settled rows are ≥ the previous
    *    batch's watermark, which is ≥ everything previously settled);
    *  - the open hour closes (emits, stays as the CLOSED marker for later
    *    gap fills) once the watermark passes its end — possibly in the
    *    same invocation that opened it;
    *  - `EventTimeTimeout` re-arms at whichever comes first: the open
    *    hour's end or the earliest pending row's settlement, so the
    *    sentinel-driven trailing batches drain everything.
    *
    * State is O(events within the watermark slack) per key plus the O(1)
    * hour marker; same output contract and q29 batch oracle as the ordered
    * form (the spine is a pure function of the time-sorted event list,
    * which this op reconstructs exactly regardless of arrival order). */
  def gapfillLocfOooStream(ds: Dataset[LocfEv],
                           mode: OutputMode = OutputMode.Append()): Dataset[LocfOut] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LocfOooAcc, LocfOut](mode,
          GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[LocfOooAcc]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(LocfOooAcc(Nil, None))
          val all = (prev.pend ++ rows.map(r => LocfPendEv(r.ts.getTime, r.value)))
            .sortBy(e => (e.ms, e.v))
          val (settled, pend) = all.partition(_.ms < wmMs)
          val out = Seq.newBuilder[LocfOut]
          var acc = prev.open
          for (e <- settled) {
            val h = Math.floorDiv(e.ms, 3600000L)
            acc match {
              case None =>
                acc = Some(LocfAcc(h, 1L, e.v, closed = false))
              case Some(a) if a.closed =>
                require(h > a.hs,
                  s"key $key: settled hour $h inside closed hour ${a.hs}")
                var g = a.hs + 1L
                while (g < h) { out += LocfOut(key, g, 0L, a.mx); g += 1L }
                acc = Some(LocfAcc(h, 1L, e.v, closed = false))
              case Some(a) if h == a.hs =>
                acc = Some(LocfAcc(a.hs, a.n + 1L, math.max(a.mx, e.v), closed = false))
              case Some(a) =>
                require(h > a.hs,
                  s"key $key: settled hour $h behind open hour ${a.hs}")
                out += LocfOut(key, a.hs, a.n, a.mx)
                var g = a.hs + 1L
                while (g < h) { out += LocfOut(key, g, 0L, a.mx); g += 1L }
                acc = Some(LocfAcc(h, 1L, e.v, closed = false))
            }
          }
          // the open hour is complete once the watermark passes its end:
          // every admitted future row lands in a strictly later hour
          acc match {
            case Some(a) if !a.closed && wmMs >= (a.hs + 1L) * 3600000L =>
              out += LocfOut(key, a.hs, a.n, a.mx)
              acc = Some(a.copy(closed = true))
            case _ => ()
          }
          state.update(LocfOooAcc(pend, acc))
          // wake at whichever settles next: the open hour's end, or the
          // earliest pending row crossing the watermark (+1 ms ceil) —
          // both strictly above the current watermark by construction
          val wake = (acc.filter(!_.closed).map(a => (a.hs + 1L) * 3600000L).toSeq ++
            pend.headOption.map(_.ms + 1L).toSeq).reduceOption((a, b) => math.min(a, b))
          wake.foreach(state.setTimeoutTimestamp)
          out.result().iterator
      }
}
