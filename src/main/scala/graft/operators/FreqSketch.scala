package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.TextFunctions

/** Frequent-items (heavy-hitters) sketch: a Misra–Gries summary as a typed
  * `Aggregator`, the mergeable-summary counterpart to the library's other
  * sketches (HLL distinct counts q10a, approximate quantiles q10b, bloom
  * contamination prefilter).
  *
  * Why a sketch instead of `groupBy(item).count().orderBy(...).limit(k)`:
  * the exact plan shuffles one row PER DISTINCT ITEM. At 100 TB a token /
  * URL / entity vocabulary can be billions of keys — the shuffle is
  * corpus-vocabulary-sized. The Misra–Gries buffer is a constant
  * `capacity`-entry map per partition, combined map-side and merged to a
  * single fixed-size summary: the data moved to the driver-side reducer is
  * `O(partitions × capacity)`, independent of both corpus size and
  * vocabulary size.
  *
  * Guarantees (the classic ones, preserved by the pairwise merge — see
  * "Mergeable Summaries", Agarwal et al., PODS 2012): with `n` items
  * observed, every estimate `est(x)` satisfies
  * `true(x) - n/(capacity+1) <= est(x) <= true(x)`, and every item with
  * `true(x) > n/(capacity+1)` is present in the summary. When the true
  * distinct-item count never exceeds `capacity`, no decrement ever fires
  * and the sketch is EXACT — which is how [[vocabTopKSketch]] registers
  * under the same DuckDB oracle as the exact `vocab_topk`.
  *
  * Reference scope: the reference engine has no sketches at all (its four
  * jobs keep exact per-key state, e.g. MaximumClosingPrice.java:47-82);
  * this is part of the beyond-the-reference LLM-pipeline surface.
  */
object FreqSketch {

  /** Misra–Gries over Long item ids. Buffer = item → lower-bound counter
    * (at most `capacity` entries) plus the total items folded so far, which
    * rides along so callers can report the `n/(capacity+1)` error bound of
    * the exact run that produced the summary. */
  case class MGSummary(counters: Map[Long, Long], n: Long)

  case class MGAgg(capacity: Int)
      extends Aggregator[Long, MGSummary, MGSummary] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    def zero: MGSummary = MGSummary(Map.empty, 0L)

    def reduce(b: MGSummary, x: Long): MGSummary = {
      val c = b.counters
      if (c.contains(x))
        MGSummary(c.updated(x, c(x) + 1L), b.n + 1L)
      else if (c.size < capacity)
        MGSummary(c.updated(x, 1L), b.n + 1L)
      else {
        // decrement-all step: subtracting 1 from every counter and dropping
        // zeros is the textbook form; together with the unmatched new item
        // (implicitly cancelled against them) this is what yields the
        // n/(capacity+1) bound
        MGSummary(c.collect { case (k, v) if v > 1L => (k, v - 1L) }, b.n + 1L)
      }
    }

    def merge(a: MGSummary, b: MGSummary): MGSummary = {
      val combined = b.counters.foldLeft(a.counters) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      val trimmed =
        if (combined.size <= capacity) combined
        else {
          // subtract the (capacity+1)-th largest count from everything and
          // keep the strictly-positive survivors — the offset each error
          // bound absorbs; ties broken by the sort being on counts only
          val d = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
          combined.collect { case (k, v) if v > d => (k, v - d) }
        }
      MGSummary(trimmed, a.n + b.n)
    }

    def finish(r: MGSummary): MGSummary = r
    // kryo for the map-carrying buffer, same trade as TopK.TopKAgg: the
    // typed-agg path re-encodes per partial merge and the blob is cheaper
    // than a catalyst map for a <=capacity-entry summary
    def bufferEncoder: Encoder[MGSummary] = Encoders.kryo[MGSummary]
    def outputEncoder: Encoder[MGSummary] = Encoders.kryo[MGSummary]
  }

  /** Fold a column of item ids into one Misra–Gries summary: map-side
    * partial sketches, one fixed-size merge — no vocabulary-wide shuffle
    * anywhere in the plan. */
  def sketch(items: Dataset[Long], capacity: Int): MGSummary =
    items.select(MGAgg(capacity).toColumn).head()

  /** `vocab_topk` semantics (top-k token hashes by document frequency)
    * computed through the sketch instead of the exact groupBy — registered
    * under the SAME oracle: `capacity` (default 4096) is far above the test
    * corpus vocabulary, so no decrement ever fires and the summary's counts
    * ARE the document frequencies. At production vocabulary sizes the same
    * plan degrades gracefully to the n/(capacity+1)-bounded heavy-hitters
    * answer instead of degrading to a billion-key shuffle. */
  def vocabTopKSketch(spark: SparkSession, sfDir: String,
                      k: Int = 50, capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    val th = Tables.documentsNarrow(spark, sfDir)
      .select(explode(array_distinct(TextFunctions.tokenHashes(col("text")))).as("th"))
      .as[Long]
    val summary = sketch(th, capacity)
    topK(spark, summary, k)
  }

  /** The same heavy-hitters computation through the REAL micro-batch
    * engine: a global complete-mode aggregation whose ENTIRE streaming
    * state is one `capacity`-entry summary, updated incrementally per
    * micro-batch — the unbounded-stream answer to "top tokens so far"
    * where the exact streaming `groupBy(th).count()` would keep one state
    * row per distinct item forever. Registered under the same exact
    * oracle (capacity >> test vocabulary). */
  def vocabTopKSketchStreaming(spark: SparkSession, sfDir: String,
                               k: Int = 50, capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    val th = Tables.streamTable(spark, sfDir, "documents")
      .select(explode(array_distinct(TextFunctions.tokenHashes(col("text")))).as("th"))
      .as[Long]
    // one summary = one state row; stateWidth 1 keeps the single-group
    // aggregate from paying 32 state-store instances per micro-batch
    val out = StatefulQueries.drainToMemory(
      spark, th.select(MGAgg(capacity).toColumn).toDF(),
      stateWidth = Some(1), outputMode = "complete")()
    val summary = out.as[MGSummary](Encoders.kryo[MGSummary]).head()
    topK(spark, summary, k)
  }

  /** KEYED heavy hitters: top-k token hashes by document frequency PER
    * LANGUAGE, one Misra–Gries summary per group. The only shuffle key is
    * the group (languages — small), never the vocabulary: partial per-group
    * summaries combine map-side, so each reducer receives
    * `O(partitions × capacity)` per group no matter how many distinct
    * tokens the group's documents contain. Exact at test capacity → exact
    * per-group top-k oracle. */
  def vocabTopKByLangSketch(spark: SparkSession, sfDir: String,
                            k: Int = 10, capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    val th = Tables.spreadIfNarrow(
        Tables.documents(spark, sfDir).select(col("lang"), col("text")),
        col("lang"))
      .select(col("lang"),
              explode(array_distinct(TextFunctions.tokenHashes(col("text")))).as("th"))
      .as[(String, Long)]
    val perLang = th.groupByKey(_._1).mapValues(_._2)
      .agg(MGAgg(capacity).toColumn.name("summary"))
    perLang.flatMap { case (lang, s) =>
      s.counters.toSeq
        .sortBy { case (item, df) => (-df, item) }
        .take(k)
        .zipWithIndex
        .map { case ((item, df), i) => (lang, (i + 1).toLong, item, df) }
    }.toDF("lang", "rk", "th", "df")
      .orderBy(col("lang"), col("rk"))
  }

  /** EVENT-TIME-WINDOWED heavy hitters: top-k users by event count per
    * tumbling 1-day window, one Misra–Gries summary per window. The shuffle
    * key is the WINDOW (days — calendar-bounded), never the user id:
    * partial per-window summaries combine map-side, so a reducer receives
    * `O(partitions × capacity)` per day no matter how many distinct users
    * the day saw — the "trending items per window" shape (top queries per
    * hour, top URLs per day) where the exact `groupBy(window, user)` would
    * shuffle one row per (window, user) pair. Exact at test capacity
    * (capacity ≥ any day's distinct users: 8192 clears sf0.1's peak of
    * 1356 with headroom — an under-capacity summary undercounts and broke
    * the sf0.1 hash at 1024) → exact per-window top-k oracle, the
    * MG-family precedent. */
  def topKUsersDailySketch(spark: SparkSession, sfDir: String,
                           k: Int = 5, capacity: Int = 8192): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).cast("long").as("day_start"),
              col("user_id"))
      .as[(Long, Long)]
    val perDay = ev.groupByKey(_._1).mapValues(_._2)
      .agg(MGAgg(capacity).toColumn.name("summary"))
    perDay.flatMap { case (day, s) =>
      s.counters.toSeq
        .sortBy { case (user, c) => (-c, user) }
        .take(k)
        .zipWithIndex
        .map { case ((user, c), i) => (day, (i + 1).toLong, user, c) }
    }.toDF("day_start", "rk", "user_id", "n_events")
      .orderBy(col("day_start"), col("rk"))
  }

  /** The keyed sketch's STREAMING twin on `transformWithState`: ONE
    * Misra–Gries summary per language held as a literal
    * `ValueState[MGSummary]` — total streaming state is
    * `languages × capacity` entries however many distinct tokens flow by,
    * which is the whole point versus the exact streaming
    * `groupBy(lang, th).count()` keeping one state row per (lang, token)
    * forever. Emission is CUMULATIVE (the [[TwsOps.TtlDedupProcessor]]
    * precedent): every batch that touches a language re-emits its current
    * summary with a strictly larger `n`, and the batch side keeps the
    * max-n row per language — so the drained sink holds
    * O(languages × batches) rows, never per-token rows. */
  val MGStateVar = "mgSummary"

  class MGByKeyProcessor(capacity: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), MGEmit] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var sum: ValueState[MGSummary] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // kryo, matching the aggregator's buffer encoding: the TWS state-row
      // encoder rejects MapType columns, and the <=capacity-entry summary
      // is cheaper as one blob than as exploded rows anyway
      sum = getHandle.getValueState[MGSummary](MGStateVar,
        Encoders.kryo[MGSummary], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                 timerValues: TimerValues): Iterator[MGEmit] = {
      val agg = MGAgg(capacity)
      var cur = if (sum.exists()) Option(sum.get()).getOrElse(agg.zero) else agg.zero
      rows.foreach(r => cur = agg.reduce(cur, r._2))
      sum.update(cur)
      val (items, counts) = cur.counters.toArray.sortBy(_._1).unzip
      Iterator.single(MGEmit(key, cur.n, items, counts))
    }
  }

  /** Per-batch cumulative emission row: a language's summary after folding
    * that batch's slice (`n` strictly increases per emission, so max-n picks
    * the final state). Parallel arrays, not a map — MapType is rejected by
    * the streaming state/sink row encoders. */
  case class MGEmit(lang: String, n: Long, items: Array[Long], counts: Array[Long])

  /** [[vocabTopKByLangSketch]] through the REAL micro-batch engine on the
    * RocksDB store (TWS's required provider), over a two-file doc_id-split
    * replay so each language's summary provably crosses a micro-batch
    * boundary (the ≥2-data-batch witness is asserted from the query's own
    * progress). Registered under the same exact per-language oracle —
    * capacity >> test vocabulary, the MG-family precedent. */
  def vocabTopKByLangSketchTws(spark: SparkSession, sfDir: String,
                               k: Int = 10, capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val dir = StatefulQueries.timeOrderedFilesCopy(spark, s"docs-lang:$sfDir",
        Seq("d0.parquet", "d1.parquet")) {
      val d = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("text"))
      val maxIdRow = d.agg(max(col("doc_id"))).head()
      if (maxIdRow.isNullAt(0)) Seq(d)
      else {
        // doc_id cut at half the max; drop an empty half (it would replay
        // a zero-row batch and fail the data-batch witness)
        val mid = maxIdRow.getLong(0) / 2
        Seq(d.filter(col("doc_id") <= mid), d.filter(col("doc_id") > mid))
          .filter(!_.isEmpty)
      }
    }
    implicit val outEnc: Encoder[MGEmit] = Encoders.product[MGEmit]
    val drained = StatefulQueries.withRocksDbStateStore(spark) {
      StatefulQueries.drainOrderedFiles(spark, dir, minBatches = 2) { stream =>
        stream.select(col("lang"),
            explode(array_distinct(TextFunctions.tokenHashes(col("text")))).as("th"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .transformWithState(new MGByKeyProcessor(capacity),
            TimeMode.None(), OutputMode.Append())
          .toDF()
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc)
    drained.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("lang"), col("n"), col("items"), col("counts")).as[MGEmit]
      .flatMap { e =>
        e.items.zip(e.counts).toSeq
          .sortBy { case (item, df) => (-df, item) }
          .take(k)
          .zipWithIndex
          .map { case ((item, df), i) => (e.lang, (i + 1).toLong, item, df) }
      }.toDF("lang", "rk", "th", "df")
      .orderBy(col("lang"), col("rk"))
  }

  /** Distinct-count ROLLUP via mergeable HLL sketches — the incremental
    * pattern a 100 TB metrics pipeline actually runs: materialize one
    * fixed-size sketch per partition (here: per day), then answer any
    * range's distinct count by UNIONING sketches instead of re-scanning
    * events. Daily sketches shuffle as constant-size blobs (one per day);
    * the running union walks the day-count-sized sketch table, never the
    * event stream — adding a day to a 30-day rolling distinct costs one
    * union, not a 30-day rescan. The estimates register under an EXACT
    * DuckDB oracle because at fixture cardinalities the DataSketches HLL
    * stays in its exact sparse (coupon) modes — the same
    * exact-at-test-scale argument as the MG family; at production
    * cardinalities the estimate carries the standard ±1.6%/√2^lgK bound. */
  def hllDailyUsers(spark: SparkSession, sfDir: String, lgK: Int = 14): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).cast("long").as("day_start"),
              col("user_id"))
      .groupBy(col("day_start"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
    // running union over the DAY table (calendar-bounded single partition —
    // the global order costs nothing at any event scale)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day_start"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    daily
      .withColumn("cum_sk", hll_union_agg(col("sk"), lit(true)).over(w))
      .select(col("day_start"),
              hll_sketch_estimate(col("sk")).as("daily_users"),
              hll_sketch_estimate(col("cum_sk")).as("cum_users"))
      .orderBy(col("day_start"))
  }

  /** The ROLLING 7-day distinct-user count via mergeable HLL sketches —
    * the scale path [[graft.operators.Sessionize.dauRolling7d]]'s SCALING
    * entry names: the exact form explodes (user, day) PAIRS into their 7
    * contributing windows (linear, but user-pair-sized), while this form
    * collapses each day to ONE constant-size sketch blob first and
    * explodes the BLOBS — shuffle volume is days × 7 sketches no matter
    * how many distinct users a day saw. At fixture cardinalities the
    * DataSketches HLL stays in exact (sparse) mode, so this registers
    * under dau_rolling_7d's own exact oracle — the hll_daily_users
    * precedent; at production cardinalities the ±1.6%/√2^lgK estimate is
    * the documented trade. */
  def dauRolling7dSketch(spark: SparkSession, sfDir: String,
                         lgK: Int = 14): DataFrame = {
    val DayNs = 86400000000000L
    val daily = Tables.events(spark, sfDir)
      .select(expr(s"ts_ns div $DayNs").as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
    // forward contribution on the blobs (dauRolling7d's explode, minus the
    // per-user rows); the observed-days join drops windows past the tail
    val win = daily
      .select(col("sk"), explode(sequence(col("day"), col("day") + 6)).as("day"))
      .join(daily.select(col("day")), "day")
      .groupBy(col("day"))
      .agg(hll_union_agg(col("sk"), lit(true)).as("wsk"))
    daily
      .select(col("day"), hll_sketch_estimate(col("sk")).as("dau"))
      .join(win, "day")
      .select(col("day"), col("dau"),
              hll_sketch_estimate(col("wsk")).as("dau_7d"))
      .orderBy(col("day"))
  }

  // ---- Count–Min sketch: mergeable point-frequency estimates ----

  /** Row-hash constants live in [[graft.functions.HashKernels.CmA]] — ONE
    * definition shared with the codegen'd point-estimate expression
    * ([[graft.functions.HashExpressions.CmEstimate]]), so the sketch builder
    * and the distributed prober can never drift. */
  private def CmA = graft.functions.HashKernels.CmA

  /** Count–Min over Long item ids: a `d × w` counter matrix, incremented at
    * one cell per row per item, merged by ELEMENTWISE SUM — the perfectly
    * mergeable sketch. `est(x) = min_i cells(i)(h_i(x))` never
    * underestimates, and overestimates by at most `e·n/w` with probability
    * `1 - e^-d`. Unlike Misra–Gries it answers point queries for ANY item
    * (the frequency-threshold prepass shape: "keep tokens seen ≥ t times"
    * over a billion-token vocabulary with 32 KB of state). */
  case class CMSketch(cells: Array[Long], n: Long)

  case class CMAgg(w: Int, d: Int) extends Aggregator[Long, CMSketch, CMSketch] {
    require(d >= 1 && d <= CmA.length, s"d must be in [1, ${CmA.length}], got $d")
    require(w >= 2, s"w must be >= 2, got $w")

    @inline private def cell(row: Int, x: Long): Int =
      graft.functions.HashKernels.cmCell(row, w, x)

    def zero: CMSketch = CMSketch(new Array[Long](w * d), 0L)
    def reduce(b: CMSketch, x: Long): CMSketch = {
      var i = 0
      while (i < d) { b.cells(cell(i, x)) += 1L; i += 1 }
      CMSketch(b.cells, b.n + 1L)
    }
    def merge(a: CMSketch, b: CMSketch): CMSketch = {
      val out = new Array[Long](w * d)
      var i = 0
      while (i < w * d) { out(i) = a.cells(i) + b.cells(i); i += 1 }
      CMSketch(out, a.n + b.n)
    }
    def finish(r: CMSketch): CMSketch = r
    def bufferEncoder: Encoder[CMSketch] = Encoders.kryo[CMSketch]
    def outputEncoder: Encoder[CMSketch] = Encoders.kryo[CMSketch]

    /** Point estimate for one item: min over rows. */
    def estimate(s: CMSketch, x: Long): Long = {
      var best = Long.MaxValue
      var i = 0
      while (i < d) { val v = s.cells(cell(i, x)); if (v < best) best = v; i += 1 }
      best
    }
  }

  /** Document frequencies for a SMALL KNOWN query-token set (the tokens of
    * the first ten documents), estimated from one Count–Min pass over the
    * whole corpus's per-document-distinct token stream. The corpus side
    * never groups by token — it folds into the constant-size matrix
    * map-side; only the tiny query set is materialized. At the default
    * width the estimates carry no collisions on the test vocabulary, so the
    * query registers under the EXACT per-token df oracle. */
  def tokenDfCountMin(spark: SparkSession, sfDir: String,
                      w: Int = 1024, d: Int = 4): DataFrame = {
    import spark.implicits._
    val agg = CMAgg(w, d)
    val th = Tables.documentsNarrow(spark, sfDir)
      .select(explode(array_distinct(TextFunctions.tokenHashes(col("text")))).as("th"))
      .as[Long]
    val cm = th.select(agg.toColumn).head()
    // query set: control-plane-sized by construction (ten documents' tokens)
    val queryTokens = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 10)
      .select(explode(array_distinct(TextFunctions.tokenHashes(col("text")))).as("th"))
      .distinct().as[Long].collect().sorted
    queryTokens.toSeq.map(t => (t, agg.estimate(cm, t)))
      .toDF("th", "df")
      .orderBy(col("th"))
  }

  /** Summary → ordered (th, df) top-k frame. The summary is ≤ `capacity`
    * entries by construction — driver-side materialization is
    * control-plane-sized, never corpus-sized. */
  private def topK(spark: SparkSession, summary: MGSummary, k: Int): DataFrame = {
    import spark.implicits._
    summary.counters.toSeq.toDF("th", "df")
      .orderBy(col("df").desc, col("th").asc)
      .limit(k)
  }
}
