package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream inner join with watermarks and a time-range condition —
  * the last streaming surface the engine exposes: clicks joined to the
  * impression that preceded them within 10 minutes. */
class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  case class Imp(imp_id: Long, user: String, imp_ts: Timestamp)
  case class Click(click_id: Long, cuser: String, click_ts: Timestamp)

  private val Base = 1699999800000L
  private def t(minute: Int) = new Timestamp(Base + minute * 60000L)

  test("watermarked interval stream-stream join matches expected pairs") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val joined = imps.toDF().withWatermark("imp_ts", "20 minutes")
      .join(
        clicks.toDF().withWatermark("click_ts", "20 minutes"),
        expr("""user = cuser AND
                click_ts >= imp_ts AND
                click_ts <= imp_ts + interval 10 minutes""".stripMargin))
    val q = joined.select(col("imp_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    imps.addData(Imp(1, "u", t(0)), Imp(2, "u", t(30)))
    clicks.addData(Click(10, "u", t(5)),  // joins imp 1 (within 10 min)
                   Click(11, "u", t(25)), // joins nothing (imp1 too old, imp2 later)
                   Click(12, "u", t(35))) // joins imp 2
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 12L)))
  }

  test("q23ss: stream-stream interval join matches the batch twin bit for bit") {
    // the in-gate form: two watermarked file streams, symmetric-hash join,
    // batch per-user count over the drained pairs — vs the bucketed batch
    // self-join registered under the same oracle
    val ss = graft.operators.StatefulQueries.intervalJoinStreaming(spark, Sf0001)
    val batch = graft.operators.Sessionize.intervalPairCounts(spark, Sf0001)
    assert(ss.count() === batch.count())
    assert(ss.exceptAll(batch).isEmpty && batch.exceptAll(ss).isEmpty)
    // the cross-batch + state-eviction witnesses live INSIDE the drain
    // (intervalJoinStreaming's check) — reaching here means both held
  }

  test("q23lo: outer stream-stream join emits every zero-pair user via state eviction") {
    val lo = graft.operators.StatefulQueries.intervalJoinStreamingOuter(spark, Sf0001)
    // batch left-join twin with the identical condition
    val ev = graft.io.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("ts"))
    val a = ev.select(col("user_id").as("u_a"), col("event_id").as("i_a"), col("ts").as("t_a"))
    val b = ev.select(col("user_id").as("u_b"), col("event_id").as("i_b"), col("ts").as("t_b"))
    val batch = a.join(b,
        expr("u_a = u_b AND i_b > i_a AND t_b >= t_a AND t_b <= t_a + INTERVAL 5 MINUTES"),
        "left_outer")
      .groupBy(col("u_a").as("user_id"))
      .agg(count(col("i_b")).as("n_pairs"))
    assert(lo.exceptAll(batch).isEmpty && batch.exceptAll(lo).isEmpty)
    val rows = lo.collect()
    // every a-side user appears, and the null-padded (eviction-emitted)
    // path really fired: this corpus has zero-pair users
    assert(rows.length === ev.select("user_id").distinct().count())
    assert(rows.exists(_.getLong(1) == 0L), "expected at least one zero-pair user")
  }

  test("q6ss: stream-static join + complete-mode agg matches the batch plan bit for bit") {
    val ss = graft.operators.StatefulQueries.revenueJoinStreamStatic(spark, Sf0001)
    val batch = graft.operators.Relational.revenueByNation(spark, Sf0001)
    assert(ss.exceptAll(batch).isEmpty && batch.exceptAll(ss).isEmpty)
    // the >=2-data-batch witness (complete-mode state accumulated across
    // micro-batches) lives inside the drain; reaching here means it held
  }

  test("q23sj semi: an a-row matching in BOTH batches emits once and leaves state at first match") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val joined = imps.toDF().withWatermark("imp_ts", "20 minutes")
      .join(
        clicks.toDF().withWatermark("click_ts", "20 minutes"),
        expr("""user = cuser AND
                click_ts >= imp_ts AND
                click_ts <= imp_ts + interval 10 minutes""".stripMargin),
        "left_semi")
    val q = joined.select(col("imp_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_semi_once").start()
    try {
      def stateRows = q.recentProgress.filter(_.numInputRows > 0)
        .last.stateOperators(0).numRowsTotal
      // batch 1: the FIRST match lands in b-side state before the a-row
      clicks.addData(Click(10, "u", t(1)))
      q.processAllAvailable()
      assert(stateRows === 1L)
      // batch 2: the a-row arrives, matches the stored click, emits —
      // and is NEVER STORED (the semi state drop: a matched a-row does
      // not enter the store; inner-style retention would show 2 rows)
      imps.addData(Imp(1, "u", t(0)))
      q.processAllAvailable()
      assert(spark.table("ssj_semi_once").collect().map(_.getLong(0)).toSeq
        == Seq(1L))
      assert(stateRows === 1L)
      // batch 3: a SECOND in-window match — the semi semantics must NOT
      // re-emit (at-most-once); only the new click's state row is added
      clicks.addData(Click(11, "u", t(2)))
      q.processAllAvailable()
      assert(spark.table("ssj_semi_once").collect().map(_.getLong(0)).toSeq
        == Seq(1L), "a second in-window match re-emitted the a-row")
      assert(stateRows === 2L)
    } finally q.stop()
  }

  test("full outer memory stream: unmatched rows on BOTH sides null-pad after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val joined = imps.toDF().withWatermark("imp_ts", "5 minutes")
      .join(
        clicks.toDF().withWatermark("click_ts", "5 minutes"),
        expr("""user = cuser AND
                click_ts >= imp_ts AND
                click_ts <= imp_ts + interval 10 minutes""".stripMargin),
        "full_outer")
    val q = joined.select(col("imp_id"), col("click_id"))
      .writeStream.outputMode("append").format("memory").queryName("ssj_fo").start()
    try {
      imps.addData(Imp(1, "u", t(0)),   // matches click 10
                   Imp(2, "w", t(6)))   // no click for w -> a-side padding
      clicks.addData(Click(10, "u", t(5)),
                     Click(11, "v", t(5))) // no imp for v -> b-side padding
      q.processAllAvailable()
      // two more batches: the first advances the watermark past every
      // window, the second applies it (eviction emits the padding)
      imps.addData(Imp(98, "z", t(120)))
      q.processAllAvailable()
      clicks.addData(Click(99, "z2", t(125)))
      q.processAllAvailable()
      val got = spark.table("ssj_fo").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                   if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got.contains((1L, 10L)), "matched pair missing")
      assert(got.contains((2L, -1L)), "a-side padding missing")
      assert(got.contains((-1L, 11L)), "b-side padding missing")
    } finally q.stop()
  }

  test("q23fo: full outer counts pairs and pads both sides; run-heads equal run-tails") {
    val fo = graft.operators.StatefulQueries
      .intervalJoinStreamingFullOuter(spark, Sf0001)
    val rows = fo.collect()
    val ev = graft.io.Tables.events(spark, Sf0001)
    assert(rows.length === ev.select("user_id").distinct().count())
    // the runs identity: gaps wider than the interval partition each
    // user's tape into runs; an unmatched a-row is a run TAIL (no
    // successor inside the window), an unmatched b-row a run HEAD (no
    // predecessor) — one of each per run, so the padding counts agree
    assert(rows.forall(r => r.getLong(2) === r.getLong(3)))
    assert(rows.exists(_.getLong(2) > 0), "padding never fired")
    // matched-pair counts agree with the inner form (absent user = 0)
    val inner = SparkEntry.queries("q23_interval_join")(spark, Sf0001)
      .withColumnRenamed("user_id", "iu").withColumnRenamed("n_pairs", "ip")
    val j = fo.join(inner, col("user_id") === col("iu"), "left_outer")
    assert(j.filter(col("ip").isNotNull && col("n_pairs") =!= col("ip")).count() === 0L)
    assert(j.filter(col("ip").isNull && col("n_pairs") =!= 0).count() === 0L)
  }

  test("temporal join: each purchase reads the version valid strictly before its own time") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.StatefulQueries.temporalJoinStreaming(spark, Sf0001)
    // independent re-derivation: a RANGE frame over us (not rows — a
    // same-µs earlier-id event must NOT be visible, matching the interval
    // join's strict valid_from < us), latest version by (us, event_id)
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val expect = graft.io.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("value"), expr("ts_ns div 1000").as("us"))
      .withColumn("prev",
        max(struct(col("us"), col("event_id"), col("value"))).over(w))
      .filter(col("event_type") === "purchase" && col("prev").isNotNull)
      .select(col("user_id"), col("event_id"), col("us"),
              col("prev.value").as("as_of_value"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("q23sj: semi join emits each matched row once — counts bounded by inner, same user set") {
    import org.apache.spark.sql.functions.col
    val semi  = graft.operators.StatefulQueries.intervalJoinStreamingSemi(spark, Sf0001)
    val inner = SparkEntry.queries("q23_interval_join")(spark, Sf0001)
      .withColumnRenamed("user_id", "iu")
    // a user has a matched row iff it has a pair, and at-most-once
    // emission means n_matched <= n_pairs with both strictly positive
    val j = semi.join(inner, col("user_id") === col("iu"), "full_outer").cache()
    assert(j.filter(col("user_id").isNull || col("iu").isNull).count() == 0)
    assert(j.filter(col("n_matched") > col("n_pairs")).count() == 0)
    assert(j.filter(col("n_matched") < 1).count() == 0)
    j.unpersist()
  }
}
