package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{AttrEv, CepOut}

/** CEP followed-by pattern match: the keyed pending-view NFA vs the batch
  * window-firsts form, plus the per-transition semantics on a handcrafted
  * tape. */
class CepSpec extends SparkSpec {

  import spark.implicits._

  test("cep NFA: purchase completes pending views; error kills; horizon expires") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = StatefulOps.cepStream(mem.toDS(), withinUs = 1000L)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("cep_out").start()
    try {
      // batch 1: u1 view@100 pends; u2 view@0 then error@50 kills it;
      // u3 view@0 pends (will expire)
      mem.addData(Seq(AttrEv(1, 1, 100, "view"), AttrEv(2, 2, 0, "view"),
                      AttrEv(2, 3, 50, "error"), AttrEv(3, 4, 0, "view")))
      q.processAllAvailable()
      assert(spark.table("cep_out").count() === 0)
      // batch 2 (state crossed the boundary):
      //  u1 purchase@600 completes the batch-1 view -> ONE match
      //  u1 purchase@700: pending cleared by the first purchase -> nothing
      //  u2 purchase@800: view was killed by the error -> nothing
      //  u3 purchase@2000: view@0 beyond the 1000µs horizon -> nothing
      mem.addData(Seq(AttrEv(1, 5, 600, "purchase"), AttrEv(1, 6, 700, "purchase"),
                      AttrEv(2, 7, 800, "purchase"), AttrEv(3, 8, 2000, "purchase")))
      q.processAllAvailable()
      val got = spark.table("cep_out").as[CepOut].collect().toSeq
      assert(got === Seq(CepOut(1L, 1L, 100L, 600L)))
      // batch 3: two views pend, one purchase completes BOTH (each view's
      // first following purchase is this one — skip-till-next-match)
      mem.addData(Seq(AttrEv(4, 9, 100, "view"), AttrEv(4, 10, 200, "view"),
                      AttrEv(4, 11, 300, "purchase")))
      q.processAllAvailable()
      val u4 = spark.table("cep_out").as[CepOut].collect()
        .filter(_.user_id == 4L).map(o => (o.event_id, o.purchase_us)).toSet
      assert(u4 === Set((9L, 300L), (10L, 300L)))
    } finally q.stop()
  }

  test("cep streaming NFA equals the batch window firsts on the corpus") {
    val st = operators.StatefulQueries.cepFunnelFollowedByStreaming(spark, Sf0001)
    val ba = operators.Sessionize.cepFunnelFollowedBy(spark, Sf0001)
    assert(st.exceptAll(ba).isEmpty && ba.exceptAll(st).isEmpty)
    // the match set is non-vacuous at this SF (probed: 3 matches)
    assert(ba.count() > 0)
  }

  test("cep absence: timer fires the alert off the watermark; purchase suppresses; data flushes") {
    import StatefulOps.{CepAlert, CepTimedEv}
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val mem = MemoryStream[CepTimedEv]
    // 2-second horizon
    val q = StatefulOps.cepAbsenceStream(
        mem.toDS().withWatermark("ts", "0 seconds").as[CepTimedEv],
        withinUs = 2000000L)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("cep_abs").start()
    try {
      // u1's view is completed by an in-horizon purchase -> silence;
      // u2's view pends (deadline 3.5 s in timer-ms terms)
      mem.addData(Seq(CepTimedEv(1, 1, ts(1000), "view"),
                      CepTimedEv(1, 2, ts(2000), "purchase"),
                      CepTimedEv(2, 3, ts(1500), "view")))
      q.processAllAvailable()
      assert(spark.table("cep_abs").count() === 0,
        "nothing may alert before the watermark passes a deadline")
      // an unrelated purchase advances the watermark to 10 s -> u2's
      // TIMER fires: the alert exists although NO u2 row ever arrived
      mem.addData(Seq(CepTimedEv(3, 4, ts(10000), "purchase")))
      q.processAllAvailable()
      assert(spark.table("cep_abs").as[CepAlert].collect().toSet ===
        Set(CepAlert(2L, 3L, 1500000L, 3500000L)))
      // DATA-DRIVEN flush: u4's second view arrives past the first's
      // horizon -> the first alerts immediately, no timer needed
      mem.addData(Seq(CepTimedEv(4, 5, ts(20000), "view"),
                      CepTimedEv(4, 6, ts(23000), "view")))
      q.processAllAvailable()
      assert(spark.table("cep_abs").as[CepAlert].collect().toSet ===
        Set(CepAlert(2L, 3L, 1500000L, 3500000L),
            CepAlert(4L, 5L, 20000000L, 22000000L)))
    } finally q.stop()
  }

  test("cep absence streaming (timers) equals the batch window complement on the corpus") {
    val st = operators.StatefulQueries.cepAbsenceAlertStreaming(spark, Sf0001)
    val ba = operators.Sessionize.cepAbsenceAlert(spark, Sf0001)
    assert(st.exceptAll(ba).isEmpty && ba.exceptAll(st).isEmpty)
    // probed at sf0.001: 185 alerts, 10 of them tape-end (timer-only)
    assert(ba.count() > 0)
    // the two verdict sets are DISJOINT: a match needs its first
    // following purchase inside the horizon, an alert needs it null or
    // beyond (a view killed by an intervening error is in neither —
    // absence ignores errors, so the sets partition only the error-free
    // views)
    val matches = operators.Sessionize.cepFunnelFollowedBy(spark, Sf0001)
      .select("event_id")
    val alerts = ba.select("event_id")
    assert(matches.intersect(alerts).isEmpty)
  }

  test("cep times NFA: the view ring crosses the batch boundary; fires exactly once; horizons expire") {
    import StatefulOps.TimesOut
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    // n = 3 views within 1000 µs, purchase within 5000 µs
    val q = StatefulOps.cepTimesStream(mem.toDS(), n = 3,
        winUs = 1000L, followUs = 5000L)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("cep_times").start()
    try {
      // batch 1: two views — the ring holds 2, no burst yet
      mem.addData(Seq(AttrEv(1, 1, 100, "view"), AttrEv(1, 2, 200, "view")))
      q.processAllAvailable()
      assert(spark.table("cep_times").count() === 0)
      // batch 2: the CROSS-BATCH witness — the third view completes the
      // burst only because the ring survived the boundary, and the
      // purchase completes the open match in the same batch
      mem.addData(Seq(AttrEv(1, 3, 300, "view"), AttrEv(1, 4, 900, "purchase")))
      q.processAllAvailable()
      assert(spark.table("cep_times").as[TimesOut].collect().toSeq ===
        Seq(TimesOut(1L, 3L, 100L, 300L, 900L)))
      // batch 3: a SECOND purchase must not re-fire the completed burst
      // (skip-till-next-match cleared the open list)
      mem.addData(Seq(AttrEv(1, 5, 1000, "purchase")))
      q.processAllAvailable()
      assert(spark.table("cep_times").count() === 1,
        "a burst matches only its first following purchase")
      // u2: burst completes, but the first purchase arrives BEYOND the
      // follow horizon -> the open match expires unseen
      mem.addData(Seq(AttrEv(2, 6, 100, "view"), AttrEv(2, 7, 150, "view"),
                      AttrEv(2, 8, 200, "view")))
      q.processAllAvailable()
      mem.addData(Seq(AttrEv(2, 9, 99999, "purchase")))
      q.processAllAvailable()
      assert(!spark.table("cep_times").as[TimesOut].collect().exists(_.user_id == 2L))
      // u3: three views too SLOW for the window (ring full but stale) ->
      // no burst, so the in-horizon purchase completes nothing
      mem.addData(Seq(AttrEv(3, 10, 0, "view"), AttrEv(3, 11, 2000, "view"),
                      AttrEv(3, 12, 4000, "view"), AttrEv(3, 13, 4500, "purchase")))
      q.processAllAvailable()
      assert(!spark.table("cep_times").as[TimesOut].collect().exists(_.user_id == 3L))
      // u4: a long view run — EVERY ring-complete view inside the window
      // opens its own match (sliding times semantics), one purchase
      // completes them all
      mem.addData(Seq(AttrEv(4, 14, 100, "view"), AttrEv(4, 15, 200, "view"),
                      AttrEv(4, 16, 300, "view"), AttrEv(4, 17, 400, "view"),
                      AttrEv(4, 18, 500, "purchase")))
      q.processAllAvailable()
      val u4 = spark.table("cep_times").as[TimesOut].collect()
        .filter(_.user_id == 4L).map(o => (o.event_id, o.burst_start_us)).toSet
      assert(u4 === Set((16L, 100L), (17L, 200L)))
    } finally q.stop()
  }

  test("cep next NFA: strictness breaks on ANY intervening event; adjacency crosses the batch boundary") {
    import StatefulOps.NextOut
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = StatefulOps.cepNextStream(mem.toDS(), withinUs = 1000L)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("cep_next").start()
    try {
      // u1: view then an intervening CLICK then purchase — followed-by
      // would match, strict contiguity must not
      mem.addData(Seq(AttrEv(1, 1, 100, "view"), AttrEv(1, 2, 150, "click"),
                      AttrEv(1, 3, 200, "purchase")))
      q.processAllAvailable()
      assert(spark.table("cep_next").count() === 0,
        "an intervening click must break strict contiguity")
      // u2: the CROSS-BATCH witness — view ends batch 2, purchase opens
      // batch 3; only the carried previous-event state can see the pair
      mem.addData(Seq(AttrEv(2, 4, 100, "view")))
      q.processAllAvailable()
      mem.addData(Seq(AttrEv(2, 5, 600, "purchase")))
      q.processAllAvailable()
      assert(spark.table("cep_next").as[NextOut].collect().toSeq ===
        Seq(NextOut(2L, 4L, 100L, 600L)))
      // u3: adjacent but BEYOND the horizon -> no match
      mem.addData(Seq(AttrEv(3, 6, 0, "view"), AttrEv(3, 7, 5000, "purchase")))
      q.processAllAvailable()
      assert(!spark.table("cep_next").as[NextOut].collect().exists(_.user_id == 3L))
      // u2 again: a SECOND purchase is not adjacent to the view anymore
      // (the first purchase overwrote the carried event)
      mem.addData(Seq(AttrEv(2, 8, 700, "purchase")))
      q.processAllAvailable()
      assert(spark.table("cep_next").count() === 1)
    } finally q.stop()
  }

  test("cep next streaming equals the batch lead pair on the corpus; next ⊆ followed-by") {
    val st = operators.StatefulQueries.cepNextMatchStreaming(spark, Sf0001)
    val ba = operators.Sessionize.cepNextMatch(spark, Sf0001)
    assert(st.exceptAll(ba).isEmpty && ba.exceptAll(st).isEmpty)
    // non-vacuous (measured: 3 strict matches at sf0.001), and every
    // strict match is also a followed-by match with the same purchase
    // (the error-kill cannot bite: the next event IS the purchase)
    assert(ba.count() > 0)
    val fb = operators.Sessionize.cepFunnelFollowedBy(spark, Sf0001)
    assert(ba.join(fb, Seq("user_id", "event_id", "view_us", "purchase_us"),
      "left_anti").count() === 0)
  }

  test("cep times streaming equals the batch lag-window form on the corpus") {
    val st = operators.StatefulQueries.cepTimesBurstStreaming(spark, Sf0001)
    val ba = operators.Sessionize.cepTimesBurst(spark, Sf0001)
    assert(st.exceptAll(ba).isEmpty && ba.exceptAll(st).isEmpty)
    // the match set is non-vacuous at this SF (measured: 2 matches under
    // the registered day-long window/follow horizons)
    assert(ba.count() > 0)
  }
}
