package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{SessionEv, SessionOut}

/** Streaming session windows with event-time timeout: sessions must close
  * exactly when the watermark passes end+gap, and the emitted sessions must
  * match the batch sessionization of the same data. */
class SessionStreamSpec extends SparkSpec {

  import spark.implicits._

  case class Raw(ts: Timestamp, key: String)

  private val Base = 1699999800000L
  private def t(minute: Int) = new Timestamp(Base + minute * 60000L)

  test("event-time timeout closes sessions; results match batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Raw]
    val evs = mem.toDF()
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("ts"))
      .as[SessionEv]
    val q = StatefulOps.sessionizeStream(evs, gapMinutes = 10)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    // session 1: minutes 0..5; session 2 starts at 30 (gap 25 > 10)
    mem.addData(Raw(t(0), "u"), Raw(t(5), "u"))
    q.processAllAvailable()
    mem.addData(Raw(t(30), "u")) // watermark jumps to 30 > 5+10 → session 1 closes
    q.processAllAvailable()
    mem.addData(Raw(t(33), "u"), Raw(t(60), "u")) // 60 > 33+10 → session 2 closes in-batch? no: cross-batch timeout
    q.processAllAvailable()
    mem.addData(Raw(t(90), "u")) // watermark 90 → session (33..60?) wait: 60 starts new in-batch
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out").as[SessionOut].collect()
      .sortBy(_.start_us).map(s => (((s.start_us - Base * 1000L) / 60000000L).toInt,
                                    ((s.end_us - Base * 1000L) / 60000000L).toInt, s.n_events))
    // sessions [0,5](2) closed by wm=30, [30,33](2) closed in-batch at t=60,
    // [60,60](1) closed by wm=90 via event-time timeout
    assert(got.toSeq === Seq((0, 5, 2L), (30, 33, 2L), (60, 60, 1L)))
  }

  test("locf stream: gaps cross the batch boundary; the final hour flushes on timeout") {
    import graft.streaming.StatefulOps.{LocfEv, LocfOut}
    implicit val sqlCtx = spark.sqlContext
    val H0 = 1699999200000L // hour-aligned epoch ms
    def at(hour: Int, minute: Int) = new Timestamp(H0 + hour * 3600000L + minute * 60000L)
    val h0 = H0 / 3600000L
    val mem = MemoryStream[LocfEv]
    val evs = mem.toDF()
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("ts"), col("value")).as[LocfEv]
    val q = StatefulOps.gapfillLocfStream(evs)
      .writeStream.outputMode("append").format("memory").queryName("locf_out").start()
    // batch 1: hour 0 twice, then hour 3 — closes hour 0 and fills 1, 2
    mem.addData(LocfEv("a", at(0, 1), 5.0), LocfEv("a", at(0, 2), 9.0),
                LocfEv("a", at(3, 0), 4.0))
    q.processAllAvailable()
    // batch 2: hour 5 — hour 3 (held OPEN across the boundary in state)
    // closes now, and the gap hour 4 carries its max
    mem.addData(LocfEv("a", at(5, 10), 7.0))
    q.processAllAvailable()
    // batch 3: an unrelated key far ahead advances the watermark past
    // hour 5's end — the timeout flushes a's final hour from state
    mem.addData(LocfEv("z", at(9, 0), 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("locf_out").as[LocfOut].collect()
      .filter(_.key == "a").sortBy(_.hs)
      .map(o => (o.hs - h0, o.n_events, o.locf_max))
    assert(got.toSeq === Seq(
      (0L, 2L, 9.0), (1L, 0L, 9.0), (2L, 0L, 9.0),
      (3L, 1L, 4.0), (4L, 0L, 4.0), (5L, 1L, 7.0)))
  }

  test("locf stream: a key resuming AFTER its timeout still emits the gap rows") {
    import graft.streaming.StatefulOps.{LocfEv, LocfOut}
    implicit val sqlCtx = spark.sqlContext
    val H0 = 1699999200000L
    def at(hour: Int) = new Timestamp(H0 + hour * 3600000L)
    val h0 = H0 / 3600000L
    val mem = MemoryStream[LocfEv]
    val evs = mem.toDF()
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("ts"), col("value")).as[LocfEv]
    val q = StatefulOps.gapfillLocfStream(evs)
      .writeStream.outputMode("append").format("memory").queryName("locf_res").start()
    mem.addData(LocfEv("a", at(0), 5.0))
    q.processAllAvailable()
    // the unrelated key advances the watermark past hour 0's end:
    // a's open hour times out and is emitted — state must survive CLOSED
    mem.addData(LocfEv("z", at(4), 1.0))
    q.processAllAvailable()
    // a resumes at hour 6: the spine owes gap rows 1..5 carrying max 5.0
    // (the pre-fix remove-on-timeout silently dropped them)
    mem.addData(LocfEv("a", at(6), 7.0))
    q.processAllAvailable()
    mem.addData(LocfEv("z", at(12), 1.0)) // flush a's hour 6 by timeout
    q.processAllAvailable()
    q.stop()
    val got = spark.table("locf_res").as[LocfOut].collect()
      .filter(_.key == "a").sortBy(_.hs)
      .map(o => (o.hs - h0, o.n_events, o.locf_max))
    assert(got.toSeq === Seq(
      (0L, 1L, 5.0), (1L, 0L, 5.0), (2L, 0L, 5.0), (3L, 0L, 5.0),
      (4L, 0L, 5.0), (5L, 0L, 5.0), (6L, 1L, 7.0)))
  }

  test("ooo gap-fill: a cross-batch late row lands in an hour the naive fold already passed") {
    import graft.streaming.StatefulOps.{LocfEv, LocfOut}
    implicit val sqlCtx = spark.sqlContext
    val H0 = 1699999200000L
    def at(hour: Int, minute: Int) = new Timestamp(H0 + hour * 3600000L + minute * 60000L)
    val h0 = H0 / 3600000L
    val mem = MemoryStream[LocfEv]
    val q = StatefulOps.gapfillLocfOooStream(
        mem.toDS().withWatermark("ts", "3 hours"))
      .writeStream.outputMode("append").format("memory").queryName("locf_ooo").start()
    // batch 1: a's HOUR-1 event arrives FIRST, with z@h3 advancing the
    // watermark to h0:00 — hour 0 is still admissible but already "behind"
    mem.addData(LocfEv("a", at(1, 10), 9.0), LocfEv("z", at(3, 0), 1.0))
    q.processAllAvailable()
    // batch 2: a's hour-0 event arrives LATE (within the 3h slack): the
    // ordered fold would see the hour regress; the OOO op buffers instead
    mem.addData(LocfEv("a", at(0, 30), 5.0))
    q.processAllAvailable()
    // batch 3: watermark to h6 settles and closes both hours
    mem.addData(LocfEv("z", at(9, 0), 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("locf_ooo").as[LocfOut].collect()
      .filter(_.key == "a").sortBy(_.hs)
      .map(o => (o.hs - h0, o.n_events, o.locf_max))
    assert(got.toSeq === Seq((0L, 1L, 5.0), (1L, 1L, 9.0)))
  }

  test("gate form: disordered gap-fill replay ≡ batch spine + LOCF window") {
    val got = graft.operators.Sessionize.gapfillLocfOooStreaming(spark, Sf0001).collect()
    val want = graft.operators.Sessionize.gapfillLocf(spark, Sf0001).collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("property: streaming gap-fill equals a local spine on random sequences and batch splits") {
    import graft.streaming.StatefulOps.{LocfEv, LocfOut}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val H0 = 1699999200000L
    var t = H0
    // strictly increasing timestamps (so any chunking respects the 0s
    // watermark), hour gaps up to 3h, 4 interleaved keys
    val evs = (1 to 300).map { _ =>
      t += 1L + rnd.nextInt(3 * 3600000)
      LocfEv(s"k${rnd.nextInt(4)}", new Timestamp(t), rnd.nextInt(100).toDouble)
    }
    // local reference: per key, the dense hourly spine with LOCF max
    val expect: Set[(String, Long, Long, Double)] = evs.groupBy(_.key).flatMap {
      case (k, es) =>
        val hourly = es.groupBy(e => Math.floorDiv(e.ts.getTime, 3600000L))
          .map { case (h, xs) => h -> ((xs.size.toLong, xs.map(_.value).max)) }
        var locf = 0.0
        (hourly.keys.min to hourly.keys.max).map { h =>
          hourly.get(h) match {
            case Some((n, mx)) => locf = mx; (k, h, n, locf)
            case None          => (k, h, 0L, locf)
          }
        }
    }.toSet
    val mem = MemoryStream[LocfEv]
    val q = StatefulOps.gapfillLocfStream(
        mem.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append").format("memory").queryName("locf_prop").start()
    // random-size time-ordered chunks: hours, gaps, AND timeouts land on
    // arbitrary micro-batch boundaries
    var rest = evs
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(120)
      mem.addData(rest.take(k): _*)
      q.processAllAvailable()
      rest = rest.drop(k)
    }
    // far-future sentinel key flushes every real key's final hour
    mem.addData(LocfEv("zz", new Timestamp(t + 40L * 24 * 3600000L), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("locf_prop").as[LocfOut].collect()
      .filter(_.key != "zz")
      .map(o => (o.key, o.hs, o.n_events, o.locf_max)).toSet
    assert(got === expect)
  }

  test("gate form: streaming gap-fill ≡ batch spine + LOCF window") {
    val got = graft.operators.Sessionize.gapfillLocfStreaming(spark, Sf0001).collect()
    val want = graft.operators.Sessionize.gapfillLocf(spark, Sf0001).collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("gate form: watermark-flushed streaming sessions ≡ batch sessionize") {
    val got = graft.operators.Sessionize.sessionizeStreaming(spark, Sf0001).collect()
    val want = graft.operators.Sessionize.sessionize(spark, Sf0001).collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("out-of-order sessions: a cross-batch late arrival bridges a session the base op split") {
    import graft.operators.Sessionize
    // key 1 in TRUE time order: minutes 0, 8, 16 — every gap 8 min is
    // within the 10-min session gap, so batch semantics say ONE session
    // [0, 16] of 3 events. The minute-8 row is held back to the SECOND
    // micro-batch: it arrives behind a session the first batch already
    // closed ([0,0], the 16-min in-batch gap split it), late but inside
    // the 10-min watermark slack.
    val b0 = Seq(("1", t(0)), ("1", t(16))).toDF("key", "ts")
    val b1 = Seq(("1", t(8))).toDF("key", "ts")
    val sent = Seq((Sessionize.SessSentinelKey,
      new Timestamp(Base + 30L * 24 * 3600 * 1000L))).toDF("key", "ts")
    def run(op: (org.apache.spark.sql.Dataset[SessionEv], Int) =>
                org.apache.spark.sql.Dataset[SessionOut], tag: String) =
      Sessionize.sessReplayOf(spark, Seq(b0, b1, sent),
          s"sess-ooo-fixture-$tag:${System.nanoTime()}", 10, "600 seconds", op)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    val us = (m: Int) => (Base + m * 60000L) * 1000L
    val expected = Seq((1L, 0L, 3L, us(0), us(16)))
    assert(run(StatefulOps.sessionizeOooStream, "new") === expected)
    // the base op's fold-into-the-open-session rule provably mis-sessions
    // this fixture (the late row lands in the [16,16] session instead of
    // bridging [0,0] and [16,16] into one) — the disorder is real, not a
    // vacuous replay the old op also survives
    assert(run(StatefulOps.sessionizeStream, "old") !== expected)
  }

  test("gate form: disordered replay through the OOO op ≡ batch sessionize") {
    val got = graft.operators.Sessionize.sessionizeOooStreaming(spark, Sf0001).collect()
    val want = graft.operators.Sessionize.sessionize(spark, Sf0001).collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming sessions: user_id = -1 cannot collide with the flush sentinel") {
    // a synthetic events table whose only users are -1 and 7; the sentinel
    // key is non-numeric, so user -1's sessions must survive intact
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-sess-neg-").toString
    val hourNs = 3600L * 1000000000L
    // start at t = 2h, not epoch 0: a row whose event time equals the
    // INITIAL watermark (0) is dropped as late by the engine — an artifact
    // of synthetic epoch-0 data, impossible for real timestamps
    val rows = (0 until 8).map { i =>
      (i.toLong, (i.toLong + 1) * hourNs * 2, if (i % 2 == 0) -1L else 7L,
        "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/stage")
    val l = Files.list(java.nio.file.Paths.get(s"$dir/stage"))
    val part = try l.filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow() finally l.close()
    Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = graft.operators.Sessionize.sessionizeStreaming(spark, dir).collect()
    val want = graft.operators.Sessionize.sessionize(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet === Set(-1L, 7L))
    assert(got.toSeq === want.toSeq)
  }
}
