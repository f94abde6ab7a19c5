package graft

import org.apache.spark.sql.functions._
import graft.operators.{Indicators, StatefulQueries}
import graft.streaming.StatefulOps

/** Invariant + cross-form tests for the technical-indicator family: OHLC
  * bars, VWAP, Bollinger bands, stochastic %K (declarative windows) and
  * RSI / MACD (sequential folds with streaming twins). */
class IndicatorsSpec extends SparkSpec {

  test("ohlc: extrema bracket open/close, bars partition the tape") {
    val o = Indicators.ohlcHourly(spark, Sf0001).cache()
    assert(o.filter(col("high") < col("open") || col("high") < col("close") ||
                    col("low") > col("open") || col("low") > col("close")).count() == 0)
    assert(o.filter(col("high") < col("low")).count() == 0)
    // bars cover every tick exactly once
    assert(o.agg(sum(col("n_events"))).head().getLong(0) ==
           graft.io.Tables.events(spark, Sf0001).count())
    // single-tick bars are degenerate: open = high = low = close
    assert(o.filter(col("n_events") === 1 &&
                    (col("open") =!= col("close") || col("high") =!= col("low")))
            .count() == 0)
    o.unpersist()
  }

  test("ohlc streaming: bars accumulated across micro-batches equal the batch bars") {
    val b = Indicators.ohlcHourly(spark, Sf0001)
    val s = Indicators.ohlcHourlyStream(spark, Sf0001)
    assert(b.exceptAll(s).count() == 0 && s.exceptAll(b).count() == 0)
  }

  test("ohlc closed: append mode equals batch bars, evicts emitted bars, drops late ticks") {
    // registered form: the sentinel flush closes every real bar, so the
    // closed-bar table equals the batch bar table (eviction witness is
    // asserted inside the drain)
    val b = Indicators.ohlcHourly(spark, Sf0001)
    val c = Indicators.ohlcHourlyClosed(spark, Sf0001)
    assert(b.exceptAll(c).count() == 0 && c.exceptAll(b).count() == 0)

    // cross-batch late-tick fixture. Engine semantics (probed): a late
    // tick for a bar STILL IN STATE is merged (the bar has not emitted
    // yet), so the drop requires the bar to be closed AND evicted first:
    // f0 opens hours 10/12, f1's hour-14 tick processes under the
    // f0-derived watermark (12h) and closes hour 10, f2's hour-10 tick
    // then targets an evicted bar — the engine must DROP it (a closed
    // candle is immutable), observably in numRowsDroppedByWatermark
    def frame(rows: Seq[(Long, Long, String, Double)]) =
      graft.operators.Indicators.tickFrame(spark, rows)
    val H = 3600L * 1000000L
    val f0 = frame(Seq((0L, 10L * H + 1L, "a", 5.0), (1L, 10L * H + 2L, "a", 9.0),
                       (2L, 12L * H + 1L, "a", 7.0)))
    val f1 = frame(Seq((3L, 14L * H + 1L, "a", 6.0)))
    val late = frame(Seq((4L, 10L * H + 3L, "a", 100.0)))
    val sent = frame(Seq((-1L, 45L * H,
                          graft.operators.Indicators.OhlcSentinelType, 0.0)))
    val (bars, dropped) = graft.operators.Indicators.closedBarReplayOf(
      spark, Seq(f0, f1, late, sent), "ohlcclosed-spec-late")
    assert(dropped == 1, s"expected the 1 late tick dropped, saw $dropped")
    val got = bars.orderBy(col("hour_start")).collect()
    assert(got.length == 3)
    // hour 10's bar closed before the late tick arrived: the 100.0 is out
    val h10 = got(0)
    assert(h10.getAs[Long]("hour_start") == 10L * 3600L)
    assert(h10.getAs[Long]("n_events") == 2L)
    assert(h10.getAs[Double]("open") == 5.0 && h10.getAs[Double]("close") == 9.0)
    assert(h10.getAs[Double]("high") == 9.0 && h10.getAs[Double]("low") == 5.0)
    assert(got(1).getAs[Long]("hour_start") == 12L * 3600L)
    assert(got(1).getAs[Long]("n_events") == 1L)
    assert(got(2).getAs[Long]("hour_start") == 14L * 3600L)
    assert(got(2).getAs[Long]("n_events") == 1L)
  }

  test("late side output: engine-watermark routing partitions the tape into bars XOR side") {
    // the sideOutputLateData contract: every input tick lands in exactly
    // one place — merged into some emitted bar, or emitted on the side
    // stream — decided by the ENGINE's watermark, under the aggregate's
    // two-watermark drop rule (a row drops iff its bar was evicted in a
    // PRIOR batch). The fixture carries both late classes: id4 arrives a
    // batch AFTER the f1-batch watermark (12.5h, from f0's max) evicted
    // its hour-10 bar → side output; id5 arrives in the SAME batch but its
    // hour-12 bar (end 13h > 12.5h) is still in state → it must MERGE, not
    // side-emit, exactly like the aggregate (this distinction is what
    // killed the first, current-watermark cut of the tagger)
    def frame(rows: Seq[(Long, Long, String, Double)]) =
      graft.operators.Indicators.tickFrame(spark, rows)
    val H = 3600L * 1000000L
    val f0 = frame(Seq((0L, 10L * H + 1L, "a", 5.0), (1L, 10L * H + 2L, "a", 9.0),
                       (2L, 12L * H + 1800L * 1000000L, "a", 7.0)))
    val f1 = frame(Seq((3L, 14L * H + 1L, "a", 8.0)))
    val f2 = frame(Seq((4L, 10L * H + 3L, "a", 100.0),
                       (5L, 12L * H + 2400L * 1000000L, "a", 6.0)))
    // the sentinel rides the SAME type so the tagger key observes every
    // batch; its far-future bar never closes, so it never reaches output
    val sent = frame(Seq((-1L, 45L * H, "a", 0.0)))
    val (bars, side) = graft.operators.Indicators.lateSideOutputReplayOf(
      spark, Seq(f0, f1, f2, sent), "ohlc-sideoutput-spec")
    val s = side.collect()
    assert(s.length == 1, s"side output must hold exactly the evicted-bar tick, got ${s.length}")
    assert(s(0).getAs[Long]("event_id") == 4L)
    assert(s(0).getAs[Long]("hour_start") == 10L * 3600L)
    assert(s(0).getAs[Double]("value") == 100.0)
    val got = bars.orderBy(col("hour_start")).collect()
    assert(got.length == 3)
    // partition: 6 real ticks = 5 aggregated + 1 side-emitted
    assert(got.map(_.getAs[Long]("n_events")).sum + s.length == 6)
    val h10 = got(0)
    assert(h10.getAs[Long]("n_events") == 2L && h10.getAs[Double]("high") == 9.0)
    // the merged-late tick: id5 is INSIDE the hour-12 bar (close = 6.0 by
    // max event_id) and absent from the side output
    val h12 = got(1)
    assert(h12.getAs[Long]("hour_start") == 12L * 3600L)
    assert(h12.getAs[Long]("n_events") == 2L)
    assert(h12.getAs[Double]("open") == 7.0 && h12.getAs[Double]("close") == 6.0)
    assert(got(2).getAs[Long]("n_events") == 1L)
  }

  test("vwap: lies within the bar's price range (cents tolerance) and weights are positive") {
    val v = Indicators.vwapHourly(spark, Sf0001)
    val o = Indicators.ohlcHourly(spark, Sf0001)
      .select(col("hour_start"), col("event_type"), col("low"), col("high"))
    val j = v.join(o, Seq("hour_start", "event_type")).cache()
    assert(j.count() == v.count())
    // decimal(18,2) price rounding can move each tick by at most half a cent
    assert(j.filter(col("vwap") < col("low") - 0.005 ||
                    col("vwap") > col("high") + 0.005).count() == 0)
    // volumes are in [1, 97], so n <= sum_vol <= 97n
    assert(j.filter(col("sum_vol") < col("n_events") ||
                    col("sum_vol") > col("n_events") * 97).count() == 0)
    j.unpersist()
  }

  test("bollinger: bands bracket the mean, sd >= 0, warm-up frames count correctly") {
    val b = Indicators.bollingerByType(spark, Sf0001).cache()
    assert(b.count() == graft.io.Tables.events(spark, Sf0001).count())
    assert(b.filter(col("sd") < 0).count() == 0)
    assert(b.filter(col("upper") < col("mean") || col("lower") > col("mean")).count() == 0)
    assert(b.filter(col("n_win") < 1 || col("n_win") > 20).count() == 0)
    // a single-row frame has zero variance, so both bands collapse to the mean
    assert(b.filter(col("n_win") === 1 &&
                    (col("sd") =!= 0.0 || col("upper") =!= col("mean"))).count() == 0)
    b.unpersist()
  }

  test("stochastic %K: bounded in [0, 100] and the frame extrema are ordered") {
    val s = Indicators.stochOscByType(spark, Sf0001).cache()
    assert(s.filter(col("pct_k") < 0 || col("pct_k") > 100).count() == 0)
    assert(s.filter(col("high_n") < col("low_n")).count() == 0)
    s.unpersist()
  }

  test("realized variance: non-negative, delta counts partition the tape minus one per (type, day)") {
    val rv = Indicators.realizedVarianceDaily(spark, Sf0001).cache()
    assert(rv.filter(col("rv_num") < 0).count() == 0)
    // rv = 0 exactly when no two consecutive ticks differ
    assert(rv.filter(col("n_deltas") === 0 && col("rv_num") =!= 0).count() == 0)
    // every tick contributes one delta except each (type, day)'s first
    val nEvents = graft.io.Tables.events(spark, Sf0001).count()
    val nGroups = rv.count()
    assert(rv.agg(sum(col("n_deltas"))).head().getLong(0) == nEvents - nGroups)
    rv.unpersist()
  }

  test("atr: TR dominates the bar range, seed bar collapses to high-low, frames count correctly") {
    val a = Indicators.atrHourlyByType(spark, Sf0001).cache()
    val bars = Indicators.ohlcHourly(spark, Sf0001)
    assert(a.count() == bars.count())
    assert(a.filter(col("tr_cents") < 0 || col("atr") < 0).count() == 0)
    assert(a.filter(col("n_win") < 1 || col("n_win") > 14).count() == 0)
    // TR = max(range, |high-pc|, |low-pc|) >= the bar's own range
    val j = a.join(bars.select(col("hour_start"), col("event_type"),
        (round(col("high") * 100.0).cast("long") -
         round(col("low") * 100.0).cast("long")).as("range_c")),
      Seq("hour_start", "event_type"))
    assert(j.count() == a.count())
    assert(j.filter(col("tr_cents") < col("range_c")).count() == 0)
    // each type's first bar seeds TR = high - low (no previous close)
    assert(j.filter(col("n_win") === 1 &&
                    col("tr_cents") =!= col("range_c")).count() == 0)
    // a single-bar frame's ATR is exactly its own TR/100
    assert(a.filter(col("n_win") === 1 &&
      col("atr") =!= col("tr_cents").cast("double") / 100.0).count() == 0)
    a.unpersist()
  }

  test("obv: all-integer ledger — every step moves by exactly sgn*vol") {
    import org.apache.spark.sql.expressions.Window
    val o = Indicators.obvByType(spark, Sf0001).cache()
    assert(o.count() == graft.io.Tables.events(spark, Sf0001).count())
    assert(o.filter(!col("sgn").isin(-1L, 0L, 1L)).count() == 0)
    assert(o.filter(col("vol") < 1 || col("vol") > 97).count() == 0)
    // the cumulative ledger: obv - prev_obv == sgn * vol, seed row == its own step
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    val stepped = o.withColumn("prev_obv", lag(col("obv"), 1).over(w))
    assert(stepped.filter(
      coalesce(col("prev_obv"), lit(0L)) + col("sgn") * col("vol") =!= col("obv"))
      .count() == 0)
    // each type's first tick has no prior price: sgn = 0, obv = 0
    assert(stepped.filter(col("prev_obv").isNull &&
      (col("sgn") =!= 0L || col("obv") =!= 0L)).count() == 0)
    // the streaming twin's ledger crosses the micro-batch boundary and
    // lands on the identical rows
    val s = StatefulQueries.obvByTypeStreaming(spark, Sf0001)
    assert(o.exceptAll(s).count() == 0 && s.exceptAll(o).count() == 0)
    o.unpersist()
  }

  test("sma cross: signals equal a driver-side integer re-derivation, both directions fire") {
    val got = Indicators.smaCrossSignals(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // independent recomputation: collect the bars (hours x types at this
    // SF) and walk each type's close series with explicit sliding sums
    val bars = Indicators.ohlcHourly(spark, Sf0001)
      .select(col("event_type"), col("hour_start"),
              expr("cast(round(close * 100) as bigint)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = bars.groupBy(_._1).flatMap { case (typ, rows) =>
      val s = rows.sortBy(_._2)
      val cs = s.map(_._3)
      // d_i defined where the 16-bar frame fills (i >= 15)
      def d(i: Int): Long =
        cs.slice(i - 3, i + 1).sum * 16 - cs.slice(i - 15, i + 1).sum * 4
      (16 until s.length).collect {
        case i if d(i) > 0 && d(i - 1) <= 0 => (typ, s(i)._2, "golden")
        case i if d(i) < 0 && d(i - 1) >= 0 => (typ, s(i)._2, "death")
      }
    }.toSet
    assert(got === expect)
    assert(got.exists(_._3 == "golden") && got.exists(_._3 == "death"),
      "probed at sf0.001: 90 golden / 90 death — both directions must fire")
  }

  test("rsi: bounded, batch fold equals streaming twin, fold equals direct recurrence") {
    val b = StatefulQueries.rsiByType(spark, Sf0001).cache()
    // one row per event except each key's first
    val ev = graft.io.Tables.events(spark, Sf0001)
    val nKeys = ev.select(col("event_type")).distinct().count()
    assert(b.count() == ev.count() - nKeys)
    assert(b.filter(col("rsi") < 0 || col("rsi") > 100).count() == 0)
    assert(b.filter(col("avg_gain") < 0 || col("avg_loss") < 0).count() == 0)
    val s = StatefulQueries.rsiByTypeStreaming(spark, Sf0001)
    assert(b.exceptAll(s).count() == 0 && s.exceptAll(b).count() == 0)
    b.unpersist()
    // fold vs the recurrence computed directly
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 10).foreach { _ =>
      val n = 2 + rnd.nextInt(50)
      val vals = Seq.fill(n)(rnd.nextDouble() * 500)
      var ag = 0.0; var al = 0.0; var seeded = false
      val expect = vals.zip(vals.tail).zipWithIndex.map { case ((p, v), i) =>
        val d = v - p
        val g = if (d > 0) d else 0.0
        val l = if (d < 0) -d else 0.0
        if (!seeded) { ag = g; al = l; seeded = true }
        else { ag = 0.9375 * ag + 0.0625 * g; al = 0.9375 * al + 0.0625 * l }
        val rsi = if (ag + al == 0) 50.0
                  else math.min(100.0, (100.0 * ag) / (ag + al))
        ((i + 1).toLong, ag, al, rsi)
      }
      val ds = vals.zipWithIndex.map { case (v, i) => StatefulOps.KV("k", i.toLong, v) }.toDS()
      val got = StatefulOps.rsiStream(ds)
        .collect().sortBy(_.ord).map(o => (o.ord, o.avg_gain, o.avg_loss, o.rsi)).toSeq
      assert(got == expect)
    }
    // a flat tape never moves: RSI pinned at 50 throughout
    val flat = (0 until 20).map(i => StatefulOps.KV("f", i.toLong, 42.0)).toDS()
    assert(StatefulOps.rsiStream(flat).collect().forall(o =>
      o.rsi == 50.0 && o.avg_gain == 0.0 && o.avg_loss == 0.0))
  }

  test("macd: seed row is zero, histogram closes, batch equals streaming, fold equals recurrence") {
    val b = StatefulQueries.macdByType(spark, Sf0001).cache()
    assert(b.count() == graft.io.Tables.events(spark, Sf0001).count())
    // histogram = macd - signal_line exactly (one shared subtraction)
    assert(b.filter(col("histogram") =!= col("macd") - col("signal_line")).count() == 0)
    val s = StatefulQueries.macdByTypeStreaming(spark, Sf0001)
    assert(b.exceptAll(s).count() == 0 && s.exceptAll(b).count() == 0)
    b.unpersist()
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    (1 to 10).foreach { _ =>
      val n = 1 + rnd.nextInt(50)
      val vals = Seq.fill(n)(rnd.nextDouble() * 500)
      var f = 0.0; var sl = 0.0; var sg = 0.0; var first = true
      val expect = vals.zipWithIndex.map { case (v, i) =>
        if (first) { f = v; sl = v; sg = 0.0; first = false }
        else {
          f = 0.75 * f + 0.25 * v
          sl = 0.9375 * sl + 0.0625 * v
          sg = 0.875 * sg + 0.125 * (f - sl)
        }
        (i.toLong, f - sl, sg, (f - sl) - sg)
      }
      val ds = vals.zipWithIndex.map { case (v, i) => StatefulOps.KV("k", i.toLong, v) }.toDS()
      val got = StatefulOps.macdStream(ds)
        .collect().sortBy(_.ord).map(o => (o.ord, o.macd, o.signal_line, o.histogram)).toSeq
      assert(got == expect)
      // the first emitted row is exactly zero across the board
      assert(got.head == (0L, 0.0, 0.0, 0.0))
    }
  }
}
