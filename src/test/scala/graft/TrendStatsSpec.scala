package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.{Analytics, Sessionize, StatefulQueries}

/** Pins for the round-16 rank/series/attribution additions: each operator
  * is re-derived here by an INDEPENDENT third implementation (plain Scala
  * over collected control-plane frames — not Spark SQL, not DuckDB), so a
  * bug that both engines happened to share would still fail the suite.
  * Everything runs on the sf0.001 fixture; the collected frames are the
  * bounded (type × day) / node-sized tables, never raw events.
  */
class TrendStatsSpec extends SparkSpec {

  private val DayNs = 86400000000000L

  /** (type, day) -> (y cents, count) recomputed from raw events in Scala. */
  private lazy val daily: Map[(String, Long), (Long, Long)] =
    Tables.events(spark, Sf0001)
      .select(col("event_type"), expr(s"ts_ns div $DayNs").as("day"),
              expr("cast(round(value * 100) as bigint)").as("c"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rs) => k -> (rs.map(_.getLong(2)).sum, rs.length.toLong) }

  private def avgRanks(xs: Seq[Long]): Seq[Double] = {
    val sorted = xs.sorted
    val rank = xs.map { x =>
      val below = sorted.count(_ < x)
      val tied = sorted.count(_ == x)
      below + (tied + 1) / 2.0
    }
    rank
  }

  test("spearman: operator rho equals a plain-Scala average-rank Pearson per type") {
    val got = Analytics.spearmanDaily(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val types = daily.keys.map(_._1).toSeq.distinct
    assert(types.nonEmpty && got.keySet == types.toSet)
    for (t <- types) {
      val rows = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2)
      val ys = rows.map(_._2._1); val ns = rows.map(_._2._2)
      val rx = avgRanks(ys); val ry = avgRanks(ns)
      val n = rx.length
      val mx = rx.sum / n; val my = ry.sum / n
      val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rx.map(a => (a - mx) * (a - mx)).sum
      val vy = ry.map(b => (b - my) * (b - my)).sum
      val expect = cov / (math.sqrt(vx) * math.sqrt(vy))
      assert(got(t)._1 == n.toLong)
      assert(math.abs(got(t)._2 - expect) < 1e-12,
        s"$t: got ${got(t)._2}, brute $expect")
    }
  }

  test("kendall: pair counts partition n(n-1)/2 and tau-b matches the brute pair scan") {
    val got = Analytics.kendallTauDaily(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getDouble(6))).toMap
    for ((t, (nDays, nPairs, c, d, ty, tau)) <- got) {
      assert(nPairs == nDays * (nDays - 1) / 2)
      assert(c + d + ty == nPairs)
      val ys = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2).map(_._2._1)
      var (bc, bd, bt) = (0L, 0L, 0L)
      for (i <- ys.indices; j <- (i + 1) until ys.length) {
        if (ys(j) > ys(i)) bc += 1 else if (ys(j) < ys(i)) bd += 1 else bt += 1
      }
      assert((bc, bd, bt) == ((c, d, ty)))
      val expect = (bc - bd).toDouble / math.sqrt((nPairs * (nPairs - ty)).toDouble)
      assert(math.abs(tau - expect) < 1e-12)
    }
  }

  test("stl: full-window rule, per-(type,dow) seasonal constancy, trend is the 7-day centered mean") {
    val rows = Analytics.stlDecomposeDaily(spark, Sf0001).collect()
    // full-window rule: exactly days-6 rows per type (fixture days are dense)
    val perType = rows.groupBy(_.getString(0))
    for ((t, rs) <- perType) {
      val nDays = daily.keys.count(_._1 == t)
      assert(rs.length == nDays - 6, s"$t: ${rs.length} rows for $nDays days")
    }
    // seasonal is a pure (type, dow) function
    val distinctSeasonal = rows.groupBy(r => (r.getString(0), r.getLong(2)))
      .view.mapValues(_.map(_.getDouble(5)).distinct.size)
    assert(distinctSeasonal.values.forall(_ == 1))
    // trend re-derived in Scala from the raw daily table
    for (r <- rows) {
      val t = r.getString(0); val day = r.getLong(1)
      val s7 = (day - 3 to day + 3).map(d => daily((t, d))._1).sum
      assert(r.getDouble(4) == s7.toDouble / 7.0,
        s"$t day $day: trend ${r.getDouble(4)} vs ${s7 / 7.0}")
      // reconstruction: residual is exactly y - trend - seasonal
      assert(r.getDouble(6) ==
        r.getLong(3).toDouble - r.getDouble(4) - r.getDouble(5))
    }
  }

  test("ushape: every conversion's credits sum to exactly 1e6; totals match the qualifying-purchase count") {
    val ev = Tables.events(spark, Sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
              expr("ts_ns div 1000").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val look = 24L * 3600L * 1000000L
    val views = ev.filter(_._3 == "view")
    val purchases = ev.filter(_._3 == "purchase")
    // brute per-conversion credit assignment
    val perView = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    var qualifying = 0L
    for ((pId, pUser, _, pUs) <- purchases) {
      val ts = views.filter { case (vId, vUser, _, vUs) =>
        vUser == pUser && (vUs < pUs || (vUs == pUs && vId < pId)) &&
          pUs - vUs <= look
      }.sortBy(v => (v._4, v._1))
      val n = ts.length.toLong
      if (n > 0) {
        qualifying += 1
        val credits = ts.zipWithIndex.map { case (v, i) =>
          val rn = i + 1L
          val credit =
            if (n == 1) 1000000L
            else if (n == 2) 500000L
            else if (rn == 1 || rn == n) 400000L
            else 200000L / (n - 2) +
              (if (rn == n - 1) 200000L % (n - 2) else 0L)
          (v._1, credit)
        }
        assert(credits.map(_._2).sum == 1000000L, s"conversion $pId: $n touches")
        for ((vId, c) <- credits) {
          val (k, s) = perView.getOrElse(vId, (0L, 0L))
          perView(vId) = (k + 1, s + c)
        }
      }
    }
    val got = Sessionize.attributionPositionUshape(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == perView.toMap)
    assert(got.values.map(_._2).sum == 1000000L * qualifying)
  }

  test("closeness with a single landmark degenerates to bfs_hops_users' distances") {
    val hops = Analytics.bfsHopsUsers(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val close = Analytics.closenessLandmarksUsers(spark, Sf0001, landmarks = 1)
      .collect()
    assert(close.nonEmpty && close.length == hops.size)
    for (r <- close) {
      val h = hops(r.getLong(0))
      assert(r.getLong(1) == (if (h >= 0) 1L else 0L))
      assert(r.getLong(2) == (if (h >= 1) 1000000L / h else 0L))
    }
  }

  test("assortativity: brute-Scala Pearson of endpoint degrees; |r| <= 1; symmetric moments") {
    val edges = graft.operators.Analytics.userCoEdges(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dir = edges ++ edges.map { case (u, v) => (v, u) }
    val deg = dir.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = dir.map { case (x, _) => deg(x).toDouble }
    val ys = dir.map { case (_, y) => deg(y).toDouble }
    val n = xs.length
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = xs.map(a => (a - mx) * (a - mx)).sum
    val vy = ys.map(b => (b - my) * (b - my)).sum
    val expect = cov / (math.sqrt(vx) * math.sqrt(vy))
    val row = graft.operators.Analytics.graphAssortativityUsers(spark, Sf0001)
      .collect().head
    assert(row.getLong(0) == deg.size && row.getLong(1) == edges.length)
    val r = row.getDouble(2)
    assert(math.abs(r) <= 1.0 && math.abs(r - expect) < 1e-9)
  }

  test("streaks: islands re-derived brute; lens partition active days") {
    // mirror the operator's NULL-user filter so a future NULL fixture row
    // fails in the operator (visibly), not via getLong silently reading 0
    val ad = Tables.events(spark, Sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr(s"ts_ns div $DayNs").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    def streaks(days: List[Long]): List[Long] =
      days.foldLeft(List.empty[(Long, Long)]) {
        case ((last, len) :: rest, d) if d == last + 1 => (d, len + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }.map(_._2)
    val got = graft.operators.Analytics.userActivityStreaks(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == ad.keySet)
    for ((u, days) <- ad) {
      val ss = streaks(days)
      assert(got(u) == ((days.length.toLong, ss.length.toLong, ss.max)))
    }
  }

  test("weighted median: at least half the quantity sits at or below; strictly less below it") {
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("pc"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = graft.operators.Relational.weightedMedianLineitem(spark, Sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == li.keySet)
    for ((f, rows) <- li) {
      val (tw, med) = got(f)
      assert(tw == rows.map(_._3).sum)
      val atOrBelow = rows.filter(_._2 <= med).map(_._3).sum
      val strictlyBelow = rows.filter(_._2 < med).map(_._3).sum
      assert(2 * atOrBelow >= tw, s"$f: median rule violated at $med")
      assert(2 * strictlyBelow < tw, s"$f: a smaller price already qualifies")
    }
  }

  test("donchian: prior-window bands re-derived brute on one type; breakout implies outside band") {
    val rows = graft.operators.Indicators.donchianByType(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      if (r.getLong(6) == 1L) assert(r.getLong(2) > r.getLong(4) && r.getLong(3) == 20L)
      if (r.getLong(7) == 1L) assert(r.getLong(2) < r.getLong(5) && r.getLong(3) == 20L)
    }
    // brute sliding window on the densest type
    val t = rows.groupBy(_.getString(1)).maxBy(_._2.length)._1
    val seq = rows.filter(_.getString(1) == t).sortBy(_.getLong(0))
    val vcs = seq.map(_.getLong(2))
    for (i <- seq.indices) {
      val prior = vcs.slice(math.max(0, i - 20), i)
      assert(seq(i).getLong(3) == prior.length.toLong)
      if (prior.nonEmpty) {
        assert(seq(i).getLong(4) == prior.max && seq(i).getLong(5) == prior.min)
      } else assert(seq(i).isNullAt(4) && seq(i).isNullAt(5))
    }
    // non-vacuous: at least one breakout fires on the fixture
    assert(rows.exists(r => r.getLong(6) == 1L || r.getLong(7) == 1L))
  }

  test("kaplan-meier: survival is a monotone nonincreasing product in (0,1]; matches brute; consistent with nelson-aalen's table") {
    val km = graft.operators.StatefulQueries.kaplanMeierSurvival(spark, Sf0001)
      .collect()
    val na = graft.operators.Analytics.survivalNelsonAalen(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(km.nonEmpty && km.map(_.getLong(0)).toSet == na.keySet)
    var s = 1.0
    var prev = Double.MaxValue
    for (r <- km.sortBy(_.getLong(0))) {
      // the same (n_risk, d) as the hazard form — one shared life table
      assert((r.getLong(1), r.getLong(2)) == na(r.getLong(0)))
      s = s * (1.0 - r.getLong(2).toDouble / r.getLong(1).toDouble)
      assert(r.getDouble(4) == s, s"t=${r.getLong(0)}")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= prev)
      prev = r.getDouble(4)
    }
  }

  test("donchian streaming ring: equals the batch window form on the corpus; ring crosses the batch boundary") {
    val ba = graft.operators.Indicators.donchianByType(spark, Sf0001)
    val st = graft.operators.StatefulQueries.donchianByTypeStreaming(spark, Sf0001)
    assert(ba.exceptAll(st).isEmpty && st.exceptAll(ba).isEmpty)
    // handcrafted tape: 20 warmup values end batch 1, the breakout opens
    // batch 2 — only the carried ring can see the full prior window
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.KV
    implicit val sqlCtx = spark.sqlContext
    implicit val kvEnc = org.apache.spark.sql.Encoders.product[KV]
    val mem = MemoryStream[KV]
    val q = StatefulOps.donchianStream(mem.toDS(), n = 20)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("donch_ring").start()
    try {
      mem.addData((1 to 20).map(i => KV("k", i.toLong, (100 + i).toDouble)))
      q.processAllAvailable()
      val warm = spark.table("donch_ring").collect()
      assert(warm.forall(_.getLong(6) == 0L), "no breakout during warmup")
      mem.addData(Seq(KV("k", 21L, 999.0)))
      q.processAllAvailable()
      val last = spark.table("donch_ring").collect().find(_.getLong(1) == 21L).get
      assert(last.getLong(3) == 20L, "prior ring is full across the boundary")
      assert(last.getLong(4) == 120L && last.getLong(5) == 101L,
        "band is the carried batch-1 ring")
      assert(last.getLong(6) == 1L, "breakout fires off state, not batch-local rows")
    } finally q.stop()
  }

  test("hll intersection: exact inclusion-exclusion equals the brute set intersection; gate holds") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("user_id")).collect()
      .filter(!_.isNullAt(1)).map(r => (r.getString(0), r.getLong(1)))
    val viewers = ev.filter(_._1 == "view").map(_._2).toSet
    val purchasers = ev.filter(_._1 == "purchase").map(_._2).toSet
    val row = graft.operators.Relational.hllIntersectionUsers(spark, Sf0001)
      .collect().head
    assert(row.getLong(0) == viewers.size && row.getLong(1) == purchasers.size)
    assert(row.getLong(2) == (viewers ++ purchasers).size)
    assert(row.getLong(3) == (viewers intersect purchasers).size,
      "inclusion-exclusion is exact on the exact side")
    assert(row.getBoolean(4), "HLL gate holds at fixture scale")
  }

  test("entity resolution: clusters are transitively closed over dist<=1 name pairs; sizes partition the part table") {
    val parts = Tables.table(spark, Sf0001, "part")
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = graft.operators.Analytics.entityResolutionParts(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == parts.length)
    val entOf = got.map(g => g._2 -> g._3).toMap // name -> entity
    // same name -> same entity (exact collapse)
    assert(got.groupBy(_._2).values.forall(_.map(_._3).distinct.length == 1))
    // dist<=1 names share an entity (match edges honored)
    def lev1(a: String, b: String): Boolean = {
      if (a == b) true
      else if (math.abs(a.length - b.length) > 1) false
      else if (a.length == b.length) a.zip(b).count { case (x, y) => x != y } <= 1
      else {
        val (s, l) = if (a.length < b.length) (a, b) else (b, a)
        (0 to s.length).exists(i => l.substring(0, i) == s.substring(0, i) &&
          l.substring(i + 1) == s.substring(i))
      }
    }
    val names = parts.map(_._2).distinct
    for (i <- names.indices; j <- (i + 1) until names.length
         if lev1(names(i), names(j))) {
      assert(entOf(names(i)) == entOf(names(j)),
        s"'${names(i)}' and '${names(j)}' must share an entity")
    }
    // entity_size partitions the table
    val sizes = got.groupBy(_._3).view.mapValues(_.length.toLong)
    assert(got.forall(g => g._4 == sizes(g._3)))
  }

  test("seasonal naive: n_pairs = days-7 per type; exact MAE re-derives brute") {
    val got = graft.operators.Analytics
      .forecastBacktestSeasonalNaive(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((t, (n, sumAe)) <- got) {
      val ys = daily.filter(_._1._1 == t).toSeq.sortBy(_._1._2).map(_._2._1)
      assert(n == ys.length - 7)
      val brute = ys.indices.drop(7).map(i => math.abs(ys(i) - ys(i - 7))).sum
      assert(sumAe == brute)
    }
  }

  test("time-decay attribution: per-conversion credits sum to exactly 1e6; recency weight halves per bucket") {
    val ev = Tables.events(spark, Sf0001)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
              expr("ts_ns div 1000").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val look = 24L * 3600L * 1000000L
    val half = 6L * 3600L * 1000000L
    val views = ev.filter(_._3 == "view")
    val perView = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((pId, pUser, _, pUs) <- ev.filter(_._3 == "purchase")) {
      val ts = views.filter { case (vId, vUser, _, vUs) =>
        vUser == pUser && (vUs < pUs || (vUs == pUs && vId < pId)) &&
          pUs - vUs <= look
      }.sortBy(v => (-v._4, -v._1)) // most recent first
      if (ts.nonEmpty) {
        val ws = ts.map(v => 1L << (3 - math.min((pUs - v._4) / half, 3L)).toInt)
        val sw = ws.sum
        val base = ws.map(w => 1000000L * w / sw)
        val credits = base.updated(0, base.head + (1000000L - base.sum))
        assert(credits.sum == 1000000L)
        // weights are nonincreasing from most recent to oldest
        assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
        for ((v, c) <- ts.zip(credits)) {
          val (k, s) = perView.getOrElse(v._1, (0L, 0L))
          perView(v._1) = (k + 1, s + c)
        }
      }
    }
    val got = Sessionize.attributionTimeDecay(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == perView.toMap)
  }

  test("clustering coefficient: consistent with the registered triangle and wedge counts; C in [0,1]") {
    val row = Analytics.clusteringCoefficientUsers(spark, Sf0001).collect().head
    val tri = Analytics.triangleCountUsers(spark, Sf0001).collect().head
    val wedge = Analytics.wedgeStatsUsers(spark, Sf0001).collect().head
    assert(row.getLong(1) == tri.getLong(1) && row.getLong(2) == tri.getLong(0))
    assert(row.getLong(0) == wedge.getLong(0) && row.getLong(3) == wedge.getLong(2))
    val c = row.getDouble(4)
    assert(c == 3.0 * row.getLong(2) / row.getLong(3))
    assert(c >= 0.0 && c <= 1.0)
  }

  test("cumulative users: monotone, gapless over event days, totals the distinct user count") {
    val rows = Analytics.cumulativeUsersDaily(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = Tables.events(spark, Sf0001)
      .filter(col("user_id").isNotNull).select(col("user_id")).distinct().count()
    assert(rows.last._3 == users)
    assert(rows.map(_._2).sum == users)
    assert(rows.zip(rows.tail).forall { case (a, b) => b._3 >= a._3 })
    // gapless: one row per distinct event day
    val days = Tables.events(spark, Sf0001)
      .filter(col("user_id").isNotNull)
      .select(expr(s"ts_ns div $DayNs")).distinct().count()
    assert(rows.length == days)
  }

  test("rolling correlation: full-window rule; |r| <= 1; brute re-derivation on the day table") {
    val got = Analytics.rollingCorrPair(spark, Sf0001).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    // the FULL pre-filter day series (output drops warmup rows, so the
    // brute windows must come from the raw daily table, not the output)
    val dayset = daily.keys.collect {
      case (t, d) if t == "view" || t == "click" => d
    }.toSeq.distinct.sorted
    val series = dayset.map(d =>
      (d, daily.getOrElse(("view", d), (0L, 0L))._1,
          daily.getOrElse(("click", d), (0L, 0L))._1))
    assert(got.keySet == dayset.drop(6).toSet, "full-window rule")
    for (i <- series.indices if i >= 6) {
      val win = series.slice(i - 6, i + 1)
      val xs = win.map(_._2.toDouble); val ys = win.map(_._3.toDouble)
      val mx = xs.sum / 7; val my = ys.sum / 7
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = xs.map(a => (a - mx) * (a - mx)).sum
      val vy = ys.map(b => (b - my) * (b - my)).sum
      got(series(i)._1) match {
        case Some(r) =>
          assert(math.abs(r) <= 1.0 + 1e-12)
          assert(math.abs(r - cov / (math.sqrt(vx) * math.sqrt(vy))) < 1e-9)
        case None => assert(vx == 0.0 || vy == 0.0)
      }
    }
  }

  test("right-outer stream join: pair counts anchor-invariant vs left outer; heads only where padding fired") {
    val ro = StatefulQueries.intervalJoinStreamingRightOuter(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lo = StatefulQueries.intervalJoinStreamingOuter(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the per-user PAIR count is the same whichever side anchors the
    // outer join (pairs are (a,b) with one shared user)
    assert(ro.keySet == lo.keySet)
    for ((u, (preds, heads)) <- ro) {
      assert(preds == lo(u), s"user $u: pair count must be anchor-invariant")
      assert(heads >= 1L, s"user $u: every user's first in-gap run has a head")
    }
  }

  test("dau closed streaming: equals the batch per-day distinct count") {
    val batch = Tables.events(spark, Sf0001)
      .filter(col("user_id").isNotNull)
      .select(expr(s"ts_ns div $DayNs").as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = StatefulQueries.dauDailyClosedStreaming(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch)
  }

  test("asof nearest: agrees with backward asof when prior is closer; dist is the true minimum") {
    val prior = Sessionize.asofPriorSignup(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    // brute signup timeline per user
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
              expr("ts_ns div 1000").as("us"), col("ts_ns"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val sigs = ev.filter(_._3 == "signup")
      .groupBy(_._2).view.mapValues(_.map(s => (s._5, s._1, s._4)).sorted).toMap
    val got = Sessionize.asofNearestSignup(spark, Sf0001).collect()
    assert(got.nonEmpty && got.exists(r => !r.isNullAt(4) && r.getString(4) == "next"))
    for (r <- got) {
      val (id, u) = (r.getLong(0), r.getLong(1))
      val row = ev.find(_._1 == id).get
      val us = row._4
      sigs.get(u) match {
        case None => assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        case Some(ss) =>
          val before = ss.filter(s => (s._1, s._2) != ((row._5, id)) &&
            (s._1 < row._5 || (s._1 == row._5 && s._2 < id)))
            .map(_._3).lastOption
          val pr = if (row._3 == "signup") Some(us) else before
          val nx = ss.filter(s => s._1 > row._5 || (s._1 == row._5 && s._2 > id))
            .map(_._3).headOption
          val expect = (pr, nx) match {
            case (None, None) => None
            case (Some(p), None) => Some((p, us - p, "prior"))
            case (None, Some(n)) => Some((n, n - us, "next"))
            case (Some(p), Some(n)) =>
              if (us - p <= n - us) Some((p, us - p, "prior"))
              else Some((n, n - us, "next"))
          }
          expect match {
            case None => assert(r.isNullAt(2))
            case Some((t, dd, dir)) =>
              assert(r.getLong(2) == t && r.getLong(3) == dd &&
                r.getString(4) == dir, s"event $id")
          }
          // nearest never beaten by the backward match
          prior(id).foreach(p => assert(r.getLong(3) <= us - p))
      }
    }
  }

  test("scd2 compaction: islands tile each user's span, adjacent tiers differ, merges sum to the version count") {
    val raw = graft.operators.Relational.scd2UserValues(spark, Sf0001)
      .select(col("user_id"), col("valid_from_us"),
              expr("cast(round(value * 100) as bigint) div 10000").as("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = graft.operators.Relational.scd2CompactTiers(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
      .groupBy(_._1)
    assert(got.keySet == raw.keySet)
    var merged = 0L
    for ((u, rows0) <- got) {
      val rows = rows0.sortBy(_._3)
      // tiling: each valid_to equals the next valid_from; last is open
      for (Array(a, b) <- rows.sliding(2).map(_.toArray))
        assert(a._4.contains(b._3) && a._2 != b._2,
          s"user $u: islands must tile and adjacent tiers must differ")
      assert(rows.last._4.isEmpty)
      // first interval starts at the user's first version
      assert(rows.head._3 == raw(u).map(_._2).min)
      assert(rows.map(_._5).sum == raw(u).size.toLong)
      merged += rows.map(_._5).sum - rows.length
    }
    assert(merged > 0, "the tier compaction must actually merge on the fixture")
  }

  test("backtest: n_pairs is rows-1 per type and MAE re-derives from the holt fold") {
    val perTypeRows = Tables.events(spark, Sf0001)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val holt = StatefulQueries.holtByType(spark, Sf0001)
      .select(col("event_id"), col("event_type"), col("forecast")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val vals = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val brute = holt.groupBy(_._2).map { case (t, rs) =>
      val ordered = rs.sortBy(_._1)
      val errs = ordered.sliding(2).collect { case Array(prev, cur) =>
        math.floor(math.abs(vals(cur._1) - prev._3) * 1000000.0).toLong
      }.toSeq
      t -> (errs.length.toLong, errs.sum)
    }
    val got = StatefulQueries.forecastBacktestHolt(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == brute.keySet)
    for ((t, (n, sum)) <- brute) {
      assert(got(t)._1 == n && n == perTypeRows(t) - 1)
      assert(got(t)._2 == sum)
    }
  }
}
