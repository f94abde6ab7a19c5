package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Relational, Sessionize}

/** Unit specs for the relational / time-based / multimodal operators (their
  * value correctness is oracle-gated; these pin structural invariants). */
class OperatorsSpec extends SparkSpec {

  test("sessionize: session bounds nest and sizes sum to the input count") {
    val s = Sessionize.sessionize(spark, Sf0001).cache()
    val total = s.agg(sum(col("n_events"))).head().getLong(0)
    val events = graft.io.Tables.events(spark, Sf0001).count()
    assert(total === events)
    // sessions are disjoint, ordered per user, and have start <= end
    assert(s.filter(col("start_us") > col("end_us")).count() === 0)
    val overlaps = s.alias("a").join(s.alias("b"),
      col("a.user_id") === col("b.user_id") &&
      col("a.session_id") < col("b.session_id") &&
      col("a.end_us") >= col("b.start_us")).count()
    assert(overlaps === 0)
  }

  test("asof: prior signup is never after the event and only for signup-having users") {
    val a = Sessionize.asofPriorSignup(spark, Sf0001)
    val ev = graft.io.Tables.events(spark, Sf0001)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"))
    val joined = a.join(ev, "event_id")
    assert(joined.filter(col("prior_signup_us") > col("ts_us")).count() === 0)
  }

  test("asof tolerance: matches within 7 days agree with q14; stale matches become absent") {
    val TolUs = 7L * 86400L * 1000000L
    val base = Sessionize.asofPriorSignup(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val ev = graft.io.Tables.events(spark, Sf0001)
      .select(col("event_id"), expr("ts_ns div 1000").as("us")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tol = Sessionize.asofPriorSignupTolerance(spark, Sf0001).collect()
    assert(tol.length === base.size)
    var dropped = 0
    for (r <- tol) {
      val id = r.getLong(0)
      base(id) match {
        case Some(p) if ev(id) - p <= TolUs =>
          assert(r.getLong(2) === p, s"event $id keeps the fresh match")
          assert(r.getLong(3) === ev(id) - p, s"event $id staleness")
        case Some(_) =>
          assert(r.isNullAt(2) && r.isNullAt(3), s"event $id: stale match must be absent")
          dropped += 1
        case None =>
          assert(r.isNullAt(2) && r.isNullAt(3))
      }
    }
    assert(dropped > 0, "the fixture must contain matches older than the tolerance")
  }

  test("anti join + semi join partition orders: semi ∪ anti == all orders") {
    val o = graft.io.Tables.orders(spark, Sf0001)
    val li = graft.io.Tables.lineitem(spark, Sf0001).select(col("l_orderkey"))
    val semi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi").count()
    val anti = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti").count()
    assert(semi + anti === o.count())
  }

  test("cube has all four grouping sets; rollup three") {
    val cube = Relational.lineitemCube(spark, Sf0001)
    val both = cube.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNotNull).count()
    val onlyFlag = cube.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNull).count()
    val onlyStat = cube.filter(col("l_returnflag").isNull && col("l_linestatus").isNotNull).count()
    val grand = cube.filter(col("l_returnflag").isNull && col("l_linestatus").isNull).count()
    assert(both > 0 && onlyFlag > 0 && onlyStat > 0 && grand === 1)
  }

  test("multimodal: binary payload survives the pipeline; stages are deterministic") {
    val media = Multimodal.mediaTable(spark, Sf0001)
    assert(media.schema("content").dataType.typeName === "binary")
    val meta = Multimodal.decodeMeta(spark, Sf0001).cache()
    assert(meta.count() === 500)
    assert(meta.filter(col("n_bytes") <= 0).count() === 0)
    // parsed-from-bytes dimensions land in the synthesis ranges per modality
    assert(meta.filter(col("kind") === "image" &&
      (col("width") < 16 || col("width") > 47 ||
       col("height") < 8 || col("height") > 23)).count() === 0)
    assert(meta.filter(col("kind") === "audio" &&
      (col("height") =!= 8000 || col("channels") =!= 1)).count() === 0)
    assert(meta.filter(col("kind") === "video" &&
      (col("width") < 8 || col("width") > 15)).count() === 0)
    val f = Multimodal.extractFeatures(spark, Sf0001)
    val row = f.orderBy(col("media_id")).head()
    assert(row.features.length === 8)
    assert(row.features.forall(v => v >= 0.0 && v < 1.0))
    // determinism across runs
    val again = Multimodal.extractFeatures(spark, Sf0001).orderBy(col("media_id")).head()
    assert(row.features.toSeq === again.features.toSeq)
  }

  test("approx_count_distinct lands within the registered tolerance of exact") {
    val r = graft.io.Tables.lineitem(spark, Sf0001)
      .agg(countDistinct(col("l_partkey")).as("exact"),
           approx_count_distinct(col("l_partkey"), 0.05).as("approx"))
      .head()
    val err = math.abs(r.getLong(1) - r.getLong(0)).toDouble / r.getLong(0)
    assert(err <= 0.15, s"exact=${r.getLong(0)} approx=${r.getLong(1)}")
    // and the registered derived-check query reports every group in bounds
    val ok = Relational.approxDistinctCounts(spark, Sf0001)
      .collect().map(_.getBoolean(2))
    assert(ok.nonEmpty && ok.forall(identity))
  }

  test("tumbling hourly buckets partition the events exactly") {
    val t = Sessionize.tumblingHourly(spark, Sf0001)
    assert(t.agg(sum(col("n_events"))).head().getLong(0) ===
      graft.io.Tables.events(spark, Sf0001).count())
  }

  test("dynamic rules: both versions applied, reload observably changes the flag rule") {
    val r = graft.operators.StatefulQueries.dynamicRulesStreaming(spark, Sf0001).cache()
    val ev = graft.io.Tables.events(spark, Sf0001)
    // both rule versions ran, and together they saw the whole tape once
    assert(r.select("rule_version").distinct().count() === 2L)
    assert(r.agg(sum(col("n_events"))).head().getLong(0) === ev.count())
    // the reload is observable: under v1 the view/purchase threshold
    // DROPPED (50.00 -> 30.00) so their flag RATE must exceed v0's, and
    // the raised types (60.00) must flag at a lower rate than v0's
    val rates = r.collect().map(x => (x.getLong(0), x.getString(1)) ->
      (x.getLong(2).toDouble / x.getLong(3))).toMap
    for (t <- Seq("view", "purchase"))
      assert(rates((1L, t)) > rates((0L, t)), s"lowered threshold must flag more: $t")
    for (t <- Seq("click", "signup", "error"))
      assert(rates((1L, t)) < rates((0L, t)), s"raised threshold must flag less: $t")
    r.unpersist()
  }

  test("skyline: banded running-max frontier equals the all-pairs dominance definition") {
    val sky = Relational.skyline2d(spark, Sf0001)
    val part = graft.io.Tables.part(spark, Sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    // the textbook definition, as a (test-only) non-equi anti join
    val textbook = part.join(part.select(
        col("p_retailprice").as("qr"), col("p_size").as("qs")),
      expr("""qr <= p_retailprice AND qs >= p_size AND
              (qr < p_retailprice OR qs > p_size)""".stripMargin), "left_anti")
    assert(sky.exceptAll(textbook).isEmpty && textbook.exceptAll(sky).isEmpty)
    assert(sky.count() > 0)
  }

  test("column profile: one row per column, stats agree with direct per-column recomputes") {
    val prof = graft.operators.Relational.columnStatsProfile(spark, Sf0001)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(prof.size == 7)
    val li = graft.io.Tables.lineitem(spark, Sf0001).cache()
    val n = li.count()
    // spot-check two numeric columns and the date column exactly
    for (c <- Seq("l_quantity", "l_suppkey")) {
      val row = prof(c)
      assert(row.getAs[Long]("n_rows") == n)
      assert(row.getAs[Long]("n_nulls") == 0L)
      assert(row.getAs[Long]("ndv") == li.select(col(c)).distinct().count())
      val mm = li.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      assert(row.getAs[Double]("min_val") == mm.getDouble(0))
      assert(row.getAs[Double]("max_val") == mm.getDouble(1))
    }
    // the date column profiles as epoch day numbers (integral doubles)
    val sd = prof("l_shipdate")
    assert(sd.getAs[Double]("min_val") == sd.getAs[Double]("min_val").floor)
    assert(sd.getAs[Double]("max_val") > sd.getAs[Double]("min_val"))
    li.unpersist()
  }

  test("incremental profile: journal fold equals the whole-corpus profile; HLL union is lossless") {
    // the exact halves (counts, nulls, extrema) and the tolerance gate of
    // the journal-folded profile must match the single-pass sketch profile
    // row for row — the merged sketches replace a rescan, not the answer
    val inc = graft.operators.Relational.columnStatsIncremental(spark, Sf0001)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val batch = graft.operators.Relational
      .columnStatsProfileSketch(spark, Sf0001)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(inc.keySet === batch.keySet && inc.size == 7)
    for ((c, b) <- batch; i = inc(c)) {
      assert(i.getAs[Long]("n_rows") == b.getAs[Long]("n_rows"), c)
      assert(i.getAs[Long]("n_nulls") == b.getAs[Long]("n_nulls"), c)
      assert(i.getAs[Long]("ndv") == b.getAs[Long]("ndv"), c)
      assert(i.getAs[Double]("min_val") == b.getAs[Double]("min_val"), c)
      assert(i.getAs[Double]("max_val") == b.getAs[Double]("max_val"), c)
      assert(i.getAs[Boolean]("approx_ok"), c)
    }
    // at-least-once defense: simulate a redelivery of increment 0 under a
    // NEW batch id (copy v=0 to v=99) — the residue fold must keep one row
    // per increment, so the profile is unchanged
    val jd = graft.operators.Relational.statsJournalDir(Sf0001).get
    val src = java.nio.file.Paths.get(jd, "v=0")
    val dst = java.nio.file.Paths.get(jd, "v=99")
    java.nio.file.Files.createDirectories(dst)
    java.nio.file.Files.list(src).forEach { f =>
      java.nio.file.Files.copy(f, dst.resolve(f.getFileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    try {
      val redelivered = graft.operators.Relational
        .columnStatsIncremental(spark, Sf0001)
        .collect().map(r => r.getAs[String]("column_name") -> r).toMap
      for ((c, b) <- batch; i = redelivered(c)) {
        assert(i.getAs[Long]("n_rows") == b.getAs[Long]("n_rows"), c)
        assert(i.getAs[Long]("n_nulls") == b.getAs[Long]("n_nulls"), c)
        assert(i.getAs[Boolean]("approx_ok"), c)
      }
    } finally graft.operators.StatefulQueries.deleteRecursively(dst)
    // the property the operator stands on, pinned directly: a same-lgK
    // union of per-part HLL sketches estimates EXACTLY like the
    // single-pass whole-corpus sketch (register-lossless merge)
    val ev = graft.io.Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey").cast("string").as("s"),
              (col("l_orderkey") % 3).as("p"))
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("s"), lit(14))))
      .head().getLong(0)
    val merged = ev.groupBy(col("p"))
      .agg(hll_sketch_agg(col("s"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    assert(merged === whole)
  }
}
