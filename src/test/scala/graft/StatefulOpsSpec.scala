package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.io.StockCsv
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps._

/** The streaming keyed-state forms must equal the batch window forms on the
  * reference dataset — per-record, not just final state (the keyed-state
  * parity payoff, SURVEY.md §7.3 slice 3). Streaming runs replay HDFC in
  * several time-ordered micro-batches so state genuinely crosses batches. */
class StatefulOpsSpec extends SparkSpec {

  import spark.implicits._

  /** HDFC as (key=year, ord=row index in date order, value=close). */
  private lazy val hdfcKv: Seq[KV] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("Date"))
    StockCsv.read(spark, HdfcCsv)
      .withColumn("ord", row_number().over(w).cast("long"))
      .select(year(col("Date")).cast("string").as("key"), col("ord"), col("Close").as("value"))
      .as[KV].collect().toSeq
  }

  test("batch-mode runningMax equals window-form running max per record") {
    val ds = spark.createDataset(hdfcKv)
    val got = StatefulOps.runningMax(ds).collect().map(o => (o.key, o.ord) -> o.out).toMap
    // window form
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = ds.toDF().withColumn("out", max(col("value")).over(w))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.size === 5204)
    assert(got === exp)
  }

  test("streaming runningMax across micro-batches equals batch form") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KV]
    val q = StatefulOps.runningMax(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("rm_out").start()
    // 4 time-ordered chunks → state must carry across micro-batches
    hdfcKv.sortBy(_.ord).grouped(1500).foreach { chunk =>
      mem.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("rm_out").as[KeyedOut].collect()
      .map(o => (o.key, o.ord) -> o.out).toMap
    val exp = StatefulOps.runningMax(spark.createDataset(hdfcKv)).collect()
      .map(o => (o.key, o.ord) -> o.out).toMap
    assert(got === exp)
  }

  test("streaming blockAverage yields the 102 golden emissions in order") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("Date"))
    val highs = StockCsv.read(spark, HdfcCsv)
      .withColumn("ord", row_number().over(w).cast("long"))
      .select(col("Symbol").as("key"), col("ord"), col("High").as("value"))
      .as[KV].collect().toSeq.sortBy(_.ord)
    val mem = MemoryStream[KV]
    val q = StatefulOps.blockAverage(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("ba_out").start()
    highs.grouped(999).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val avgs = spark.table("ba_out").as[KeyedOut].collect().sortBy(_.ord).map(_.out)
    def r3(x: Double) = math.round(x * 1000) / 1000.0
    assert(avgs.length === 102)
    assert(avgs.take(3).map(r3).toSeq === Seq(352.888, 463.035, 519.082))
    assert(avgs.takeRight(3).map(r3).toSeq === Seq(1760.370, 1846.819, 2022.036))
  }

  test("blockAverage block indices continue across micro-batches (stateful, not re-ranked)") {
    implicit val sqlCtx = spark.sqlContext
    // 153 records in 60-record chunks: every 51-record block spans a
    // micro-batch boundary, so a per-batch re-rank would restart at 0
    val kv = (1L to 153L).map(i => KV("k", i, i.toDouble))
    val mem = MemoryStream[KV]
    val q = StatefulOps.blockAverage(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("ba_blocks").start()
    kv.grouped(60).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val got = spark.table("ba_blocks").as[KeyedOutN].collect().sortBy(_.ord)
    assert(got.map(o => (o.ord, o.block)).toSeq === Seq((51L, 0L), (102L, 1L), (153L, 2L)))
  }

  test("blockAverage: an all-non-finite block emits NULL like the batch DECIMAL sum") {
    // records 1..50 accumulate (all NaN -> every CAST is NULL), 51 triggers;
    // records 52..101 accumulate finite 1.0, 102 triggers
    val kv = (1L to 102L).map(i => KV("k", i, if (i <= 51) Double.NaN else 1.0))
    val got = StatefulOps.blockAverage(spark.createDataset(kv)).collect().sortBy(_.ord)
    assert(got.map(_.ord).toSeq === Seq(51L, 102L))
    assert(got(0).out === None)
    assert(got(1).out === Some(1.0))
  }

  test("streaming thresholdGaps matches the golden breach outputs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("Date"))
    val closes = StockCsv.read(spark, HdfcCsv)
      .withColumn("ord", row_number().over(w).cast("long"))
      .select(col("Symbol").as("key"), col("ord"), col("Close").as("value"))
      .as[KV].collect().toSeq.sortBy(_.ord)
    val mem = MemoryStream[KV]
    val q = StatefulOps.thresholdGaps(mem.toDS(), 300.0)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("tg_out").start()
    closes.grouped(2000).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val gaps = spark.table("tg_out").as[GapOut].collect().sortBy(_.ord).map(_.gap)
    assert(gaps.length === 5191)
    assert(gaps.take(5).toSeq === Seq(1L, 8L, 0L, 0L, 3L))
    assert(gaps.takeRight(2).toSeq === Seq(0L, 0L))
  }

  test("runningMaxBySubkey holds a real multi-entry map in state") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      KSV("k", "a", 1, 5.0), KSV("k", "b", 2, 3.0), KSV("k", "a", 3, 2.0),
      KSV("k", "b", 4, 9.0), KSV("k", "a", 5, 7.0))
    val mem = MemoryStream[KSV]
    val q = StatefulOps.runningMaxBySubkey(mem.toDS())
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("sk_out").start()
    data.grouped(2).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    q.stop()
    val got = spark.table("sk_out").as[SubkeyOut].collect().sortBy(_.ord)
      .map(o => (o.subkey, o.out)).toSeq
    assert(got === Seq(("a", 5.0), ("b", 3.0), ("a", 5.0), ("b", 9.0), ("a", 7.0)))
  }

  test("gate form: TWAP through streaming interval state ≡ batch lead-window TWAP") {
    // the one registered streaming twin that had no spec of its own: the
    // two-file replay's intervals span the batch boundary in state, and
    // the decimal rollup must land bit-identically on the batch result
    val got = graft.operators.StatefulQueries.twapByTypeStreaming(spark, Sf0001).collect()
    val want = graft.operators.Sessionize.twapByType(spark, Sf0001).collect()
    assert(got.length === want.length && got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("attribution: a purchase attributes a view held in state from an earlier batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEv]
    val q = StatefulOps.attributionStream(mem.toDS(), lookbackUs = 1000L)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("attr_out").start()
    // batch 1: views only — both land in state, nothing emits
    mem.addData(Seq(AttrEv(1, 1, 100, "view"), AttrEv(2, 2, 0, "view")))
    q.processAllAvailable()
    assert(spark.table("attr_out").count() === 0)
    // batch 2, deliberately scrambled arrival order (the op sorts by ord):
    //  u1 ord 3 purchase@600  -> attributes the batch-1 view (state carry)
    //  u2 ord 4 purchase@2000 -> view@0 is beyond the 1000µs lookback -> null
    //  u3 ord 5 purchase@700  -> no view ever -> null
    //  u1 ord 6 purchase@900  -> still the 100µs view; the SAME-us view at
    //                            ord 7 must NOT attribute (1-PRECEDING frame)
    mem.addData(Seq(AttrEv(1, 7, 900, "view"), AttrEv(1, 6, 900, "purchase"),
                    AttrEv(3, 5, 700, "purchase"), AttrEv(1, 3, 600, "purchase"),
                    AttrEv(2, 4, 2000, "purchase")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out").as[AttrOut].collect()
      .map(o => o.event_id -> ((o.user_id, o.purchase_us, o.attributed_view_us))).toMap
    assert(got === Map(
      3L -> ((1L, 600L, Some(100L))),
      4L -> ((2L, 2000L, None)),
      5L -> ((3L, 700L, None)),
      6L -> ((1L, 900L, Some(100L)))))
  }

  test("property: attribution streaming equals the batch window on random sequences") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(77)
    // time-ordered ids with DELIBERATE timestamp ties (several events can
    // share a µs), random user interleaving, ~50/50 view/purchase
    var us = 0L
    val evs = (1 to 400).map { i =>
      us += rnd.nextInt(3) // 0 advances → ties across consecutive ords
      AttrEv(rnd.nextInt(8).toLong, i.toLong, us,
             if (rnd.nextBoolean()) "view" else "purchase")
    }
    val lookback = 57L
    // batch reference: the exact attributionLastTouch window form
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = spark.createDataset(evs).toDF()
      .withColumn("lv", max(when(col("typ") === "view", col("us"))).over(w))
      .filter(col("typ") === "purchase")
      .select(col("ord"),
        when(col("us") - col("lv") <= lookback, col("lv")).as("attr"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val mem = MemoryStream[AttrEv]
    val q = StatefulOps.attributionStream(mem.toDS(), lookback)
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("attr_prop").start()
    // 5 ord-ordered chunks, shuffled WITHIN each chunk (arrival order
    // inside a batch is arbitrary; the replay contract only splits at ord
    // boundaries)
    evs.grouped(80).foreach { chunk =>
      mem.addData(rnd.shuffle(chunk)); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("attr_prop").as[AttrOut].collect()
      .map(o => o.event_id -> o.attributed_view_us).toMap
    spark.catalog.dropTempView("attr_prop")
    assert(got.size === exp.size)
    assert(got === exp)
    // non-vacuous: both attributed and unattributed purchases occur
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }
}
