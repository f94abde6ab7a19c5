package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventTime, StatefulOps}
import graft.streaming.StatefulOps.KV

class EventTimeSpec extends SparkSpec {

  import spark.implicits._

  case class Ev(ts: Timestamp, event_type: String, value: Double)

  // base aligned to the 10-minute window grid (epoch % 600000 == 0), so
  // window starts land exactly on ts(0), ts(10), ...
  private val Base = 1699999800000L
  private def ts(minute: Int) = new Timestamp(Base + minute * 60000L)

  test("watermarked tumbling window emits closed windows, drops too-late rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventTime.windowedSumByType(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("win_out").start()
    // batch 1: two windows' worth of events
    mem.addData(Ev(ts(0), "a", 1.0), Ev(ts(5), "a", 2.0), Ev(ts(12), "a", 4.0))
    q.processAllAvailable()
    // batch 2: advance event time far enough to close both earlier windows
    mem.addData(Ev(ts(40), "a", 8.0))
    q.processAllAvailable()
    // batch 3: a record behind the watermark must be dropped
    mem.addData(Ev(ts(1), "a", 100.0))
    q.processAllAvailable()
    mem.addData(Ev(ts(70), "a", 16.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(col("win_start"), col("sum_value")).collect()
      .map(r => (r.getTimestamp(0).getTime - Base) / 60000L -> r.getDouble(1))
      .toMap
    assert(rows(0L) === 3.0)  // [0,10): 1+2 — late 100.0 NOT included
    assert(rows(10L) === 4.0) // [10,20)
    assert(rows(40L) === 8.0)
  }

  test("stateful query recovers keyed state from a checkpoint across restarts") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    val mem = MemoryStream[KV]
    // memory sink cannot recover from a checkpoint; the file sink can
    def start() = StatefulOps.runningMax(mem.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir).start()
    val q1 = start()
    mem.addData(KV("k", 1, 7.0), KV("k", 2, 3.0))
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: running max must continue from 7.0
    val q2 = start()
    mem.addData(KV("k", 3, 5.0), KV("k", 4, 9.0))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir).as[StatefulOps.KeyedOut].collect()
      .sortBy(_.ord).map(_.out).toSeq
    assert(out === Seq(7.0, 7.0, 7.0, 9.0))
  }

  test("typed Aggregators: MaxValue/MeanValue match built-ins on HDFC") {
    import graft.io.StockCsv
    val closes = StockCsv.read(spark, HdfcCsv)
      .select(year(col("Date")).as("yr"), col("Close").as("value"))
      .as[(Int, Double)]
    val maxAgg = closes.groupByKey(_._1).mapValues(_._2)
      .agg(EventTime.MaxValue.toColumn.name("mx")).collect().toMap
    assert(maxAgg(2008) === 3180.15)
    assert(maxAgg(2020) === 2492.30)
    val meanAgg = closes.filter(_._1 == 2020).groupByKey(_._1).mapValues(_._2)
      .agg(EventTime.MeanValue.toColumn.name("mean")).collect().toMap
    val expMean = closes.filter(_._1 == 2020).map(_._2).collect()
    assert(math.abs(meanAgg(2020) - expMean.sum / expMean.length) < 1e-9)
  }
}
