package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Indicators

/** Dev probe: print the full streaming progress JSON for the closed-bar
  * late-tick fixture, to see where the engine accounts the late drop. */
object ProbeOhlcClosed {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def frame(rows: Seq[(Long, Long, String, Double)]) =
      Indicators.tickFrame(spark, rows)
    val H = 3600L * 1000000L
    val f0 = frame(Seq((0L, 10L * H + 1L, "a", 5.0), (1L, 10L * H + 2L, "a", 9.0),
                       (2L, 12L * H + 1L, "a", 7.0)))
    val late = frame(Seq((3L, 10L * H + 3L, "a", 100.0)))
    val sent = frame(Seq((-1L, 45L * H, Indicators.OhlcSentinelType, 0.0)))
    val (bars, dropped) = Indicators.closedBarReplayOf(
      spark, Seq(f0, late, sent), "ohlcclosed-probe", p => println(p.json))
    println(s"DROPPED=$dropped")
    bars.orderBy(col("hour_start")).show(false)
    spark.stop()
  }
}
