package graft

import org.apache.spark.sql.functions._

/** The drop-in facade reproduces the reference's outputs on its own CSV
  * (deep goldens live in KeyedOpsGoldenSpec; this pins the facade wiring). */
class StockJobsSpec extends SparkSpec {

  test("all four reference jobs run off one CSV path with the reference's shapes") {
    val q1 = StockJobs.maxClosePricePerYear(spark, HdfcCsv)
    assert(q1.columns.toSeq === Seq("year", "max_close"))
    assert(q1.count() === 5204) // one emission per input record
    assert(q1.groupBy(col("year")).agg(max(col("max_close"))).count() === 21)

    val q2 = StockJobs.rollingAvgHighPrice(spark, HdfcCsv)
    assert(q2.columns.toSeq === Seq("symbol", "block", "avg_high"))
    assert(q2.count() === 102) // floor(5204/51) completed blocks

    val q3 = StockJobs.maxVolumePerYearMonth(spark, HdfcCsv)
    assert(q3.columns.toSeq === Seq("year", "month", "max_volume"))
    assert(q3.count() === 5204)

    val q4 = StockJobs.daysSinceCloseThreshold(spark, HdfcCsv)
    assert(q4.columns.toSeq === Seq("symbol", "date", "days"))
    assert(q4.count() === 5191) // breach rows only, like the reference's emissions
  }

  test("streaming forms run the real engine over the CSV file source") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-stock").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get(HdfcCsv),
      java.nio.file.Paths.get(dir, "HDFC.csv"))
    val q1 = StockJobs.maxClosePricePerYearStream(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("sj_q1")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val out = spark.table("sj_q1")
    assert(out.count() === 5204)
    val finals = out.groupBy(col("year")).agg(max(col("max_close")).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(finals(2000) === 561.55 && finals(2020) === 2492.30) // HDFC goldens

    val q4 = StockJobs.daysSinceCloseThresholdStream(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("sj_q4")
      .trigger(Trigger.AvailableNow()).start()
    q4.awaitTermination()
    assert(spark.table("sj_q4").count() === 5191)

    val q2 = StockJobs.rollingAvgHighPriceStream(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("sj_q2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("sj_q2").count() === 102)

    val q3 = StockJobs.maxVolumePerYearMonthStream(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("sj_q3")
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val t3 = spark.table("sj_q3")
    assert(t3.count() === 5204)
    assert(t3.filter(col("year") === 2020 && col("month") === 11)
      .agg(max(col("max_volume"))).head().getLong(0) === 10179511L) // HDFC golden
  }
}
