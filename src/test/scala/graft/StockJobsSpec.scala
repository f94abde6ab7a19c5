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
}
