package graft

import org.apache.spark.sql.functions._
import graft.io.StockCsv
import graft.operators.KeyedOps

/** Golden tests: the four batch keyed ops reproduce the reference's exact
  * outputs on its own dataset (ground truth in FIXTURES.md §2, derived by
  * simulating the Flink jobs row-by-row). */
class KeyedOpsGoldenSpec extends SparkSpec {

  private lazy val hdfc = StockCsv.read(spark, HdfcCsv).cache()

  test("Q1 running max close per year: cardinality + 21 final maxima") {
    val withYear = hdfc.withColumn("yr", year(col("Date")))
    val rm = KeyedOps.runningMax(withYear, Seq(col("yr")), Seq(col("Date")),
      col("Close"), "run_max")
    assert(rm.count() === 5204)
    val finals = rm.groupBy(col("yr")).agg(max(col("run_max")).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expected = Map(
      2000 -> 561.55, 2001 -> 720.35, 2002 -> 690.35, 2003 -> 665.35,
      2004 -> 803.70, 2005 -> 1290.35, 2006 -> 1659.60, 2007 -> 3169.40,
      2008 -> 3180.15, 2009 -> 2839.05, 2010 -> 3115.55, 2011 -> 732.20,
      2012 -> 874.95, 2013 -> 929.50, 2014 -> 1160.65, 2015 -> 1394.80,
      2016 -> 1458.05, 2017 -> 1798.10, 2018 -> 2047.25, 2019 -> 2445.15,
      2020 -> 2492.30)
    assert(finals === expected)
  }

  test("Q2 block average of High: 102 emissions, golden first/last values") {
    val ba = KeyedOps.blockAverage(hdfc, Seq(col("Symbol")), Seq(col("Date")),
      col("High"), "avg_high")
    val rows = ba.orderBy(col("block")).collect()
    assert(rows.length === 102) // floor(5204 / 51)
    val avgs = rows.map(_.getAs[Double]("avg_high"))
    def r3(x: Double) = math.round(x * 1000) / 1000.0
    assert(Seq(avgs(0), avgs(1), avgs(2)).map(r3) === Seq(352.888, 463.035, 519.082))
    assert(Seq(avgs(99), avgs(100), avgs(101)).map(r3) === Seq(1760.370, 1846.819, 2022.036))
  }

  test("Q3 running max volume per (year,month): cardinality + golden maxima") {
    val ym = hdfc.withColumn("yr", year(col("Date"))).withColumn("mon", month(col("Date")))
    val rm = KeyedOps.runningMax(ym, Seq(col("yr"), col("mon")), Seq(col("Date")),
      col("Volume"), "run_max")
    assert(rm.count() === 5204)
    assert(rm.select(countDistinct(col("yr"), col("mon"))).head().getLong(0) === 251)
    val finals = rm.groupBy(col("yr"), col("mon")).agg(max(col("run_max")).as("mx"))
    def finalOf(y: Int, m: Int): Long =
      finals.filter(col("yr") === y && col("mon") === m).head().getAs[Long]("mx")
    assert(finalOf(2000, 1) === 1449638L)
    assert(finalOf(2020, 11) === 10179511L)
    // first two running outputs for (2000,1) match the reference Javadoc
    val first2 = rm.filter(col("yr") === 2000 && col("mon") === 1)
      .orderBy(col("Date")).select(col("run_max")).limit(2)
      .collect().map(_.getLong(0))
    assert(first2.toSeq === Seq(22744L, 255251L))
  }

  test("Q4 threshold gaps at 300: 5191 breaches, golden first five + last two") {
    val tg = KeyedOps.thresholdGaps(hdfc, Seq(col("Symbol")), Seq(col("Date")),
      col("Close"), 300.0, "gap")
    val rows = tg.orderBy(col("Date"))
      .select(date_format(col("Date"), "yyyy-MM-dd").as("d"), col("gap"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 5191)
    assert(rows.take(5).toSeq === Seq(
      ("2000-01-04", 1L), ("2000-01-17", 8L), ("2000-01-18", 0L),
      ("2000-01-19", 0L), ("2000-01-25", 3L)))
    assert(rows.takeRight(2).map(_._2).toSeq === Seq(0L, 0L))
  }

  test("Q2 property: emission count is floor(n/51) for any prefix size") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("Date"))
    val indexed = hdfc.withColumn("rn", row_number().over(w)).cache()
    for (n <- Seq(50, 51, 101, 102, 103, 512)) {
      val prefix = indexed.filter(col("rn") <= n)
      val cnt = KeyedOps.blockAverage(prefix, Seq(col("Symbol")), Seq(col("Date")),
        col("High"), "avg").count()
      assert(cnt === n / 51, s"prefix $n")
    }
  }
}
