package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Relational

/** Property pins for the round-13 analytics additions — the invariants the
  * fixture-replay oracle cannot probe (it sees one distribution). Seeded
  * random trials, the [[StatefulPropsSpec]] discipline. */
class AnalyticsPropsSpec extends SparkSpec {
  import spark.implicits._

  test("property: banded pareto cumulative equals the single-window cumulative on random revenues") {
    // the scale-path equivalence beyond the fixture: for ANY revenue
    // distribution (including band-boundary ties and a one-band collapse),
    // the two-level prefix sum must reproduce the single-window running
    // sum bit-for-bit — decimal addition is exact, so any difference is a
    // banding bug (wrong order between bands, off-by-one offsets)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // duplicates + boundary-exact values on purpose: W divides many
      val cents = List.fill(60)(rnd.nextInt(6) * 25000L + rnd.nextInt(3) * 7L)
      val rev = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, BigDecimal(c) / 100) }
        .toDF("l_partkey", "rev_dec")
        .select(col("l_partkey"), col("rev_dec").cast("decimal(38,8)").as("rev_dec"))
      val ranked = Window.orderBy(col("rev_dec").desc, col("l_partkey"))
      val exact = rev
        .withColumn("cum", sum(col("rev_dec")).over(
          ranked.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("l_partkey"), col("cum"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      // the operator's banding, narrow width to force many bands + ties
      val W = 500L
      val banded = rev
        .withColumn("chk", expr(s"-(cast(rev_dec as bigint) div $W)"))
      val wIn = Window.partitionBy(col("chk"))
        .orderBy(col("rev_dec").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wOff = Window.orderBy(col("chk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = banded.groupBy(col("chk")).agg(sum(col("rev_dec")).as("tb"))
        .withColumn("off", sum(col("tb")).over(wOff))
        .select(col("chk"), col("off"))
      val got = banded
        .withColumn("cum_in", sum(col("rev_dec")).over(wIn))
        .join(broadcast(offs), "chk")
        .withColumn("cum",
          when(col("off").isNull, col("cum_in")).otherwise(col("cum_in") + col("off")))
        .select(col("l_partkey"), col("cum"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      assert(got.view.mapValues(_.stripTrailingZeros).toMap ===
        exact.view.mapValues(_.stripTrailingZeros).toMap, s"seed $seed")
    }
  }

  test("conversion_rate_wilson: the interval contains p and stays inside [0, 1]") {
    val rows = graft.operators.Analytics.conversionRateWilson(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("p"), r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo <= p && p <= hi, r)
      // Wilson bounds are probabilities (unlike Wald's, which can escape)
      assert(lo >= 0.0 && hi <= 1.0, r)
    }
  }

  test("mad_anomaly_daily: every flagged row satisfies its own flag predicate") {
    val rows = graft.operators.Analytics.madAnomalyDaily(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("dev") > 3.0 * r.getAs[Double]("mad"), r)
    }
  }

  test("q35_custdist distribution sums back to the customer count") {
    val dist = Relational.custDist(spark, Sf0001)
      .agg(sum(col("custdist"))).head().getLong(0)
    val nCust = graft.io.Tables.customer(spark, Sf0001).count()
    assert(dist === nCust)
  }

  test("q34_band_join: disjoint bands partition the probe side exactly") {
    val n = Relational.bandJoin(spark, Sf0001)
      .agg(sum(col("n_rows"))).head().getLong(0)
    assert(n === graft.io.Tables.lineitem(spark, Sf0001).count())
  }
}
