package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r19 OPTIMIZATION round: where do
  * column_stats_profile's ~3.2 s at sf0.1 actually go? Times, via the noop
  * sink (guide §1.4), the pieces of the profile aggregate over the same
  * projected input the operator uses: the full exact aggregate (count +
  * 7×(cnt, exact NDV, min, max) — Catalyst plans the multi-countDistinct
  * as one ×8 Expand), the same aggregate WITHOUT the NDVs (no expand), the
  * sketch-only aggregate (7× approx_count_distinct, no expand), and the
  * bare projected scan. Usage:
  * Test/runMain graft.operators.ProbeColumnStats [sfDir] [reps] */
object ProbeColumnStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    val DayUs = 86400000000L
    val li = graft.io.Tables.lineitem(spark, sfDir).select(cols.map { c =>
      (if (c == "l_shipdate")
         expr(s"unix_micros(date_trunc('DAY', $c)) div $DayUs")
       else col(c)).cast("double").as(c)
    }: _*)
    li.count() // warm

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min=${ts.min}%.3f s (all: " +
        ts.map(t => f"$t%.3f").mkString(", ") + ")")
    }

    val exactAggs = count(lit(1)).cast("long").as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"cnt_$c"),
          countDistinct(col(c)).cast("long").as(s"ndv_$c"),
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val noNdvAggs = count(lit(1)).cast("long").as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"cnt_$c"),
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val sketchAggs = cols.map(c => approx_count_distinct(col(c), 0.05).as(s"andv_$c"))

    time("scan only             ")(noop(li))
    time("agg no-NDV (no expand)")(noop(li.agg(noNdvAggs.head, noNdvAggs.tail: _*)))
    time("agg exact NDV (expand)")(noop(li.agg(exactAggs.head, exactAggs.tail: _*)))
    time("agg sketch NDV        ")(noop(li.agg(sketchAggs.head, sketchAggs.tail: _*)))
    spark.stop()
  }
}
