package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timing for the user co-occurrence graph family. */
object ProbeUserGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = args.lift(1).getOrElse("32")
    val aqe = args.lift(2).getOrElse("true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(s"$tag: ${(System.nanoTime() - t0) / 1e9}s")
      r
    }
    // edge list alone
    for (i <- 1 to 2) {
      val b = graft.io.Tables.events(spark, sfDir)
        .select(col("user_id"), expr("ts_ns div 60000000000").as("w"))
        .distinct()
      val e = b.select(col("w"), col("user_id").as("u"))
        .join(b.select(col("w"), col("user_id").as("v")), "w")
        .filter(col("u") < col("v"))
        .select(col("u"), col("v"))
        .distinct()
      time(s"edges-$i")(println("  n=" + e.count()))
    }
    for (i <- 1 to 2)
      time(s"triangles-$i")(
        graft.operators.Analytics.triangleCountUsers(spark, sfDir).count())
    for (i <- 1 to 2)
      time(s"pagerank-$i")(
        graft.operators.Analytics.pagerankUsers(spark, sfDir).count())
    for (i <- 1 to 2)
      time(s"wedges-$i")(
        graft.operators.Analytics.wedgeStatsUsers(spark, sfDir).count())
    spark.stop()
  }
}
