package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Dev probe for the r19 OPTIMIZATION round: community_modularity runs two
  * INDEPENDENT iterative cores (LPA rounds, CC min-label loop) sequentially
  * over one cached edge table; each core's eager per-round actions use only
  * a fraction of the machine (width-8 stages on 32 cores). Does overlapping
  * the two cores from two driver threads (guide §2.6) cut the composite's
  * wall clock? Interleaved in one JVM. NOTE the known width interaction:
  * lshComponentsOf sets the session shuffle width to its pair-derived value
  * while LPA rounds run — a perf wobble, never a result change (both cores
  * are width- and schedule-deterministic; the hash gate re-proves it).
  * Usage: Test/runMain graft.operators.ProbeModularity [sfDir] [reps] */
object ProbeModularity {
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
    graft.io.Tables.events(spark, sfDir).count() // warm

    def composite(overlap: Boolean): DataFrame = {
      val e = Analytics.userCoEdges(spark, sfDir).cache()
      try {
        e.count()
        StatefulQueries.withShuffleWidth(spark, 8) {
          val nodes = graft.io.Tables.events(spark, sfDir)
            .filter(col("user_id").isNotNull)
            .select(col("user_id").as("node")).distinct()
          def lpaJob() = Analytics.labelPropOf(spark, nodes, e, rounds = 4)
          def compJob() = Dedup.lshComponentsOf(
            e.select(col("u").as("doc_a"), col("v").as("doc_b")))
          val (lpa, comp) =
            if (overlap) {
              val f = Future(lpaJob())
              val c = compJob()
              (Await.result(f, Duration.Inf), c)
            } else (lpaJob(), compJob())
          val cc = nodes.join(
              comp.select(col("doc_id").as("node"), col("component")),
              Seq("node"), "left")
            .select(col("node"), coalesce(col("component"), col("node")).as("lab"))
          Analytics.modularityOf(e, cc, "cc")
            .unionAll(Analytics.modularityOf(e, lpa, "lpa"))
            .orderBy(col("method"))
            .localCheckpoint(true)
        }
      } finally e.unpersist(blocking = false)
    }

    val seq = scala.collection.mutable.ListBuffer.empty[Double]
    val ovl = scala.collection.mutable.ListBuffer.empty[Double]
    var rows: (String, String) = null
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      val a = composite(overlap = false).collect().mkString("|")
      seq += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val b = composite(overlap = true).collect().mkString("|")
      ovl += (System.nanoTime() - t1) / 1e9
      rows = (a, b)
      require(a == b, s"overlap changed the result!\n$a\n$b")
    }
    println(f"sequential: min=${seq.min}%.3f s (all: " + seq.map(t => f"$t%.3f").mkString(", ") + ")")
    println(f"overlapped: min=${ovl.min}%.3f s (all: " + ovl.map(t => f"$t%.3f").mkString(", ") + ")")
    println(s"rows: ${rows._1}")
    spark.stop()
  }
}
