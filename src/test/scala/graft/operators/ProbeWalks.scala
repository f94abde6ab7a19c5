package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for the r19 OPTIMIZATION round: random_walks_users builds its
  * output as a LAZY union of step frontiers — branch i's frontier subtree
  * re-executes the whole join chain 1..i at action time (only the
  * exchanges reuse), and the walk is the one graph core that does NOT
  * narrow the shuffle width to 8 (r13: width 32→8 halved the node-sized
  * graph stages at sf0.1). Times four variants INTERLEAVED in one JVM:
  *   A lazy union, session width 32   (the shipped shape)
  *   B per-step checkpointed frontier, width 32
  *   C lazy union, width 8
  *   D per-step checkpointed frontier, width 8
  * Usage: Test/runMain graft.operators.ProbeWalks [sfDir] [reps] */
object ProbeWalks {
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

    val P = 1000000007L
    val A = 2654435761L
    val steps = 3

    def adjOf(): DataFrame = {
      val e = Analytics.userCoEdges(spark, sfDir)
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("dst"))).cast("long"))
        .withColumn("deg", count(lit(1)).over(
          Window.partitionBy(col("src"))).cast("long"))
        .cache()
    }
    def startOf(): DataFrame =
      graft.io.Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id").as("start")).distinct()
    def stepJoin(frontier: DataFrame, adj: DataFrame, i: Int): DataFrame =
      frontier.join(adj,
        col("node") === col("src") &&
        col("rn") === ((((col("node") % P) * A + i) % P) % col("deg")) + 1)
        .select(col("start"), col("dst").as("node"))

    def lazyVariant(): Unit = {
      val adj = adjOf()
      try {
        var frontier = startOf().select(col("start"), col("start").as("node"))
        var out = frontier.select(col("start"), lit(0L).as("step"), col("node"))
        for (i <- 1 to steps) {
          frontier = stepJoin(frontier, adj, i)
          out = out.unionAll(
            frontier.select(col("start"), lit(i.toLong).as("step"), col("node")))
        }
        val d = out.orderBy(col("start"), col("step")).localCheckpoint(true)
        org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(d)
          .foreach(_.unpersist(blocking = false))
      } finally adj.unpersist(blocking = false)
    }
    def ckptVariant(): Unit = {
      val adj = adjOf()
      val kept = scala.collection.mutable.ListBuffer.empty[DataFrame]
      try {
        var frontier = startOf().select(col("start"), col("start").as("node"))
        var out = frontier.select(col("start"), lit(0L).as("step"), col("node"))
        for (i <- 1 to steps) {
          frontier = stepJoin(frontier, adj, i).localCheckpoint(true)
          kept += frontier
          out = out.unionAll(
            frontier.select(col("start"), lit(i.toLong).as("step"), col("node")))
        }
        val d = out.orderBy(col("start"), col("step")).localCheckpoint(true)
        org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(d)
          .foreach(_.unpersist(blocking = false))
      } finally {
        adj.unpersist(blocking = false)
        kept.foreach(f =>
          org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(f)
            .foreach(_.unpersist(blocking = false)))
      }
    }
    def withWidth(w: Int)(body: => Unit): Unit =
      StatefulQueries.withShuffleWidth(spark, w)(body)

    // E: adj built+materialized WIDE (the multiBfsOf discipline — the
    // window over events-sized co-edges runs at the session width), the
    // node-sized walk steps narrow
    def hybridVariant(): Unit = {
      val adj = adjOf()
      try {
        adj.count()
        withWidth(8) {
          var frontier = startOf().select(col("start"), col("start").as("node"))
          var out = frontier.select(col("start"), lit(0L).as("step"), col("node"))
          for (i <- 1 to steps) {
            frontier = stepJoin(frontier, adj, i)
            out = out.unionAll(
              frontier.select(col("start"), lit(i.toLong).as("step"), col("node")))
          }
          val d = out.orderBy(col("start"), col("step")).localCheckpoint(true)
          org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(d)
            .foreach(_.unpersist(blocking = false))
        }
      } finally adj.unpersist(blocking = false)
    }

    val names = Seq("A lazy w32", "B ckpt w32", "C lazy w8 ", "D ckpt w8 ",
                    "E hyb wide-adj w8")
    val ts = Array.fill(5)(scala.collection.mutable.ListBuffer.empty[Double])
    def time(i: Int)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body; ts(i) += (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 1 to reps) {
      time(0)(lazyVariant())
      time(1)(ckptVariant())
      time(2)(withWidth(8)(lazyVariant()))
      time(3)(withWidth(8)(ckptVariant()))
      time(4)(hybridVariant())
    }
    for (i <- 0 until 5)
      println(f"${names(i)}: min=${ts(i).min}%.3f s (all: " +
        ts(i).map(t => f"$t%.3f").mkString(", ") + ")")
    spark.stop()
  }
}
