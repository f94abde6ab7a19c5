package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the r19 OPTIMIZATION round, pagerank spine change: prints
  * the formatted plan of ONE pagerank step over the real sf0.1 user graph
  * in both spines — the nodes re-join (BEFORE: the step's checkpoint
  * action re-evaluates the nodes subtree, a full events scan + distinct,
  * once per step) and the ranks re-join (AFTER: the step joins the
  * previous round's checkpointed rank table, same node set by induction).
  * Also asserts row equality of the two step outputs.
  * Usage: Test/runMain graft.tools.ProbeR19Pagerank [sfDir] */
object ProbeR19Pagerank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.io.Tables

    val b = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts_ns div 60000000000").as("w"))
      .distinct()
    val ce = b.select(col("w"), col("user_id").as("u"))
      .join(b.select(col("w"), col("user_id").as("v")), "w")
      .filter(col("u") < col("v")).select(col("u"), col("v")).distinct()
    val edges = ce.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(ce.select(col("v").as("src"), col("u").as("dst")))
      .repartition(8, col("src")).cache()
    edges.count()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val nodes = Tables.events(spark, sfDir).select(col("user_id").as("node")).distinct()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    val base = 150000000L / n
    // one materialized round, as the operator produces it
    val ranks = nodes.select(col("node"), lit(1000000000L / n).as("r"))
      .localCheckpoint(true)
    val inc = edges
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(outDeg, "src")
      .select(col("dst").as("node"), expr("r div deg").as("contrib"))
      .groupBy(col("node")).agg(sum(col("contrib")).as("inc"))
    def stepVia(spine: DataFrame): DataFrame = spine.join(inc, Seq("node"), "left")
      .select(col("node"),
              (lit(base) + expr("coalesce(inc, 0) * 85 div 100")).as("r"))
    println("===== pagerank step, nodes spine (BEFORE) =====")
    stepVia(nodes).explain("formatted")
    println("===== pagerank step, ranks spine (AFTER) =====")
    stepVia(ranks.select(col("node"), col("r"))).explain("formatted")
    val diff = stepVia(nodes).withColumnRenamed("r", "r0")
      .join(stepVia(ranks.select(col("node"), col("r"))), Seq("node"), "full_outer")
      .filter(not(col("r0") <=> col("r"))).count()
    println(s"step spine disagreement rows: $diff (must be 0)")
    spark.stop()
  }
}
