package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for the r19 OPTIMIZATION round: the iterative graph queries
  * (label_prop_communities, cc_users, community_modularity, the LSH
  * component family) execute their rounds EAGERLY (per-round
  * localCheckpoint), so the registered query's `explain` shows only the
  * final checkpoint scan — the plan that matters is the ROUND CORE. This
  * probe builds one LPA voting round over the real user co-occurrence
  * graph and prints the formatted plan of BOTH argmax forms (the
  * row_number window the round shipped with through r18, and the max_by
  * aggregate that replaces it), then times each over repeated runs, so
  * the plan diff and the per-round delta are reproducible from one
  * session. Usage: Test/runMain graft.tools.ProbeR19Rounds [sfDir] [reps]
  */
object ProbeR19Rounds {
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
    import graft.io.Tables

    // the labelPropOf round inputs, built exactly as the operator builds
    // them (userCoEdges shape), at the rounds' width 8
    val b = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts_ns div 60000000000").as("w"))
      .distinct()
    val ce = b.select(col("w"), col("user_id").as("u"))
      .join(b.select(col("w"), col("user_id").as("v")), "w")
      .filter(col("u") < col("v"))
      .select(col("u"), col("v"))
      .distinct()
    val edges = ce.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(ce.select(col("v").as("src"), col("u").as("dst")))
      .cache()
    edges.count()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val cur = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint(true)

    val votes = edges
      .join(cur.select(col("node").as("dst"), col("lab")), "dst")
      .groupBy(col("src"), col("lab"))
      .agg(count(lit(1)).as("c"))

    def windowForm: DataFrame = votes
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("c").desc, col("lab").asc)))
      .filter(col("rn") === 1)
      .select(col("src").as("node"), col("lab").as("new_lab"))

    def aggForm: DataFrame = votes
      .groupBy(col("src"))
      .agg(max_by(col("lab"),
        struct(col("c"), (-col("lab")).as("nl"))).as("new_lab"))
      .select(col("src").as("node"), col("new_lab"))

    println("===== LPA round argmax: row_number window form (BEFORE) =====")
    windowForm.explain("formatted")
    println("===== LPA round argmax: max_by aggregate form (AFTER) =====")
    aggForm.explain("formatted")

    // equivalence witness: the two forms agree row-for-row on the real graph
    val diff = windowForm.withColumnRenamed("new_lab", "w_lab")
      .join(aggForm, Seq("node"), "full_outer")
      .filter(not(col("w_lab") <=> col("new_lab")))
      .count()
    println(s"argmax form disagreement rows: $diff (must be 0)")

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min=${ts.min}%.3f s over $reps reps (all: " +
        ts.map(t => f"$t%.3f").mkString(", ") + ")")
    }
    time("window form ")(windowForm.write.format("noop").mode("overwrite").save())
    time("max_by form ")(aggForm.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
