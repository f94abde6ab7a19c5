package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered queries.
  * Usage: runMain graft.tools.Explain <sfDir> <queryName> [queryName…] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      // "run:<name>" executes the query first and prints the FINAL adaptive
      // plan (ReusedExchange nodes only appear after AQE materialization)
      if (name.startsWith("run:")) {
        val df = graft.SparkEntry.queries(name.stripPrefix("run:"))(spark, sfDir)
        // drive THIS df's own executedPlan (Dataset.foreach/.count build a
        // fresh QueryExecution, leaving this one isFinalPlan=false): an
        // RDD-level no-op action on the exact physical plan materializes
        // every adaptive stage without collecting rows to the driver
        df.queryExecution.executedPlan.execute().foreach(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } else {
        graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
