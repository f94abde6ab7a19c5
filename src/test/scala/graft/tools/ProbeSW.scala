package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: streaming session_window in complete mode over events. */
object ProbeSW {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = graft.io.Tables.normalizeEvents(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .withColumn("ts_us", expr("ts_ns div 1000"))
    // gap+1µs: session_window merges on strict <, batch merges on <=
    val agg = stream
      .groupBy(session_window(col("ts"), "3600000001 microseconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts_us")).as("start_us"),
           max(col("ts_us")).as("end_us"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("probe_sw").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("probe_sw")
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
    println(s"[probe] streaming sessions: ${out.count()}")
    val batch = graft.operators.Sessionize.sessionize(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
    println(s"[probe] batch sessions: ${batch.count()}")
    val a = out.collect().map(_.toString).sorted
    val b = batch.collect().map(_.toString).sorted
    println(s"[probe] rows equal: ${a.sameElements(b)}")
    spark.stop()
  }
}
