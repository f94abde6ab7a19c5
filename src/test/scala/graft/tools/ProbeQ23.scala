package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: where does the q23ss/q23lo stream-stream drain spend its
  * time? Replays the REAL two-file symmetric interval join (all events,
  * 5-min gap) and prints each micro-batch's durationMs breakdown. Args:
  * sfDir width variant(dual|self). PROBE_CK_SHM=1 puts the checkpoint on
  * tmpfs. */
object ProbeQ23 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = args.lift(1).map(_.toInt).getOrElse(4)
    val variant = args.lift(2).getOrElse("dual")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.streaming.Trigger

    val t0 = System.nanoTime()
    val ev = graft.io.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val dir = java.nio.file.Files.createTempDirectory("probe-q23-").toString
    val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    ev.filter(col("event_id") <= mid).coalesce(1).write.mode("overwrite").parquet(s"$dir/f0")
    ev.filter(col("event_id") > mid).coalesce(1).write.mode("overwrite").parquet(s"$dir/f1")
    println(s"copy: ${(System.nanoTime() - t0) / 1e9}s")

    def run(tag: String): Unit = {
      val t1 = System.nanoTime()
      val schema = spark.read.parquet(s"$dir/f0").schema
      def rawSide(): DataFrame =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
      def shaped(df: DataFrame, t: String): DataFrame =
        df.select(col("user_id").as(s"user_$t"), col("event_id").as(s"id_$t"),
                  col("ts").as(s"ts_$t"))
          .withWatermark(s"ts_$t", "1 second")
      val cond = expr("user_a = user_b AND id_b > id_a AND ts_b >= ts_a AND " +
                      "ts_b <= ts_a + INTERVAL 5 MINUTES")
      val pairs = variant match {
        case "self" =>
          val one = rawSide()
          shaped(one, "a").join(shaped(one, "b"), cond, "inner")
        case _ =>
          shaped(rawSide(), "a").join(shaped(rawSide(), "b"), cond, "inner")
      }
      spark.conf.set("spark.sql.shuffle.partitions", width.toString)
      val ck = sys.env.get("PROBE_CK_SHM")
        .map(_ => s"/dev/shm/probe-q23-ck-${System.nanoTime()}")
      val w0 = pairs.writeStream.outputMode("append").format("memory")
        .queryName(s"probe_$tag").trigger(Trigger.AvailableNow())
      val q = ck.fold(w0)(c => w0.option("checkpointLocation", c)).start()
      q.awaitTermination()
      val started = (System.nanoTime() - t1) / 1e9
      q.recentProgress.foreach { p =>
        println(s"$tag batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      val cnt = spark.table(s"probe_$tag").count()
      spark.catalog.dropTempView(s"probe_$tag")
      println(s"$tag total=${started}s batches=${q.recentProgress.length} outRows=$cnt")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    run("w1"); run("w2"); run("w3")
    spark.stop()
  }
}
