package graft.tools

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Dev probe: transformWithState in batch and streaming modes — which state
  * store provider each requires, and whether per-batch iterator order is
  * usable. */
object ProbeTws {

  case class KV(key: String, ord: Long, value: Double)
  case class Out(key: String, ord: Long, out: Double)

  class MaxProc extends StatefulProcessor[String, KV, Out] {
    @transient private var maxState: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxState = getHandle.getValueState[Double]("max", Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[KV],
                                 timerValues: TimerValues): Iterator[Out] = {
      var cur = if (maxState.exists()) maxState.get() else Double.NegativeInfinity
      val out = rows.toSeq.sortBy(_.ord).map { r =>
        if (r.value > cur) cur = r.value
        Out(key, r.ord, cur)
      }
      maxState.update(cur)
      out.iterator
    }
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val outEnc: Encoder[Out] = Encoders.product[Out]

    val data = Seq(
      KV("a", 1L, 1.0), KV("a", 2L, 5.0), KV("a", 3L, 2.0),
      KV("b", 1L, 9.0), KV("b", 2L, 3.0)).toDS()

    // 1. batch mode, default provider
    try {
      val got = data.groupByKey(_.key)
        .transformWithState(new MaxProc, TimeMode.None(), OutputMode.Append())
        .collect().sortBy(r => (r.key, r.ord)).toSeq
      println(s"[probe] batch default provider OK: $got")
    } catch { case t: Throwable => println(s"[probe] batch default provider FAILED: $t") }

    // 1b. batch mode, RocksDB provider
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val got = data.groupByKey(_.key)
        .transformWithState(new MaxProc, TimeMode.None(), OutputMode.Append())
        .collect().sortBy(r => (r.key, r.ord)).toSeq
      println(s"[probe] batch rocksdb provider OK: $got")
    } catch { case t: Throwable =>
      println(s"[probe] batch rocksdb provider FAILED: ${t.toString.take(300)}")
      var c = t.getCause
      while (c != null) { println(s"[probe]   caused by: ${c.toString.take(300)}"); c = c.getCause }
    }
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    // 2. streaming, default (HDFS) provider
    def streamOnce(tag: String): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"tws-$tag-")
      data.toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)
      try {
        val stream = spark.readStream.schema(data.schema).parquet(dir.toString).as[KV]
        val out = stream.groupByKey(_.key)
          .transformWithState(new MaxProc, TimeMode.None(), OutputMode.Append())
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName(s"tws_$tag").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val got = spark.table(s"tws_$tag").collect().length
        println(s"[probe] streaming $tag OK: $got rows")
      } catch { case t: Throwable =>
        println(s"[probe] streaming $tag FAILED: ${t.toString.take(400)}")
      }
    }
    streamOnce("hdfs")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    streamOnce("rocksdb")

    // 3. batch AFTER a streaming query has created the StateStoreCoordinator
    try {
      val got = data.groupByKey(_.key)
        .transformWithState(new MaxProc, TimeMode.None(), OutputMode.Append())
        .collect().sortBy(r => (r.key, r.ord)).toSeq
      println(s"[probe] batch after-stream rocksdb OK: $got")
    } catch { case t: Throwable =>
      println(s"[probe] batch after-stream FAILED: ${t.toString.take(300)}")
    }

    // 4. what does the checkpoint record about state variables?
    {
      val dir = java.nio.file.Files.createTempDirectory("tws-meta-src-")
      val ckpt = java.nio.file.Files.createTempDirectory("tws-meta-ckpt-")
      data.toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val stream = spark.readStream.schema(data.schema).parquet(dir.toString).as[KV]
      val out = stream.groupByKey(_.key)
        .transformWithState(new MaxProc, TimeMode.None(), OutputMode.Append())
      val q = out.writeStream.outputMode("append").format("memory")
        .option("checkpointLocation", ckpt.toString)
        .queryName("tws_meta").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(ckpt)
      val files = try walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toList finally walk.close()
      files.foreach { f =>
        val rel = ckpt.relativize(f).toString
        if (!rel.contains(".crc") && (rel.contains("metadata") || rel.contains("Schema") || rel.contains("schema"))) {
          val bytes = java.nio.file.Files.readAllBytes(f)
          val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
          val printable = s.filter(c => c >= 32 && c < 127)
          println(s"[probe] ckpt file $rel (${bytes.length}B): ${printable.take(600)}")
        } else println(s"[probe] ckpt file $rel")
      }
    }
    spark.stop()
  }
}
