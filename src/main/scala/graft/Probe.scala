package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps._
/** Temporary smoke probe (removed before round end): drives the streaming
  * keyed-state ops through the public API with a real streaming query. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    implicit val kvEnc: org.apache.spark.sql.Encoder[KV] = org.apache.spark.sql.Encoders.product[KV]
    val mem = MemoryStream[KV]
    val q = StatefulOps.runningMax(mem.toDS())
      .writeStream.outputMode("append").format("memory").queryName("probe_rm").start()
    mem.addData(Seq(KV("k", 1, 5.0), KV("k", 2, 3.0))); q.processAllAvailable()
    mem.addData(Seq(KV("k", 3, 9.0), KV("k", 4, 1.0))); q.processAllAvailable()
    q.stop()
    val out = spark.table("probe_rm").collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    println("STREAM_OUT=" + out.mkString(","))
    assert(out.toSeq == Seq((1L, 5.0), (2L, 5.0), (3L, 9.0), (4L, 9.0)))
    println("STREAM_OK")
    spark.stop()
  }
}
