package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r19 OPTIMIZATION round: is the single-store streaming
  * drains' state width 8 (every `drainStateful`/`drainDocuments` consumer)
  * actually optimal, or only the stream-stream join's width 4 was ever
  * swept (r13, SCALING.md)? Replays ONE representative single-operator
  * stateful drain — the fMGWS running-max over the events file stream, the
  * q1r shape — at several widths and prints min-of-N seconds per width.
  * Results only (no oracle semantics) — width cannot change rows, which
  * DETERMINISM_r18/r19 already witness at cpus 8 vs 5.
  * Usage: Test/runMain graft.operators.ProbeStreamWidth [sfDir] [reps]
  */
object ProbeStreamWidth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the streaming machinery once
    StatefulQueries.runningMaxStreaming(spark, sfDir).count()
    for (w <- Seq(2, 4, 8, 16)) {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        StatefulQueries.withNanosAsLong(spark) {
          val stream = graft.io.Tables.normalizeEvents(
            graft.io.Tables.streamTable(spark, sfDir, "events"))
          val kvEnc = org.apache.spark.sql.Encoders.product[
            graft.streaming.StatefulOps.KV]
          val out = graft.streaming.StatefulOps.runningMax(stream
            .select(year(col("ts")).cast("string").as("key"),
                    col("event_id").as("ord"), col("value"))
            .as[graft.streaming.StatefulOps.KV](kvEnc)).toDF()
          StatefulQueries.drainToMemory(spark, out, stateWidth = Some(w))()
            .count()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"width $w%2d: min=${ts.min}%.3f s  (all: " +
        ts.map(t => f"$t%.3f").mkString(", ") + ")")
    }
    spark.stop()
  }
}
