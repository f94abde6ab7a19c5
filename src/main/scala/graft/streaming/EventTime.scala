package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Event-time streaming surface: watermarked tumbling-window aggregation and
  * a typed Aggregator (the UDAF surface).
  *
  * The reference has no event-time processing (SURVEY.md §2.2 — its "50 days"
  * are row counts); these extend the engine to real event-time semantics:
  * late data beyond the watermark is dropped and window state is reclaimed —
  * the property that makes unbounded streams bounded-memory at scale.
  */
object EventTime {

  /** Tumbling event-time window aggregate with a watermark, for a streaming
    * DataFrame with (ts: timestamp, event_type: string, value: double).
    * Append-mode-compatible: a window emits once its watermark passes. */
  def windowedSumByType(events: DataFrame,
                        windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Typed Aggregator: final-value running max (the `groupBy(year).agg(max)`
    * form of the reference's Q1 as a reusable UDAF — SURVEY.md §2.2 row
    * "UDF/UDAF/UDTF"). Usable in both Dataset.agg and SQL via
    * `spark.udf.register("max_close", functions.udaf(MaxValue))`. */
  object MaxValue extends Aggregator[Double, Double, Double] {
    def zero: Double = Double.NegativeInfinity
    def reduce(b: Double, a: Double): Double = math.max(b, a)
    def merge(b1: Double, b2: Double): Double = math.max(b1, b2)
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed Aggregator with a composite buffer: numerically-stable mean via
    * (count, sum) — the ReducingState+ValueState pair of the reference's Q2
    * as one typed aggregation. */
  object MeanValue extends Aggregator[Double, (Long, Double), Double] {
    def zero: (Long, Double) = (0L, 0.0)
    def reduce(b: (Long, Double), a: Double): (Long, Double) = (b._1 + 1, b._2 + a)
    def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) = (a._1 + b._1, a._2 + b._2)
    def finish(r: (Long, Double)): Double = if (r._1 == 0) 0.0 else r._2 / r._1
    def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
