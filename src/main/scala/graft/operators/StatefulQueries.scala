package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{KSV, KV}

/** The streaming keyed-state operators run against the driver tables in
  * BATCH mode (flatMapGroupsWithState executes on bounded Datasets too) and
  * registered under the same oracle SQL as their window-function twins —
  * i.e. the correctness gate itself proves stateful-form ≡ declarative-form.
  *
  * Ordering note: `event_id` is verified monotone in (ts, event_id) across
  * all scale factors, so it serves as the per-key arrival order `ord`; if a
  * dataset ever violated that, the oracle hash (ordered by ts, event_id)
  * would catch it.
  */
object StatefulQueries {

  private implicit val kvEnc: Encoder[KV] = Encoders.product[KV]
  private implicit val ksvEnc: Encoder[KSV] = Encoders.product[KSV]

  /** Q1 stateful form: running max value per year, per record. */
  def runningMaxStateful(spark: SparkSession, sfDir: String): DataFrame = {
    val kv = Tables.events(spark, sfDir)
      .select(year(col("ts")).cast("string").as("key"),
              col("event_id").as("ord"), col("value"))
      .as[KV](kvEnc)
    StatefulOps.runningMax(kv).toDF()
      .select(col("ord").as("event_id"), col("key").cast("long").as("yr"),
              col("out").as("run_max"))
      .orderBy(col("event_id"))
  }

  /** Q1 via SECONDARY SORT — the 100 TB batch execution of per-record keyed
    * state: hash-partition by key, sort (key, ord) WITHIN partitions (Spark's
    * spill-safe sort, no per-group buffering), then a single `mapPartitions`
    * pass holding O(1) state that resets at key boundaries. Unlike
    * `flatMapGroupsWithState`'s batch mode (one in-memory group at a time),
    * memory here is independent of both group count and group size. */
  def runningMaxSecondarySort(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir)
      .select(year(col("ts")).cast("long").as("yr"),
              col("ts_ns"), col("event_id"), col("value"))
      .repartition(col("yr"))
      .sortWithinPartitions(col("yr"), col("ts_ns"), col("event_id"))
    val outSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("yr", LongType, nullable = false),
      StructField("run_max", DoubleType, nullable = false)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    ev.mapPartitions { rows =>
      var curKey = Long.MinValue
      var mx = Double.NegativeInfinity
      rows.map { r =>
        val yr = r.getLong(0)
        if (yr != curKey) { curKey = yr; mx = Double.NegativeInfinity }
        val v = r.getDouble(3)
        if (v > mx) mx = v
        Row(r.getLong(2), yr, mx)
      }
    }.orderBy(col("event_id"))
  }

  /** Q2 via secondary sort (see [[runningMaxSecondarySort]] for the shape):
    * hash-partition by event_type, sort within partitions, one pass with a
    * per-key block accumulator in integer cents (HALF_UP per record — the
    * bit-exact mirror of the batch form's CAST(value AS DECIMAL(18,2)) sum).
    * Memory is O(1) per key regardless of group size — the scale-safe batch
    * execution of the reference's trigger-discard semantics. A block whose
    * 50 summed records are all non-finite (each CAST yields NULL) emits a
    * NULL average, exactly like the declarative twin. */
  def blockAvgSecondarySort(spark: SparkSession, sfDir: String,
                            emitCount: Int = 50): DataFrame = {
    // a block is `emitCount` summed records + 1 trigger record (the
    // reference's 51-record trigger-discard cycle)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_ns"), col("event_id"), col("value"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("ts_ns"), col("event_id"))
    val outSchema = StructType(Seq(
      StructField("event_type", StringType, nullable = false),
      StructField("block", LongType, nullable = false),
      StructField("avg_value", DoubleType, nullable = true)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    ev.mapPartitions { rows =>
      var curKey: String = null
      var cnt = 0; var cents = 0L; var nFinite = 0; var block = 0L
      rows.flatMap { r =>
        val key = r.getString(0)
        if (key != curKey) { curKey = key; cnt = 0; cents = 0L; nFinite = 0; block = 0L }
        val v = r.getDouble(3)
        if (cnt < emitCount) {
          if (java.lang.Double.isFinite(v)) {
            cents += (BigDecimal(v)
              .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
            nFinite += 1
          }
          cnt += 1
          Iterator.empty
        } else { // the trigger record: emit and discard it
          val avg: java.lang.Double =
            if (nFinite == 0) null else Double.box((cents.toDouble / 100.0) / emitCount)
          val out = Row(key, block, avg)
          block += 1L; cnt = 0; cents = 0L; nFinite = 0
          Iterator.single(out)
        }
      }
    }.orderBy(col("event_type"), col("block"))
  }

  /** Q3 via secondary sort: partition by year, sort within partitions, one
    * pass holding the per-month running max as a small in-pass map (12
    * entries — the MapState shape) that resets at year boundaries. */
  def runningMaxMonthSecondarySort(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir)
      .select(year(col("ts")).cast("long").as("yr"),
              month(col("ts")).cast("long").as("mon"),
              col("ts_ns"), col("event_id"), col("value"))
      .repartition(col("yr"))
      .sortWithinPartitions(col("yr"), col("ts_ns"), col("event_id"))
    val outSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("yr", LongType, nullable = false),
      StructField("mon", LongType, nullable = false),
      StructField("run_max", DoubleType, nullable = false)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    ev.mapPartitions { rows =>
      var curKey = Long.MinValue
      val monMax = scala.collection.mutable.LongMap.empty[Double]
      rows.map { r =>
        val yr = r.getLong(0)
        if (yr != curKey) { curKey = yr; monMax.clear() }
        val mon = r.getLong(1)
        val v = r.getDouble(4)
        val mx = monMax.get(mon) match {
          case Some(prev) if prev >= v => prev
          case _                       => v
        }
        monMax.update(mon, mx)
        Row(r.getLong(3), yr, mon, mx)
      }
    }.orderBy(col("event_id"))
  }

  /** Q4 via secondary sort: partition by event_type, sort within partitions,
    * one pass with a per-key sub-threshold counter (the ListState-size
    * semantics) that emits on breach and resets at key boundaries. */
  def thresholdGapsSecondarySort(spark: SparkSession, sfDir: String,
                                 threshold: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_ns"), col("event_id"), col("value"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("ts_ns"), col("event_id"))
    val outSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("gap", LongType, nullable = false)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    ev.mapPartitions { rows =>
      var curKey: String = null
      var n = 0L
      rows.flatMap { r =>
        val key = r.getString(0)
        if (key != curKey) { curKey = key; n = 0L }
        if (r.getDouble(3) >= threshold) {
          val out = Row(r.getLong(2), key, n)
          n = 0L
          Iterator.single(out)
        } else {
          n += 1L
          Iterator.empty
        }
      }
    }.orderBy(col("event_id"))
  }

  /** Q2 stateful form: 51-record block average per event_type. The block
    * index is recovered as the per-key emission rank (emissions arrive in
    * ord order). */
  def blockAvgStateful(spark: SparkSession, sfDir: String): DataFrame = {
    val kv = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"), col("event_id").as("ord"), col("value"))
      .as[KV](kvEnc)
    val w = Window.partitionBy(col("key")).orderBy(col("ord"))
    StatefulOps.blockAverage(kv).toDF()
      .withColumn("block", (row_number().over(w) - 1).cast("long"))
      .select(col("key").as("event_type"), col("block"), col("out").as("avg_value"))
      .orderBy(col("event_type"), col("block"))
  }

  /** Q3 stateful form: running max per (year, month) with the month held as
    * a REAL MapState-shaped subkey map inside the year's state. */
  def runningMaxMonthStateful(spark: SparkSession, sfDir: String): DataFrame = {
    val ksv = Tables.events(spark, sfDir)
      .select(year(col("ts")).cast("string").as("key"),
              month(col("ts")).cast("string").as("subkey"),
              col("event_id").as("ord"), col("value"))
      .as[KSV](ksvEnc)
    StatefulOps.runningMaxBySubkey(ksv).toDF()
      .select(col("ord").as("event_id"), col("key").cast("long").as("yr"),
              col("subkey").cast("long").as("mon"), col("out").as("run_max"))
      .orderBy(col("event_id"))
  }

  /** Q4 stateful form: threshold-gap counts per event_type. */
  def thresholdGapsStateful(spark: SparkSession, sfDir: String): DataFrame = {
    val kv = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"), col("event_id").as("ord"), col("value"))
      .as[KV](kvEnc)
    StatefulOps.thresholdGaps(kv, 100.0).toDF()
      .select(col("ord").as("event_id"), col("key").as("event_type"), col("gap"))
      .orderBy(col("event_id"))
  }
}
