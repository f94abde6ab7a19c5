package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch (declarative, window-function) forms of the reference's four keyed
  * stateful operators. Each is a pure `DataFrame => DataFrame` transform that
  * Catalyst can optimize end-to-end: the per-key state machine of the Flink
  * original becomes a `Window.partitionBy(key).orderBy(order)` spec, so the
  * only shuffle is the hash exchange on the key — exactly the reference's
  * single `keyBy` exchange — and everything else stays in whole-stage codegen.
  *
  * Scale notes (100 TB): every op here shuffles once on its key and then does
  * a single sorted pass per partition — no state bigger than one row per key
  * except the sort buffer, which Spark spills. Skewed keys (the reference's
  * single-symbol keyBy, SURVEY.md §4.3) are the real hazard: the window forms
  * inherit it, so callers at scale should salt or sub-partition the key when a
  * single key's rows exceed one executor's sort budget.
  *
  * Streaming (per-record incremental) forms of the same semantics live in
  * [[graft.streaming.StatefulOps]].
  */
object KeyedOps {

  /** Running maximum per key, emitted for every input row
    * (cardinality-preserving), i.e. the reference's ValueState job
    * (`MaximumClosingPrice.java:47-82`) and — with a composite key — its
    * MapState job (`MaxTradeVolumePerYearPerMonth.java:53-91`).
    *
    * Adds column `outName` = max(`value`) over rows from the partition start
    * to the current row, ordered by `order` (which must be a deterministic
    * total order per key for reproducible output).
    */
  def runningMax(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 value: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName, max(value).over(w))
  }

  /** The 51-record block average of the reference's ValueState+ReducingState
    * job (`RollingAverageHighPrice.java:56-113`): per key, records are
    * consumed in cycles of `blockSize` (51); the first `emitCount` (50) are
    * accumulated, the final record of the cycle triggers emission of
    * sum/emitCount and is itself DISCARDED (not averaged). Incomplete trailing
    * cycles emit nothing (`RollingAverageHighPrice.java:76-87`).
    *
    * Output: one row per complete block: (keys..., block, outName) where
    * block is the 0-based cycle index. The average is computed as an exact
    * DECIMAL sum divided in double, so it is bit-reproducible across engines
    * (DuckDB oracle parity).
    */
  def blockAverage(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                   value: Column, outName: String,
                   blockSize: Int = 51, emitCount: Int = 50): DataFrame = {
    val wOrd = Window.partitionBy(keys: _*).orderBy(order: _*)
    // One ranking window + one group-by: a cycle is complete iff all
    // blockSize rows exist in its group (no count-over-full-partition window,
    // which would buffer each key's entire partition a second time); the
    // trigger record is excluded from the sum but counted for completeness.
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("block", floor((col("__rn") - 1) / blockSize))
      .groupBy(keys :+ col("block"): _*)
      .agg(
        sum(when((col("__rn") - 1) % blockSize < emitCount, value.cast("decimal(18,2)")))
          .as("__sum"),
        count(lit(1)).as("__cnt"))
      .filter(col("__cnt") === blockSize)
      .withColumn(outName, col("__sum").cast("double") / emitCount)
      .drop("__sum", "__cnt")
  }

  /** The threshold-gap ListState job (`DaysSincePriceThreshold.java:61-102`):
    * per key in arrival order, rows with `value >= threshold` are breaches;
    * each breach emits the count of sub-threshold rows seen since the previous
    * breach (consecutive breaches emit 0), then the counter resets. Trailing
    * sub-threshold rows emit nothing. Output is the breach rows only, with
    * added column `outName` = the gap count.
    *
    * Declarative form: running count of non-breach rows `c`, then per breach
    * row gap = c - c(previous breach) via lag over the breach subsequence.
    */
  def thresholdGaps(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                    value: Column, threshold: Double, outName: String): DataFrame = {
    val wRun = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__c", sum(when(value < threshold, 1L).otherwise(0L)).over(wRun))
      .filter(value >= threshold)
      // window after filter ⇒ lag runs over the breach subsequence only
      .withColumn(outName, (col("__c") - coalesce(lag(col("__c"), 1).over(wLag), lit(0L))))
      .drop("__c")
  }
}
