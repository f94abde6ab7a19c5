package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst handles column pruning and
  * predicate pushdown, so readers stay schema-on-read and un-opinionated.
  * The one wrinkle is `events.ts`, written as parquet TIMESTAMP(NANOS): Spark's
  * native timestamp is microseconds and rejects nanos, so we read it as a
  * nanosecond epoch long (`spark.sql.legacy.parquet.nanosAsLong`) and keep BOTH
  * forms: `ts_ns` (lossless long, the per-key ordering column — full nanosecond
  * precision, matching DuckDB's ordering of the raw ns timestamps) and `ts`
  * (truncated-to-micros TimestampType for calendar functions year/month/etc.,
  * which are truncation-insensitive).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Spread a narrow scan across the cluster ONLY when it arrives in fewer
    * splits than there are cores (the small-single-file test inputs): at
    * production scale the input is already many splits and the exchange is
    * skipped entirely, so downstream projections keep the scan's
    * partitioning with zero shuffle. Partition-count inspection plans the
    * RDD lineage but runs no job. */
  def spreadIfNarrow(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(key) else df
  }

  /** The (doc_id, text) projection every text/dedup entry point starts
    * from — pruned to two columns and spread only when the scan arrives in
    * fewer splits than the cluster has slots (see [[spreadIfNarrow]]). */
  def documentsNarrow(spark: SparkSession, sfDir: String): DataFrame =
    spreadIfNarrow(
      documents(spark, sfDir).select(col("doc_id"), col("text")),
      col("doc_id"))

  /** Persist a frame as a bucketed (and per-bucket sorted) catalog table —
    * the co-located-join primitive: two tables bucketed the same way on
    * their join keys sort-merge-join with ZERO exchanges, pre-paying the
    * shuffle once at write time. At 100 TB this is how a fact table that is
    * joined repeatedly on the same key amortizes its shuffle; bucket count
    * should be sized so a bucket fits one task (rows/buckets × row width ≲
    * executor memory). */
  def saveBucketed(df: DataFrame, tableName: String,
                   buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(tableName)

  /** `events` with `ts` usable: ts_ns (long, total-order key) + ts (micros timestamp). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
