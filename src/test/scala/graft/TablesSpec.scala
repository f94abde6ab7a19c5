package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.{Skew, TopK}

class TablesSpec extends SparkSpec {

  test("events reader: ts_ns is lossless, ts is its microsecond truncation") {
    // encoding-adaptive: whatever physical type the fixture's ts carries,
    // the canonical contract must hold — ts is TimestampType, ts_ns is the
    // long total-order key, and they agree at microsecond precision
    val ev = Tables.events(spark, Sf0001)
    assert(ev.count() === 1000)
    val bad = ev.filter(
      unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad === 0)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.schema("ts_ns").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("normalizeEvents adapts to all three physical ts encodings") {
    import spark.implicits._
    val us = 1609459200123456L // 2021-01-01 00:00:00.123456 UTC
    // int64 nanos surfaced as a BIGINT (the nanosAsLong legacy path)
    val fromNanos = Tables.normalizeEvents(
      Seq((1L, us * 1000L + 789L)).toDF("event_id", "ts"))
    // native TIMESTAMP (UTC-adjusted micros)
    val fromTs = Tables.normalizeEvents(
      Seq((1L, us)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    // naive TIMESTAMP_NTZ micros (the current testdata encoding)
    val fromNtz = Tables.normalizeEvents(
      Seq((1L, us)).toDF("event_id", "us")
        .select(col("event_id"),
                timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    for (df <- Seq(fromNanos, fromTs, fromNtz)) {
      assert(df.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      val r = df.select(unix_micros(col("ts")), col("ts_ns")).head()
      assert(r.getLong(0) === us)
      // ts_ns keeps full ns precision on the nanos path, ×1000 otherwise
      assert(r.getLong(1) === (if (df eq fromNanos) us * 1000L + 789L
                               else us * 1000L))
    }
    val thrown = intercept[IllegalArgumentException] {
      Tables.normalizeEvents(Seq((1L, "x")).toDF("event_id", "ts"))
    }
    assert(thrown.getMessage.contains("unsupported"))
  }

  test("partitionBy write lays out hive dirs; reads prune partitions at the scan") {
    // the data-layout face of pruning: write partitioned by a filter column,
    // read back with a predicate, and the scan must show a PartitionFilter
    // with only the matching directory surviving
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    assert(new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("l_returnflag=")) === 3)
    val back = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    assert(back.count() === li.filter(col("l_returnflag") === "A").count())
  }

  test("JSON lines sink + source round-trips the orders table losslessly") {
    // JSON is the interchange format a pipeline meets beyond parquet/CSV:
    // write a frame as JSON lines, read it back with an explicit schema
    // (schema-on-read — no inference pass over 100 TB), compare exactly.
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val o = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderdate").cast("string").as("o_orderdate"))
    o.write.mode("overwrite").json(dir)
    val back = spark.read.schema(o.schema).json(dir)
    assert(back.count() === o.count())
    assert(back.exceptAll(o).isEmpty && o.exceptAll(back).isEmpty)
    // projection pushdown applies to the JSON scan too
    val p = back.select("o_orderkey").queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<o_orderkey"), p)
  }

  test("salted aggregation equals the direct group-by exactly") {
    val direct = graft.io.Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_returnflag"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)")) *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("revenue"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedRevenue(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("revenue")).toMap
    assert(salted === direct) // bit-exact: decimal partials merge losslessly
  }

  test("TopKAgg equals the window-rank form row for row") {
    val viaAgg = TopK.topPartsByBrandAgg(spark, Sf0001).collect().map(_.toSeq)
    val viaWin = graft.operators.Relational.topPartsByBrand(spark, Sf0001).collect().map(_.toSeq)
    assert(viaAgg.toSeq === viaWin.toSeq)
  }
}
