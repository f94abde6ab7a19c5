package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{KeyedOps, StatefulQueries}

/** NaN parity: the secondary-sort forms must agree with their declarative
  * window twins under Spark SQL comparison semantics (NaN orders GREATEST)
  * — a plain JVM `>=` is false for NaN and silently diverges. The pinned
  * datasets contain no NaN, so this spec plants them. */
class NanParitySpec extends SparkSpec {

  import spark.implicits._

  // two years × interleaved NaN/finite values; event_id monotone in ts
  private def events = {
    val rows = Seq(
      (1L, "2021-03-01 00:00:00", "a", 10.0),
      (2L, "2021-03-02 00:00:00", "a", Double.NaN),
      (3L, "2021-04-03 00:00:00", "b", 5.0),
      (4L, "2021-04-04 00:00:00", "a", 250.0),
      (5L, "2022-01-01 00:00:00", "b", Double.NaN),
      (6L, "2022-01-02 00:00:00", "a", 99.0),
      (7L, "2022-02-03 00:00:00", "b", 120.0),
      (8L, "2022-02-04 00:00:00", "a", 7.0))
    rows.map { case (id, ts, et, v) =>
      val t = Timestamp.valueOf(ts)
      (id, t, t.getTime * 1000000L, et, v)
    }.toDF("event_id", "ts", "ts_ns", "event_type", "value")
  }

  test("q1p: running max treats NaN as greatest, like the window twin") {
    val ev = events.withColumn("yr", year(col("ts")).cast("long"))
    val declarative = KeyedOps.runningMax(ev, Seq(col("yr")),
        Seq(col("ts_ns"), col("event_id")), col("value"), "run_max")
      .select(col("event_id"), col("yr"), col("run_max"))
      .orderBy(col("event_id")).collect().map(_.toSeq.map(String.valueOf))
    val pass = StatefulQueries.runningMaxSecondarySortOf(events)
      .collect().map(_.toSeq.map(String.valueOf)) // stringly: NaN == NaN must hold
    assert(pass.toSeq === declarative.toSeq)
    // and the NaN actually dominated: every later 2021 row reports NaN
    val m = pass.map(r => r.head -> r(2)).toMap
    assert(m("4") == "NaN" && m("2") == "NaN")
  }

  test("q3p: per-month running max keeps a NaN maximum") {
    val ev = events
      .withColumn("yr", year(col("ts")).cast("long"))
      .withColumn("mon", month(col("ts")).cast("long"))
    val declarative = KeyedOps.runningMax(ev, Seq(col("yr"), col("mon")),
        Seq(col("ts_ns"), col("event_id")), col("value"), "run_max")
      .select(col("event_id"), col("yr"), col("mon"), col("run_max"))
      .orderBy(col("event_id")).collect().map(_.toSeq.map(String.valueOf))
    val pass = StatefulQueries.runningMaxMonthSecondarySortOf(events)
      .collect().map(_.toSeq.map(String.valueOf))
    assert(pass.toSeq === declarative.toSeq)
  }

  test("q4p: a NaN value counts as a threshold breach, like SQL value >= 100") {
    val declarative = KeyedOps.thresholdGaps(events, Seq(col("event_type")),
        Seq(col("ts_ns"), col("event_id")), col("value"), 100.0, "gap")
      .select(col("event_id"), col("event_type"), col("gap"))
      .orderBy(col("event_id")).collect().map(_.toSeq)
    val pass = StatefulQueries.thresholdGapsSecondarySortOf(events)
      .collect().map(_.toSeq)
    assert(pass.toSeq === declarative.toSeq)
    // the NaN row (id 5) must itself appear as a breach
    assert(pass.exists(_.head == 5L))
  }
}
