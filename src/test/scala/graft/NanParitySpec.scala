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

  // the fMGWS twins (q1s/q3s/q4s — and through them q1r/q4r and the TWS
  // forms' parity spec) fold with JVM comparisons; these pin them to the
  // same SQL NaN-greatest rule as the declarative and secondary-sort forms
  private def kvFixture = {
    import graft.streaming.StatefulOps.KV
    Seq(KV("a", 1L, 10.0), KV("a", 2L, Double.NaN), KV("a", 3L, 250.0),
        KV("a", 4L, 7.0), KV("b", 1L, 120.0), KV("b", 2L, Double.NaN)).toDS()
  }

  test("q1s: fMGWS running max keeps a NaN maximum, like the window twin") {
    import graft.streaming.StatefulOps
    val got = StatefulOps.runningMax(kvFixture).collect()
      .map(r => (r.key, r.ord) -> String.valueOf(r.out)).toMap
    // NaN at ord 2 dominates every later record of key a
    assert(got(("a", 1L)) == "10.0")
    assert(got(("a", 2L)) == "NaN" && got(("a", 3L)) == "NaN" && got(("a", 4L)) == "NaN")
    assert(got(("b", 2L)) == "NaN")
  }

  test("q3s: fMGWS subkey max keeps a NaN maximum") {
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.KSV
    val data = Seq(KSV("y", "m1", 1L, 5.0), KSV("y", "m1", 2L, Double.NaN),
                   KSV("y", "m1", 3L, 9.0), KSV("y", "m2", 4L, 3.0)).toDS()
    val got = StatefulOps.runningMaxBySubkey(data).collect()
      .map(r => r.ord -> String.valueOf(r.out)).toMap
    assert(got(2L) == "NaN" && got(3L) == "NaN")
    assert(got(4L) == "3.0") // other subkey untouched
  }

  test("q4s: fMGWS threshold gaps treat NaN as a breach, like q4p and the TWS twin") {
    import graft.streaming.StatefulOps
    val got = StatefulOps.thresholdGaps(kvFixture, 100.0).collect()
      .map(r => (r.key, r.ord, r.gap)).sortBy(r => (r._1, r._2))
    // key a: NaN at ord 2 breaches after one sub-threshold row; 250 at
    // ord 3 follows immediately (gap 0). key b: 120 breaches with gap 0,
    // NaN breaches with gap 0.
    assert(got === Seq(("a", 2L, 1L), ("a", 3L, 0L),
                       ("b", 1L, 0L), ("b", 2L, 0L)))
  }
}
