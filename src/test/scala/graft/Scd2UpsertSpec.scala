package graft

import org.apache.spark.sql.functions._
import graft.operators.StatefulQueries

/** The SCD2 MERGE maintenance's contract, pinned on a hand-built CDC
  * fixture: cross-batch interval closing, equivalence with the global
  * lead() construction, and IDEMPOTENT REPLAY (re-applying a batch after
  * a simulated failure converges to the identical journal — the q12fb
  * foreachBatch discipline applied to a keyed table). */
class Scd2UpsertSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("event_id"), col("value"),
              col("valid_from_us"), col("valid_to_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
                 if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSet

  test("scd2 upsert: MERGE closes open intervals across batches and replay is idempotent") {
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("scd2-spec-").toString
    def b(rows: Seq[(Long, Long, Double, Long)]) =
      rows.toDF("user_id", "event_id", "value", "us")
    // batch 0: user 1 changes twice, user 2 once; batch 1: user 1 changes
    // again (must close the batch-0 open interval), user 3 appears
    val b0 = b(Seq((1L, 0L, 5.0, 100L), (1L, 1L, 6.0, 200L), (2L, 2L, 7.0, 150L)))
    val b1 = b(Seq((1L, 3L, 8.0, 300L), (3L, 4L, 9.0, 400L)))
    try {
      StatefulQueries.applyScd2Batch(spark, outDir, b0, 0L)
      StatefulQueries.applyScd2Batch(spark, outDir, b1, 1L)
      val expected = Set(
        (1L, 0L, 5.0, 100L, Some(200L)),  // closed inside batch 0
        (1L, 1L, 6.0, 200L, Some(300L)),  // OPEN in v=0, closed BY batch 1
        (1L, 3L, 8.0, 300L, None),
        (2L, 2L, 7.0, 150L, None),
        (3L, 4L, 9.0, 400L, None))
      val afterB1 = rowsOf(
        StatefulQueries.scd2VersionBefore(spark, outDir, Long.MaxValue).get)
      assert(afterB1 == expected)
      // v=0 really wrote (1,1) open — the close is cross-batch, not vacuous
      val v0 = rowsOf(spark.read.parquet(s"$outDir/v=0"))
      assert(v0.contains((1L, 1L, 6.0, 200L, None)))
      // simulated failure + retry: re-apply batch 1; the journal must
      // converge to the identical table (merge reads the version BELOW
      // the batch id and overwrites the batch's own directory)
      StatefulQueries.applyScd2Batch(spark, outDir, b1, 1L)
      val replayed = rowsOf(
        StatefulQueries.scd2VersionBefore(spark, outDir, Long.MaxValue).get)
      assert(replayed == expected)
    } finally {
      StatefulQueries.deleteRecursively(java.nio.file.Paths.get(outDir))
    }
  }

  test("scd2 upsert snapshot: registered form equals the read-side as-of snapshot") {
    val a = graft.operators.Relational.scd2AsofSnapshot(spark, Sf0001)
    val u = StatefulQueries.scd2UpsertSnapshot(spark, Sf0001)
    assert(a.exceptAll(u).count() == 0 && u.exceptAll(a).count() == 0)
  }

  test("temporal join on the UPDATING dim: a mid-stream upsert flips a later batch's match") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.lead
    val out = StatefulQueries.temporalJoinUpdatingDim(spark, Sf0001).cache()
    try {
      // rebuild the journal's two versions from the raw events: v0 =
      // per-user lead over ids <= the events median (its last change per
      // user still OPEN — the pre-upsert belief), v1 = the global lead
      val ev = graft.io.Tables.events(spark, Sf0001)
        .select(col("user_id"), col("event_id"), col("value"),
                org.apache.spark.sql.functions.expr("ts_ns div 1000").as("us"))
      val mid = ev.agg(org.apache.spark.sql.functions.max(col("event_id")))
        .head().getLong(0) / 2
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val v0 = ev.filter(col("event_id") <= mid)
        .withColumn("t", lead(col("us"), 1).over(w))
        .select(col("user_id").as("d_user"), col("value").as("v"),
                col("us").as("f"), col("t"))
      def joinedTo(dim: org.apache.spark.sql.DataFrame, probes: org.apache.spark.sql.DataFrame) =
        probes.join(dim,
          col("user_id") === col("d_user") && col("f") < col("us") &&
            (col("t").isNull || col("t") >= col("us")), "left")
      // batch 0 ran BEFORE the upsert: every registered match must equal
      // the frozen-v0 answer
      val b0 = out.filter(col("dim_version") === 0)
        .select(col("user_id"), col("event_id"), col("us"), col("as_of_value"))
      assert(joinedTo(v0, b0)
        .filter(col("v").isNull || col("v") =!= col("as_of_value"))
        .count() === 0L, "a batch-0 probe diverged from the frozen v0 dimension")
      // batch 1 ran AFTER: at least one registered match must DIFFER from
      // what the frozen v0 would have answered — the mid-stream version
      // flip (same user, different as_of_value across dim versions)
      val b1 = out.filter(col("dim_version") === 1)
        .select(col("user_id"), col("event_id"), col("us"), col("as_of_value"))
      val flips = joinedTo(v0, b1)
        .filter(col("v").isNull || col("v") =!= col("as_of_value")).count()
      assert(flips > 0,
        "no batch-1 match differs from the frozen-v0 answer — the updating dim is vacuous on this replay")
      // both batches contributed rows (the replay genuinely split)
      assert(b0.count() > 0 && b1.count() > 0)
    } finally out.unpersist()
  }

  test("bitemporal snapshot: belief revisions exist and untouched users agree with the final as-of") {
    val bt = StatefulQueries.scd2BitemporalSnapshot(spark, Sf0001)
      .select(col("user_id"), col("event_id").as("bt_ev"))
    val af = StatefulQueries.scd2UpsertSnapshot(spark, Sf0001)
      .select(col("user_id"), col("event_id").as("af_ev"))
    // both snapshot every user active by the cut
    assert(bt.count() === af.count())
    val j = bt.join(af, "user_id").cache()
    // BELIEF REVISIONS are the point: some users' believed-at-v0 row
    // differs from the final-knowledge row (probed: 10 of 15 at sf0.001)
    val revised = j.filter(col("bt_ev") =!= col("af_ev")).count()
    assert(revised > 0, "no belief revision — the bitemporal axis is vacuous here")
    // and NOT everyone revised: the agreeing users pin that the two
    // snapshots share the identical valid-time cut rule
    assert(j.filter(col("bt_ev") === col("af_ev")).count() > 0)
    j.unpersist()
  }

  test("cdc feed replay reconstructs the maintained table (global lead intervals)") {
    val feed = StatefulQueries.scd2CdcFeed(spark, Sf0001)
    val inserts = feed.filter(col("op") === "insert").drop("op")
    val closes = feed.filter(col("op") === "close")
      .select(col("user_id").as("cu"), col("event_id").as("ce"),
              col("valid_to_us").as("close_to"))
    // a consumer tailing the feed: upsert the close rows over the inserts
    val reconstructed = inserts
      .join(closes,
        col("user_id") === col("cu") && col("event_id") === col("ce"),
        "left_outer")
      .select(col("user_id"), col("event_id"), col("value"),
              col("valid_from_us"),
              coalesce(col("close_to"), col("valid_to_us")).as("valid_to_us"))
    assert(rowsOf(reconstructed) ===
      rowsOf(graft.operators.Relational.scd2UserValues(spark, Sf0001)))
    // a close always terminates: its new valid_to is never null
    assert(feed.filter(col("op") === "close" && col("valid_to_us").isNull)
      .count() === 0L)
  }

  test("scd2 snapshot diff agrees with two independently rebuilt as-of states") {
    val diff = graft.operators.Relational.scd2SnapshotDiff(spark, Sf0001)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("status"), r.getAs[Double]("value_t1"),
         r.getAs[Double]("value_t2"))).toMap
    // rebuild both snapshots locally from the raw events
    val ev = graft.io.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("value"),
              expr("ts_ns div 1000").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val minUs = ev.map(_._4).min; val maxUs = ev.map(_._4).max
    val cut1 = minUs + (maxUs - minUs) / 4
    val cut2 = minUs + (maxUs - minUs) * 3 / 4
    def snap(cut: Long): Map[Long, Double] = ev.groupBy(_._1).flatMap {
      case (u, g) =>
        val live = g.filter(_._4 <= cut)
        if (live.isEmpty) None
        else Some(u -> live.maxBy(e => (e._4, e._2))._3)
    }
    val (s1, s2) = (snap(cut1), snap(cut2))
    val expect = (s1.keySet ++ s2.keySet).flatMap { u =>
      (s1.get(u), s2.get(u)) match {
        case (None, Some(v2))                      => Some(u -> (("added", -1.0, v2)))
        case (Some(v1), None)                      => Some(u -> (("removed", v1, -1.0)))
        case (Some(v1), Some(v2)) if v1 != v2      => Some(u -> (("changed", v1, v2)))
        case _                                     => None
      }
    }.toMap
    assert(diff == expect)
    // the diff is non-trivial on this fixture: values do change mid-tape
    assert(diff.values.exists(_._1 == "changed"))
  }
}
