package graft

import org.apache.spark.sql.functions._

/** Streaming sources/sinks beyond the file source: the built-in `rate`
  * source (an unbounded generator — the no-external-service stand-in for a
  * Kafka-shaped feed) and the `foreachBatch` sink (the production pattern
  * for routing micro-batches into arbitrary batch writers). */
class StreamSourcesSpec extends SparkSpec {

  test("rate source feeds a streaming aggregation end to end") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500")
      .load() // schema: (timestamp, value)
    val agg = rate
      .withColumn("bucket", pmod(col("value"), lit(4)))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"), max(col("value")).as("max_v"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("rate_out").start()
    try {
      // wait until at least one non-empty batch lands
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("rate_out").isEmpty && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val rows = spark.table("rate_out").collect()
      assert(rows.nonEmpty, "rate source produced no aggregated output in 30s")
      assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    } finally q.stop()
  }

  test("socket source: q1k matches the stateful batch twin bit for bit") {
    // the push-based, non-replayable ingest path produces the exact rows of
    // the batch form — the Double.toString → cast text round-trip loses no
    // bits, and per-key ord order survives TCP + chunking
    val sock = graft.operators.StatefulQueries.runningMaxSocketStream(spark, Sf0001)
    val batch = graft.operators.StatefulQueries.runningMaxStateful(spark, Sf0001)
    assert(sock.count() === batch.count())
    assert(sock.exceptAll(batch).isEmpty && batch.exceptAll(sock).isEmpty)
  }

  test("socket drain: chunks land in distinct micro-batches and fold through keyed state") {
    import spark.implicits._
    import graft.streaming.StatefulOps
    var dataBatches = 0
    var srcDesc = ""
    // chunk 2's (a,2,3.0) must see chunk 1's max 5.0 from the STATE STORE —
    // the observation barrier guarantees chunk 1's batch committed first
    val out = graft.operators.StatefulQueries.drainSocket(spark,
        Seq(Seq("a,1,5.0", "b,1,9.0"), Seq("a,2,3.0")), Seq(2L, 3L)) { stream =>
      StatefulOps.runningMax(stream.select(split(col("value"), ",").as("f"))
        .select(col("f").getItem(0).as("key"),
                col("f").getItem(1).cast("long").as("ord"),
                col("f").getItem(2).cast("double").as("value"))
        .as[StatefulOps.KV]).toDF()
    } { q =>
      q.processAllAvailable()
      dataBatches = q.recentProgress.count(_.numInputRows > 0)
      srcDesc = q.lastProgress.sources.head.description
    }
    assert(dataBatches >= 2, s"expected >=2 data micro-batches, saw $dataBatches")
    assert(srcDesc.toLowerCase.contains("socket"), srcDesc)
    val byKey = out.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(byKey(("a", 1L)) === 5.0 && byKey(("b", 1L)) === 9.0)
    assert(byKey(("a", 2L)) === 5.0) // cross-batch state, not per-batch max
  }

  test("streaming dedup: content-hash dropDuplicates holds state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("fp", graft.functions.TextFunctions.fingerprintMd5(col("text")))
      .dropDuplicates("fp") // keyed state on the content hash — incremental exact dedup
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      mem.addData((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      q.processAllAvailable()
      // a duplicate arriving in a LATER batch must also be dropped (state, not
      // per-batch distinct) — and a case-variant collapses via canonicalization
      mem.addData((4L, "ALPHA BETA"), (5L, "epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
    // doc 3 (same-batch dup) and doc 4 (cross-batch dup modulo lower/trim) dropped
    assert(out.sameElements(Array(1L, 2L, 5L)), out.mkString(","))
  }

  test("quality scoring and language ID run unchanged on a stream") {
    // the corpus gates are pure projections (no sort, no shuffle), so the
    // SAME operator bodies lift to readStream without modification — batch
    // and streaming verdicts must agree row for row
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.operators.TextOps.qualityScoredOf(mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("qs_out").start()
    val docs = Seq(
      (1L, "the cat sat on a mat and the dog slept near the door"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "short"))
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qs_out").collect().map(_.toSeq).toSet
    val batch = graft.operators.TextOps.qualityScoredOf(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 3)
  }

  test("foreachBatch sink routes micro-batches into a batch parquet writer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // any batch-side op is legal here — aggregate then append
        batch.groupBy(col("id")).agg(sum(col("v")).as("sum_v"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      mem.addData((2L, 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
    // batch 0: id 1 -> 3.0, id 2 -> 5.0; batch 1: id 2 -> 7.0
    val sums = out.groupBy(col("id")).agg(sum(col("sum_v")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sums === Map(1L -> 3.0, 2L -> 12.0))
    assert(out.select("batch_id").distinct().count() === 2)
  }
}
