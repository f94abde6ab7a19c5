package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe for the r20 OPTIMIZATION round: decompose where the streaming
  * drains' wall time actually goes BEFORE building any state-store
  * machinery (guide §1 measure first). The r19 verdict's top ask is an
  * in-memory state store provider for the Trigger.AvailableNow drains,
  * premised on "per-micro-batch state-store commit I/O is the floor" — but
  * the same round's tmpfs-checkpoint probe measured ±0, which contradicts
  * that premise (state deltas live under the checkpoint dir). This probe
  * settles it: a session-level StreamingQueryListener captures every
  * micro-batch's QueryProgressEvent for the UNMODIFIED registered queries,
  * printing durationMs (triggerExecution / queryPlanning / addBatch /
  * walCommit / commitOffsets / getBatch / latestOffset) and each state
  * operator's commitTimeMs / allUpdatesTimeMs — so the provider-swap
  * decision is made from the measured commit share, not the hypothesis.
  * Usage: Test/runMain graft.operators.ProbeDrainBreakdown [sfDir] [reps] [q1,q2,..]
  */
object ProbeDrainBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val queries = args.drop(2).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q1r_running_max_streaming", "dedup_exact_ttl_streaming",
                     "q23ss_interval_join_streaming"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val progresses = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progresses.add(e.progress.json)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    // warm the streaming machinery once (codegen, state schema paths)
    graft.SparkEntry.queries("q1r_running_max_streaming")(spark, sfDir).count()
    progresses.clear()

    for (q <- queries; rep <- 1 to reps) {
      progresses.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(s"===== $q rep $rep wall=${f"$wall%.3f"}s =====")
      progresses.forEach(p => println(p))
    }
    spark.stop()
  }
}
