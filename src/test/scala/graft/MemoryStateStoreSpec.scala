package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Focused gate for the r20 drain state-store swap: every state shape the
  * memory-sink drains route through GraftMemoryStateStoreProvider must
  * produce EXACTLY the engine-default provider's rows — the provider is an
  * I/O-layer change and may not alter a single value. One representative
  * query per state shape:
  *  - flatMapGroupsWithState keyed fold (q1r)
  *  - event-time TTL expiry through watermark eviction (dedup ttl)
  *  - stream-stream symmetric hash join, 4 stores per partition per side (q23ss)
  *  - session-window aggregation, the PREFIX-SCAN store (q13ns)
  *  - windowed aggregation with watermark-closed emission (dau closed)
  * Also pins the pinned-provider guard: a drain under
  * withRocksDbStateStore must NOT be re-routed to the memory provider
  * (the *_rocksdb twins are the production-provider honesty gate). */
class MemoryStateStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def compare(query: String): Unit = {
    spark.conf.set("spark.graft.drain.stateStoreProvider", "engine")
    val engine = try rowsOf(SparkEntry.queries(query)(spark, sfDir))
    finally spark.conf.unset("spark.graft.drain.stateStoreProvider")
    // default mode = memory provider
    val memory = rowsOf(SparkEntry.queries(query)(spark, sfDir))
    assert(memory == engine, s"$query: memory-provider rows diverge from engine provider")
    assert(memory.nonEmpty, s"$query: vacuous comparison")
  }

  test("fMGWS keyed fold: q1r identical on both providers") {
    compare("q1r_running_max_streaming")
  }

  test("event-time TTL eviction: identical on both providers") {
    compare("dedup_exact_ttl_streaming")
  }

  test("stream-stream join state: q23ss identical on both providers") {
    compare("q23ss_interval_join_streaming")
  }

  test("session-window prefix-scan state: q13ns identical on both providers") {
    compare("q13ns_sessionize_native_streaming")
  }

  test("watermark-closed windowed aggregation: identical on both providers") {
    compare("dau_daily_closed_streaming")
  }

  test("pinned RocksDB drains stay on RocksDB (provider guard)") {
    // the rocksdb twin pins the provider BEFORE the drain; the drain hook
    // must see a non-default provider and leave it alone — proven by the
    // query running green (the memory provider would throw on the TWS
    // path) and by the conf being restored afterwards
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    SparkEntry.queries("q1rdb_running_max_rocksdb")(spark, sfDir).count()
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass") == before,
      "provider conf leaked out of the RocksDB twin")
  }
}
