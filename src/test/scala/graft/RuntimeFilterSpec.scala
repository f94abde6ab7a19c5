package graft

import org.apache.spark.sql.functions._

/** The runtime bloom-filter join WITNESS: at 100 TB the dominant cost of a
  * selective fact × filtered-dim shuffle join is shuffling fact rows that
  * the dim filter will discard on the other side. Catalyst's
  * InjectRuntimeFilter closes exactly that gap — it aggregates the
  * filtered creation side into a bloom filter and plants a
  * `might_contain` predicate on the fact side BELOW its shuffle, so
  * non-matching fact rows die map-side instead of crossing the wire. The
  * rule's size gates are tuned for clusters (creation side < 10 MB,
  * application side > 10 GB), so this spec scales them to test data — at
  * the target scale the DEFAULTS make the same decision — and asserts
  * both the injected predicate and answer preservation.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("InjectRuntimeFilter plants a bloom might_contain on the fact side of a selective dim join") {
    val confs = Seq(
      // force the shuffle join the rule exists to protect (a broadcast
      // join already prunes probe-side rows against the full hash table)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the 10 GB application-side gate exists so small scans skip the
      // bloom build cost; test data is the small scan, so open the gate
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.io.Tables.lineitem(spark, Sf0001)
      val part = graft.io.Tables.part(spark, Sf0001)
      // one brand ≈ 1/25 of parts: selective enough that the rule's
      // filterCreationSide check accepts the dim side
      val dim = part.filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"), col("p_brand"))
      val joined = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val rows = joined.collect()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("might_contain"),
        s"no bloom runtime filter injected:\n${planStr.take(3000)}")
      // answer preservation: the bloom is a pre-filter, never a decider —
      // recompute with the rule off and compare exactly
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expect = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .collect()
      assert(rows.toSeq === expect.toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
