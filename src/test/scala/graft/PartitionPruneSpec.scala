package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The hive-partition-pruning WITNESS: at 100 TB the cheapest file is the
  * one never opened, and directory-partitioned layout (`partitionBy` on
  * write) is the coarsest and cheapest pruning lever — the filter becomes
  * a PartitionFilter resolved against directory names, so non-matching
  * partitions cost zero I/O, zero footer reads, zero tasks. This spec
  * writes the events table partitioned by event_type, queries one type,
  * and asserts from the EXECUTED scan that (a) the predicate landed in
  * PartitionFilters and (b) the scan touched exactly the matching
  * partition's files — plus answer equality with the unpartitioned scan.
  */
class PartitionPruneSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec        => flatten(q.plan)
    case other                    => other.children.flatMap(flatten)
  })

  test("partitionBy layout: one-type query prunes to that partition's files at the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-partprune-").toString
    try {
      graft.io.Tables.events(spark, Sf0001)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      val q = spark.read.parquet(dir)
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      val got = q.collect().head
      // semantics: pruning is a cost lever, never a decider
      val expect = graft.io.Tables.events(spark, Sf0001)
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
        .collect().head
      assert(got === expect)
      val scan = flatten(q.queryExecution.executedPlan).collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
      val scanStr = scan.toString
      assert(scanStr.contains("PartitionFilters: [isnotnull(event_type"), scanStr)
      assert(scanStr.contains("= click"), scanStr)
      // the I/O claim, from the executed scan's own metrics: files touched
      // == files physically under the matching partition directory, and
      // strictly fewer than the table's total
      val clickFiles = {
        val d = new java.io.File(s"$dir/event_type=click")
        d.listFiles().count(f => f.getName.endsWith(".parquet"))
      }
      val totalFiles = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("event_type="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
      assert(scan.metrics("numFiles").value === clickFiles.toLong, scanStr)
      assert(clickFiles < totalFiles,
        s"fixture produced a single partition — the prune is vacuous ($clickFiles/$totalFiles)")
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
