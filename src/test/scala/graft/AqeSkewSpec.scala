package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.ShuffledJoin
import org.apache.spark.sql.functions._

/** The AQE skew-join WITNESS: SCALING.md's q6/q26 rows name "AQE skew-join
  * split" as the hot-key mitigation for the fact-fact shuffle joins, and an
  * untested mitigation is a hope, not a design. This spec builds a join
  * whose left side funnels 3/4 of its rows into ONE key, lowers the skew
  * thresholds to bench-data sizes (at 100 TB the DEFAULT thresholds play
  * this role — 256 MB partitions against a ~64 MB advisory), and asserts
  * from the executed adaptive plan that `OptimizeSkewedJoin` actually
  * replanned the join (`isSkewJoin`) AND that the split did not change the
  * answer. The manual salted aggregation (q20, Skew.scala) remains the
  * deterministic fallback for aggregations, where AQE's splitter does not
  * apply.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot-key partition of a shuffled join (OptimizeSkewedJoin fires)") {
    val confs = Seq(
      // force a shuffled join: both broadcast paths off (the planner's and
      // AQE's runtime rewrite), or the skew splitter has nothing to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale the skew detector to test-sized data: a partition is skewed
      // when it exceeds factor x median AND the byte threshold; the
      // advisory size is the split target
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 400k rows over 8 map partitions; ids < 300k all collapse onto key 0
      // (the hot customer), the rest keep distinct keys — so one reduce
      // partition carries >= 3/4 of the bytes while the median is tiny.
      // Every key matches exactly one right row, so the expected join
      // cardinality is the left count: a lost or doubled split shows up as
      // a wrong count, not just a missing plan node.
      val left = spark.range(0, 400000L, 1, 8)
        .select(when(col("id") < 300000L, 0L).otherwise(col("id")).as("k"),
                col("id").as("v"))
      val right = spark.range(0, 400000L, 1, 8)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() executes (and finalizes) the join frame's own adaptive
      // plan — count() would plan a separate aggregate query
      assert(joined.collect().length === 400000)
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an AdaptiveSparkPlanExec root"))
      assert(adaptive.isFinalPlan, "the adaptive plan did not finalize")
      // the executed plan is a tree of QUERY STAGES (leaf nodes hiding their
      // subtrees from collect) — flatten through them to reach the join
      def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case q: QueryStageExec => flatten(q.plan)
        case other             => other.children.flatMap(flatten)
      })
      val skewJoins = flatten(adaptive.executedPlan).collect {
        case j: ShuffledJoin if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"OptimizeSkewedJoin did not fire; final plan:\n${adaptive.executedPlan}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
