package graft

/** The q1s–q4s one-pass fMGWS forms: the plan must supply group order (the
  * injected repartition + (key, ord) sort survive into the group exec with
  * no extra exchange/sort), and the lazy folds must equal the declarative
  * window twins row for row. A plan regression here would silently re-order
  * rows inside groups — caught by BOTH the shape pins and the value
  * equalities (and by the per-query oracles in the gate). */
class OrderedStatefulSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString

  test("q1s plan: grouping reuses the injected partitioning and (key, ord) sort") {
    val p = plan("q1s_running_max_stateful")
    // exactly two exchanges: the injected repartition(key) and the final
    // global orderBy — a third would be the group exec re-shuffling
    assert("Exchange ".r.findAllIn(p).size === 2, p)
    // no engine-inserted key-only local sort (it would not be order-stable
    // within keys); the injected (key, ord) local sort must be present
    assert(raw"Sort \[key#\d+ ASC NULLS FIRST\], false".r.findAllIn(p).isEmpty, p)
    assert(raw"Sort \[key#\d+ ASC NULLS FIRST, ord#\d+L? ASC NULLS FIRST\], false"
      .r.findAllIn(p).nonEmpty, p)
  }

  test("ordered one-pass forms equal their declarative window twins") {
    for ((s, twin) <- Seq(
        ("q1s_running_max_stateful", "q1_running_max"),
        ("q2s_block_avg_stateful", "q2_block_avg"),
        ("q3s_running_max_month_stateful", "q3_running_max_month"),
        ("q4s_threshold_gaps_stateful", "q4_threshold_gaps"))) {
      val got = SparkEntry.queries(s)(spark, Sf0001).collect().map(_.toSeq).toSeq
      val exp = SparkEntry.queries(twin)(spark, Sf0001).collect().map(_.toSeq).toSeq
      assert(got === exp, s"$s diverges from $twin")
      assert(got.nonEmpty, s)
    }
  }
}
