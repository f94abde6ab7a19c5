package graft

/** Physical-plan regression checks: the properties that make these queries
  * scale are asserted, not assumed (SURVEY.md §4; SCALING.md). */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, Sf0001)
    df.queryExecution.executedPlan.toString
  }

  /** Exchanges contributed by [[graft.io.Tables.spreadIfNarrow]] for a given
    * input shape — computed from the SAME decision the operators make, so the
    * exchange-count pins below hold on any core count / input split count
    * (on a runner whose parallelism doesn't exceed the scan's splits the
    * spread repartition self-elides and contributes zero). */
  private def spreadCount(df: org.apache.spark.sql.DataFrame,
                          key: org.apache.spark.sql.Column): Int =
    if (graft.io.Tables.spreadIfNarrow(df, key) ne df) 1 else 0

  private lazy val docSpread: Int = {
    import org.apache.spark.sql.functions.col
    spreadCount(graft.io.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text")), col("doc_id"))
  }

  private lazy val splitSpread: Int = {
    import org.apache.spark.sql.functions.col
    spreadCount(graft.io.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang"), col("source")), col("doc_id"))
  }

  test("q8: all three filters reach the parquet scan; schema pruned to 3 columns") {
    val p = plan("q8_filtered_revenue")
    // the plan string elides long filter lists, so probe for the markers
    assert(p.contains("PushedFilters: [IsNotNull(l_discount), IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_discount,0.05)"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double>"), p)
  }

  test("q27: single-table predicates push to every scan; top-10 is TakeOrdered") {
    val p = plan("q27_shipping_priority")
    // segment equality and both timestamp bounds reach the parquet readers
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("LessThan(o_orderdate,"), p)
    assert(p.contains("GreaterThan(l_shipdate,"), p)
    // the global top-k on the aggregate never plans a full sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q6: the nation dimension joins via broadcast") {
    val p = plan("q6_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q6: null join keys are filtered AT THE SCANS (the null-skew guard)") {
    // at 100 TB, null join keys all hash to one reducer — the classic
    // silent-skew flood. For inner equi-joins Catalyst inserts
    // isnotnull(key) constraints and pushes them into the parquet readers,
    // so null-key rows die at the scan instead of flooding a partition.
    // Pin that this actually reaches the fact scans' pushed filters.
    val p = plan("q6_revenue_by_nation")
    assert(p.contains("IsNotNull(l_orderkey)"), p)
    assert(p.contains("IsNotNull(o_custkey)"), p)
  }

  test("q1: exactly one hash exchange (the keyBy) before the global sort") {
    val p = plan("q1_running_max")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, p)
  }

  test("spreadIfNarrow: no exchange on a pre-split input; spreads a narrow scan") {
    import org.apache.spark.sql.functions.col
    import graft.io.Tables
    val wide = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text"))
      .repartition(2 * spark.sparkContext.defaultParallelism)
    assert(Tables.spreadIfNarrow(wide, col("doc_id")) eq wide)
    val narrow = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
    // the scan is only "narrow" when the runner has more slots than splits
    assume(narrow.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    assert(Tables.spreadIfNarrow(narrow, col("doc_id")) ne narrow)
  }

  test("bucketed tables: same-bucketing join plans with zero exchanges") {
    import org.apache.spark.sql.functions.col
    import graft.io.Tables
    val s = spark
    val o = Tables.orders(s, Sf0001).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(s, Sf0001).select("l_orderkey", "l_quantity")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge join path
    try {
      Tables.saveBucketed(o, "b_orders", 8, Seq("o_orderkey"))
      Tables.saveBucketed(li, "b_lineitem", 8, Seq("l_orderkey"))
      val j = s.table("b_orders").join(s.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(j.count() === li.count()) // co-located plan, same join result
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("text_stats: no shuffle beyond the local spread; scan reads only doc_id and text") {
    val p = plan("text_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // the small-file spread repartition is the only hash exchange (+ the
    // output sort's range exchange); zero when the spread self-elides
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === docSpread, p)
  }

  test("doc_sim_df_stats: join-free — strictly cheaper than the self-join it instruments") {
    val p = plan("doc_sim_df_stats")
    // the observable must never cost what it observes: no join anywhere
    // (the instrumented operator's cost IS its term self-join), and the
    // scan reads only the two columns the shared tf derivation needs
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // ONE hash exchange (the th df shuffle) plus the optional spread: the
    // stats prune tf's count, so Catalyst plans the (doc,th) dedup as a
    // PARTIAL-ONLY local aggregate — legal because every (doc,th) copy
    // originates from exploding one doc row and is co-resident — and the
    // tf exchange the similarity join pays disappears entirely here
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1 + docSpread, p)
  }

  test("vocab_topk plans the global top-k as TakeOrdered, not a full sort") {
    val p = plan("vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort exchange:\n$p")
  }

  test("curation_manifest: exactly one range exchange — the final presentation sort") {
    // the unsorted-core composition claim: no ingredient pays a sort below a
    // join; the only rangepartitioning in the whole composed plan is the
    // manifest's own ORDER BY doc_id
    val p = plan("curation_manifest")
    val rangeExchanges = "Exchange rangepartitioning".r.findAllIn(p).length
    assert(rangeExchanges === 1, p)
  }

  test("split_stratified: the stratum window is the only shuffle beyond the local spread") {
    val p = plan("split_stratified")
    // the (lang, source) window partitioning plus the small-file spread
    // (which vanishes on pre-split inputs and low-core runners)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1 + splitSpread, p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>"), p)
  }

  test("rep_stats is a single-scan projection — the per-row HOFs never shuffle") {
    val p = plan("rep_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === docSpread, p) // the local small-file spread only
    assert(!p.contains("Join"), p)
  }

  test("q24_pivot: full-data shuffle once, then pivotfirst over cell-sized rows") {
    val p = plan("q24_pivot")
    // Spark's two-phase pivot: the (returnflag, linestatus) sum reduces the
    // table to ≤6 cells before the pivot's own exchange — so only the FIRST
    // of the two hash exchanges ever carries data proportional to the input,
    // and no driver-side distinct-collect pass exists (values are explicit)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 2, p)
    assert(p.contains("partial_sum"), p)      // map-side combine on the big agg
    assert(p.contains("pivotfirst"), p)       // the cell-sized pivot phase
  }

  test("q25_unpivot plans as a zero-shuffle Expand projection") {
    val p = plan("q25_unpivot")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_size:int,p_retailprice:double>"), p)
  }

  test("pack_assign/pack_segments: two-level prefix sum — chunk window + tiny offset table") {
    // pack_segments adds only a per-doc explode over the same prefix sums,
    // so BOTH must keep the identical exchange profile
    for (name <- Seq("pack_assign", "pack_segments")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name:\n$p")
      // chunk window + chunk-totals agg; the corpus NEVER crosses a single
      // partition — only the chunk-count-sized offset table does
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges === 2, s"$name:\n$p")
      assert("Exchange SinglePartition".r.findAllIn(p).length === 1, s"$name:\n$p")
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"$name:\n$p")
    }
  }

  test("mm_media_meta: the scan reads ONLY doc_id — synthesis+decode never drag text") {
    val p = plan("mm_media_meta")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
    // pure mapPartitions pipeline: no shuffle before the presentation sort
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("contamination_external: fingerprint-bucketed joins, no quadratic join shapes") {
    val p = plan("contamination_external")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // train x eval candidates come from fingerprint collisions, never from
    // an unconstrained pair enumeration
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("token_rarity: corpus counts rejoin the token stream via broadcast") {
    val p = plan("token_rarity")
    // the vocabulary-sized counts ride a broadcast back onto the token
    // stream — a sort-merge join here would shuffle the full token stream
    // a second time on th
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("token_rarity_sketch: the scoring pass is join-free — the matrix rides the expression") {
    // the open-vocabulary form's whole point: the exact form's
    // vocabulary-sized counts broadcast (and its hash join) is replaced by
    // a constant-size frozen matrix probed inside the projection, so the
    // RETURNED plan is scan → estimate projection → per-doc agg → sort,
    // with no join of any kind (pass 1's fold already ran at build time,
    // control-plane style, like the k-means trainer)
    val p = plan("token_rarity_sketch")
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // exactly ONE hash exchange either way: with the small-file spread the
    // per-doc agg REUSES its doc_id partitioning (no ENSURE_REQUIREMENTS
    // exchange at all); without it the agg inserts its own
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, p)
  }

  test("funnel_steps: three stacked window steps and the final agg share ONE user exchange") {
    // the sequence-analytics claim: each funnel step conditions on the
    // previous step's per-partition constant, so all three conditional
    // minima AND the per-user aggregate reuse a single hash partitioning —
    // the triple-self-join formulation would shuffle the event stream
    // three times and explode on hot users
    val p = plan("funnel_steps")
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, p)
  }

  test("lm_bigram_score_sketch: the scoring pass is join-free — both matrices ride the expression") {
    // an exact-counts formulation would need TWO vocabulary joins (bigram
    // + context), the bigram side quadratically worse than token_rarity's;
    // the sketch form probes two frozen constant-size matrices inside the
    // projection instead, so the returned plan has no join of any kind and
    // exactly the per-doc aggregation exchange
    val p = plan("lm_bigram_score_sketch")
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, p)
  }

  test("bm25_topdocs: the query-term prune and df stats ride broadcasts; top-k is TakeOrdered") {
    val p = plan("bm25_topdocs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bm25_topdocs: every th-keyed shuffle sits ABOVE the query-term broadcast prune") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // the df aggregate used to group the FULL per-doc-distinct token stream
    // (vocabulary-keyed shuffle) and filter to query terms afterwards —
    // Catalyst cannot push the semi-join below a distinct+aggregate, so the
    // prune must be written below the aggregates. Pin: any exchange that
    // hash-partitions on the token column must have the broadcast query-term
    // join somewhere beneath it, i.e. it only ever shuffles pruned rows.
    val exec0 = SparkEntry.queries("bm25_topdocs")(spark, Sf0001)
      .queryExecution.executedPlan
    val exec = exec0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val thShuffles = exec.collect {
      case s: ShuffleExchangeExec if (s.outputPartitioning match {
        case h: HashPartitioning =>
          h.expressions.exists(_.references.exists(_.name == "th"))
        case _ => false
      }) => s
    }
    assert(thShuffles.nonEmpty, s"expected th-keyed tf/df exchanges:\n$exec")
    // two legal shapes: (a) the corpus-side tf/df exchanges, which must have
    // the broadcast query-term prune BELOW them; (b) the seed-query
    // derivation (doc 0's tokens → distinct), which shuffles on th over ONE
    // document — every scan under such a shuffle must carry the doc_id = 0
    // pushdown. Anything else is an unpruned full-vocabulary shuffle.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (pruned, seedOnly) = thShuffles.partition(
      _.collect { case b: BroadcastHashJoinExec => b }.nonEmpty)
    assert(pruned.nonEmpty, s"expected broadcast-pruned tf/df exchanges:\n$exec")
    seedOnly.foreach { s =>
      val scans = s.collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty && scans.forall(
          _.dataFilters.exists(_.toString.contains(" = 0)"))),
        s"th-keyed shuffle carries UNPRUNED tokens (no prune below):\n$s")
    }
  }

  test("contamination_bloom: the bit-test filter runs on the map side, below every shuffle") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val p = plan("contamination_bloom")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the membership probe (xxhash64 bit tests) must sit BELOW every
    // exchange — the whole point of the prefilter is that rejected
    // fingerprints never shuffle; a post-shuffle bloom filter saves nothing
    val exec0 = SparkEntry.queries("contamination_bloom")(spark, Sf0001)
      .queryExecution.executedPlan
    // AdaptiveSparkPlanExec is a leaf to collect(); descend into its plan
    val exec = exec0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val bloomFilters = exec.collect {
      case f: FilterExec if f.condition.toString.contains("xxhash64") => f
    }
    assert(bloomFilters.nonEmpty, s"no xxhash64 membership filter in plan:\n$p")
    bloomFilters.foreach { f =>
      // the only shuffle allowed underneath is the local small-file spread
      // (which self-elides at scale — see spreadCount); the fingerprint
      // window/join exchanges must all be ABOVE the probe
      val below = f.collect { case s: ShuffleExchangeExec => s }.size
      assert(below <= docSpread,
        s"bloom filter has $below shuffles BELOW it (probe is post-shuffle):\n$p")
    }
  }

  private lazy val vecSpread: Int = {
    import org.apache.spark.sql.functions.col
    spreadCount(graft.io.Tables.embeddings(spark, Sf0001), col("vec_id"))
  }

  test("pq_codes: encoding is a pure projection — codebooks ride as literals") {
    val p = plan("pq_codes")
    // training already happened on the driver (control plane); the RETURNED
    // plan is scan → M argmin projections → presentation sort. The only
    // hash exchange allowed is the local small-file spread.
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === vecSpread, p)
    assert(!p.contains("Join"), p)
  }

  test("pq_codes_bcast: codewords ride a broadcast TABLE, no plan literals") {
    val p = plan("pq_codes_bcast")
    // the m×k codeword set is DATA in a BroadcastNestedLoopJoin (an argmin
    // has no equi key) and the per-subspace argmins fold through a
    // map-side partial min before the one hash exchange — the plan must
    // carry no codeword struct literals (the literal encoder's signature)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("partial_min".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("named_struct"), p)
  }

  test("quality_filter and winnow_fingerprints stay single-scan projections") {
    for (name <- Seq("quality_filter", "winnow_fingerprints")) {
      val p = plan(name)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"$name:\n$p")
      // the only hash exchange is the local small-file spread
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges === docSpread, s"$name:\n$p")
      assert(!p.contains("Join"), s"$name must not join:\n$p")
    }
  }

  test("dedup_containment_winnow: every documents scan is column-pruned") {
    val p = plan("dedup_containment_winnow")
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toSeq
    // the fingerprint branches read exactly (doc_id, text); the keep-all
    // left-join branch reads doc_id ALONE — a scan dragging text (or the
    // full row) through the report join would be corpus-width at 100 TB
    assert(schemas.nonEmpty, p)
    assert(schemas.forall(s =>
      s == "ReadSchema: struct<doc_id:bigint,text:string>" ||
      s == "ReadSchema: struct<doc_id:bigint>"), schemas.mkString("\n"))
    assert(schemas.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("ann_ivf_bcast_topk: assignment is one broadcast join of a centroid TABLE, no plan literals") {
    val p = plan("ann_ivf_bcast_topk")
    // the centroid set is DATA riding a broadcast, not generated code: the
    // assignment scores via a BroadcastNestedLoopJoin (an argmin has no
    // equi key, so a hash join cannot exist — the broadcast is the claim)
    // and the scored rows fold through a partial min-aggregate before any
    // exchange. The search's own query-side broadcast hash join rides
    // above it, as in ann_ivf_trained_topk.
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("partial_min".r.findAllIn(p).nonEmpty, p)
    // no thousands-wide literal: the literal form embeds the centroid
    // array as [[0.123,...],...] struct literals in the projection — the
    // broadcast form's plan must carry none
    assert(!p.contains("named_struct"), p)
  }

  test("ann_ivfpq_rerank: exact re-scoring is shortlist-bounded, not corpus-wide") {
    val p = plan("ann_ivfpq_rerank")
    // the ADC shortlist compiles to a rank-20 WindowGroupLimit (each
    // partition keeps 20 rows per query BEFORE the raw-vector join) and
    // the exact-cosine stage to a rank-5 one above it — the plan-level
    // proof that raw vectors are fetched for shortlist x Q rows only
    assert(p.contains("row_number(), 20"), p)
    assert(p.contains("row_number(), 5"), p)
  }

  test("q12w: hopping windows expand-then-combine — partial agg BELOW the one hash exchange") {
    val p = plan("q12w_sliding_halfhour")
    // the ×2 replication happens in Expand, and the partial aggregate runs
    // on the map side of the single hash exchange — shuffle volume is
    // windows × types, never events × 2
    assert(p.contains("Expand"), p)
    assert("partial_count".r.findAllIn(p).nonEmpty, p)
    assert("hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("q30: regression moments are map-side decimal partials, one hash exchange") {
    val p = plan("q30_regression_stats")
    // six partial decimal sums merge through ONE exchange — the mergeable-
    // statistics shape; the double finishers run on the 5-row aggregate
    assert("partial_sum".r.findAllIn(p).length >= 5, p)
    assert("hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("q29_gapfill: the hourly aggregate rides a BROADCAST to the spine join") {
    val p = plan("q29_gapfill_locf")
    // spine and LOCF window both run on aggregate-sized tables; the left
    // join must be broadcast, never a shuffle join of the dense spine
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftOuter"), p)
  }

  test("markov_transitions: the pair count is map-side combined above the user window") {
    val p = plan("markov_transitions")
    // one events-sized exchange (the user_id window); the (from,to) count
    // partial-aggregates before its exchange, and the normalizing window
    // runs on the types²-sized table
    assert("partial_count".r.findAllIn(p).nonEmpty, p)
    assert("hashpartitioning".r.findAllIn(p).length <= 3, p)
  }

  test("attribution/twap: one data-sized hash exchange each; twap's agg reuses the window partitioning") {
    val pa = plan("attribution_last_touch")
    // the conditional window max is the only keyed exchange — a purchases x
    // views self-join would need two
    assert("hashpartitioning".r.findAllIn(pa).length == 1, pa)
    val pt = plan("twap_by_type")
    // the per-type aggregate sits directly on the lead-window's event_type
    // partitioning: no second hash exchange between window and agg
    assert("hashpartitioning".r.findAllIn(pt).length == 1, pt)
  }

  test("sample_bottomk: the bounded buffer partial-merges map-side") {
    val p = plan("sample_bottomk")
    // ObjectHashAggregate partial below the exchange: each map task ships
    // at most k rows per group, never the group contents
    assert(p.contains("ObjectHashAggregate"), p)
    assert("partial_bottomkagg".r.findAllIn(p.toLowerCase).nonEmpty, p)
  }

  test("rfm_segments_approx: cutpoints ride broadcasts — no ntile window survives") {
    // the whole point of the approx variant is retiring the global ntile
    // sort: the plan must carry the GK sketch aggregate and broadcast its
    // 1-row result back, with NO window operator and only the user_id
    // presentation sort as a range exchange
    val p = plan("rfm_segments_approx")
    assert(!p.toLowerCase.contains("window"), p)
    assert(p.contains("percentile_approx"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1, p)
  }

  test("dau_rolling_7d: the window is an explode, never a range join") {
    // the whole point of the forward-contribution form is avoiding the
    // oracle's BETWEEN join: the plan must contain the generator and no
    // non-equi join operator anywhere
    val p = plan("dau_rolling_7d")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the observed-days restriction and the dau1/dau7 merge are equi-joins
    // of day-sized tables (broadcast)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("corr_matrix/chi2: the fact scan collapses before any join; data-plane joins broadcast") {
    val pc = plan("corr_matrix_hourly")
    // pair moments partial-aggregate; the dense spine and self-join run on
    // aggregate-sized tables, so every join is broadcast
    assert(!pc.contains("SortMergeJoin") && !pc.contains("CartesianProduct"), pc)
    val px = plan("chi2_type_weekday")
    // marginals and the fold see only the CELL table; no events-sized join
    assert(!px.contains("SortMergeJoin") && !px.contains("CartesianProduct"), px)
    assert("partial_count".r.findAllIn(px).nonEmpty, px)
  }

  test("user_paths_top: both leads share one user exchange; top-k is TakeOrdered") {
    val p = plan("user_paths_top")
    // the stacked leads must reuse the single user_id window partitioning
    // (a triple self-join would need three), and the global top-k on the
    // types³-sized count table must never plan a full sort
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length >= 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("mix_sample_temperature: corpus side is scan + broadcast-joined filter, no shuffle") {
    // the rate table is language-sized and must ride a broadcast; the
    // documents side contributes no exchange beyond the presentation sort
    val p = plan("mix_sample_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1, p)
  }

  test("q34_band_join: the band dimension rides a broadcast nested loop; agg partials map-side") {
    val p = plan("q34_band_join")
    // a non-equi join against a printable dimension must broadcast-NL with
    // the fact side streamed — a shuffled or cartesian plan means the 100 TB
    // probe side moved for a 5-row build side
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    assert("partial_count".r.findAllIn(p).nonEmpty, p)
  }

  test("pareto_parts_abc_scalable: the ranking window is chk-partitioned, offsets broadcast") {
    val p = plan("pareto_parts_abc_scalable")
    // the whole point vs the exact form: the part-table cumulative must be
    // partitioned by the revenue band, and the band-offset table must ride
    // a broadcast — a part-table single-partition window would reintroduce
    // the bottleneck this variant retires
    assert("hashpartitioning\\(chk".r.findAllIn(p).nonEmpty, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pmi_bigrams: min-count prunes BELOW the unigram joins; top-k is TakeOrdered") {
    val p = plan("pmi_bigrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the 1-row totals ride broadcast nested loops, never a cartesian
    assert(!p.contains("CartesianProduct"), p)
    // the bc >= 5 reliability floor must filter the bigram aggregate before
    // any join sees it — joining the raw bigram table would shuffle the
    // quadratically-larger unpruned stream. A Filter node on the bc column
    // suffices positionally: the optimizer pushes filters down, never up,
    // so its existence implies it sits below the joins
    assert("Filter [^\\n]*\\bbc#\\d+L? >= 5".r.findAllIn(p).nonEmpty, p)
  }

  test("mad_anomaly_daily: one corpus scan; both medians share one type exchange") {
    val p = plan("mad_anomaly_daily")
    // the join formulation inlined the daily aggregate into FOUR corpus
    // scans; the window formulation is the pin: a single scan, the daily
    // groupBy exchange, one event_type exchange under BOTH Window nodes,
    // and the presentation sort — nothing else
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
    assert("\\bWindow\\b".r.findAllIn(p).length === 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, p)
    assert(!p.contains("Join"), p)
  }

  test("doc_sim_sparse_topk: tf materialized once; self-join reuses one exchange; no cartesian") {
    // r19-opt: the tf table is eagerly localCheckpointed (AQE stage reuse
    // could not collapse every re-evaluation of the lazy form — the pushed
    // join null-filters make sibling tf subtrees non-canonical; measured
    // in ProbeDocSim), so the registered query returns a detached k-row
    // frame and its executed pipeline must be pinned on the split-out
    // docSimTopKFrom plan over the checkpointed tf: corpus parquet scanned
    // at most ONCE more (the n_docs count), the two self-join sides read
    // ONE reused exchange over the tf checkpoint, the pair join is an
    // equi-join (never cartesian), and the top-k plans as
    // TakeOrderedAndProject (per-partition heaps, no global sort).
    val docs = graft.io.Tables.documentsNarrow(spark, Sf0001)
    val tf = graft.operators.TextOps.docTermTf(docs).localCheckpoint(true)
    try {
      val df = graft.operators.TextOps.docSimTopKFrom(docs, tf, 100L, 20)
      // drive THIS plan (Dataset.collect finalizes its own adaptive plan)
      df.collect()
      val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!fin.contains("CartesianProduct"), fin)
      assert("FileScan parquet".r.findAllIn(fin).length <= 1, fin)
      assert(fin.contains("ReusedExchange"), fin)
      assert(fin.contains("TakeOrderedAndProject"), fin)
      // and the registered query itself returns the detached k-row frame
      // (a LogicalRDD scan), computing nothing data-sized at action time
      val q = SparkEntry.queries("doc_sim_sparse_topk")(spark, Sf0001)
      val rdds = q.queryExecution.optimizedPlan.collect {
        case p if p.nodeName == "LogicalRDD" => p
      }
      assert(rdds.nonEmpty, "doc_sim_sparse_topk does not return a detached checkpoint")
    } finally
      org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(tf)
        .foreach(_.unpersist(blocking = false))
  }

  test("q37/q38: the global scalar rides a broadcast over the aggregate, never a sort or cartesian") {
    val p37 = plan("q37_top_supplier")
    // the 1-row max joins the supplier-level aggregate by broadcast; no
    // global sort materializes (a sort-based top-1 would be the wrong shape)
    assert(p37.contains("BroadcastHashJoin") || p37.contains("BroadcastNestedLoopJoin"), p37)
    assert(!p37.contains("CartesianProduct"), p37)
    val p38 = plan("q38_important_brands")
    // part dimension AND the 1-row total both broadcast; the non-equi
    // share test is a BroadcastNestedLoopJoin with a 1-row build side
    assert(p38.contains("BroadcastNestedLoopJoin"), p38)
    assert(p38.contains("BroadcastHashJoin"), p38)
    assert(!p38.contains("CartesianProduct"), p38)
  }

  test("q40: both correlated existence tests decorrelate to semi/anti joins with pushed brand filters") {
    val p = plan("q40_exists_not_exists")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // each side's part scan prunes to its brand BEFORE the fact join
    assert(p.contains("EqualTo(p_brand,Brand#11)"), p)
    assert(p.contains("EqualTo(p_brand,Brand#22)"), p)
  }

  test("revenue_gini: the rank window is chk-partitioned, band offsets broadcast, no global sort of the key table") {
    val p = plan("revenue_gini")
    // in-band ranking window partitions by the value band
    assert(p.contains("windowspecdefinition(chk"), p)
    // the band-offset table joins back by broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("hybrid_rrf: the dense top-k plans TakeOrdered, never a corpus-wide sort+window") {
    val p = plan("hybrid_rrf_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("quantile_bins / trimmed_mean: percentile edges ride a 1-row broadcast back onto the scan") {
    val pq = plan("quantile_bins_value")
    assert(pq.contains("BroadcastNestedLoopJoin") || pq.contains("BroadcastHashJoin"), pq)
    assert(!pq.contains("CartesianProduct"), pq)
    val pt = plan("trimmed_mean_by_type")
    assert(pt.contains("BroadcastHashJoin"), pt)
    assert(!pt.contains("CartesianProduct"), pt)
  }

  test("column_stats_profile: ONE aggregate feeds the stack unpivot — no per-column re-scan union") {
    val p = plan("column_stats_profile")
    // the dq_report shape would show one Union of seven aggregates; the
    // stack unpivot runs a single HashAggregate pair over one scan
    assert(!p.contains("Union"), p)
    assert(p.contains("Expand"), p) // the multi-countDistinct expand
    assert(p.linesIterator.count(_.contains("FileScan")) == 1, p)
  }

  test("fuzzy family: signature-bucket equi-joins only — no quadratic join shapes") {
    // the deletion-neighborhood join's whole point is that candidates come
    // from bucket co-membership; a plan regression to a cross/nested-loop
    // join would be quadratic in names and invisible at fixture scale
    for (q <- Seq("fuzzy_join_editdist1", "fuzzy_bucket_stats",
                  "fuzzy_bucket_stats_parts")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
    // the pair generator itself: capped collect_list buckets double-explode
    // (the Dedup.cappedBucketPairs shape) — no self-JOIN re-expansion
    val pairs = graft.operators.Analytics.fuzzyPairsOf(
      graft.io.Tables.supplier(spark, Sf0001)
        .select(org.apache.spark.sql.functions.col("s_suppkey"),
                org.apache.spark.sql.functions.col("s_name")))
    val pp = pairs.queryExecution.executedPlan.toString
    // the bucket-explode shape has NO join node of any kind — a regression
    // to the old equi-self-join would plan as BroadcastHashJoin at fixture
    // scale, so the pin must reject every join, not just shuffle joins
    assert(!pp.contains("Join"),
      s"fuzzyPairsOf pairs via a join instead of capped bucket explode: $pp")
  }

  test("user-scale graph results are executor-side checkpoints, never a driver LocalRelation") {
    // the r15 review finding: these four return USER-cardinality results —
    // a collect()-based LocalRelation is the classic driver bottleneck at
    // billion-node scale. Pin that the plan reads the detached executor-side
    // checkpoint (a scan over an existing RDD) and contains no non-empty
    // LocalRelation anywhere. The 1-row triangle/wedge aggregates keep the
    // localize() collect by explicit contract (control-plane-sized).
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    for (q <- Seq("pagerank_users", "bfs_hops_users",
                  "random_walks_users", "label_prop_communities",
                  "closeness_landmarks_users")) {
      val df = SparkEntry.queries(q)(spark, Sf0001)
      val locals = df.queryExecution.optimizedPlan.collect {
        case l: LocalRelation if l.data.nonEmpty => l
      }
      assert(locals.isEmpty, s"$q plans a non-empty LocalRelation (driver round-trip)")
      val rdds = df.queryExecution.optimizedPlan.collect {
        case p if p.nodeName == "LogicalRDD" => p
      }
      assert(rdds.nonEmpty, s"$q does not read from a detached checkpoint")
    }
  }

  test("mannwhitney: one corpus exchange; the rank prefix runs on the bounded value table") {
    val p = plan("mannwhitney_value_arms")
    // exactly one exchange carries corpus rows (the per-value-arm groupBy);
    // remaining exchanges are single-partition moves of the value table
    assert(p.contains("hashpartitioning(c"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
