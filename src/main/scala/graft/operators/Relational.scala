package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Relational queries over the TPC-H-ish driver tables — the join / aggregate
  * / top-k / pushdown surface the reference lacks entirely (SURVEY.md §2.2)
  * but the engine needs to be a usable analytics library.
  *
  * Numeric policy for oracle parity: money aggregates are computed on exact
  * DECIMAL and cast to double at the end, so the result is bit-identical
  * between Spark and DuckDB regardless of partial-aggregation order. Plain
  * double summation is order-dependent and would make hash-matching flaky.
  *
  * Scale notes: group-bys here run with map-side partial aggregation (free in
  * Spark); the multi-way join broadcasts only genuinely small dimensions
  * (nation/region — fixed 25/5 rows at any SF) and lets the big fact-fact
  * joins shuffle on their keys, which is the right plan at 100 TB.
  */
object Relational {

  private[operators] def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** The DECIMAL-exact discounted-revenue sum every revenue query aggregates
    * — ONE copy, mirroring the oracle side's shared `revenueExpr` (the
    * streaming twin in [[StatefulQueries]] reuses it too). */
  private[operators] def discRevenueSum: org.apache.spark.sql.Column =
    sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))

  /** TPC-H Q1-shaped pricing summary: full-scan groupBy-agg on lineitem with
    * map-side combine; the canonical "does partial aggregation work" probe. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    pricingSummaryOf(Tables.lineitem(spark, sfDir))

  def pricingSummaryOf(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        discRevenueSum
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Revenue per nation: lineitem ⋈ orders ⋈ customer ⋈ nation. The nation
    * dimension (25 rows at every SF) is broadcast; the fact joins shuffle on
    * their join keys and AQE picks the physical strategy at runtime. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    val c  = Tables.customer(spark, sfDir)
    val n  = Tables.nation(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(discRevenueSum
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q7-shaped bi-nation volume: revenue flowing between DIFFERENT
    * supplier and customer nations per ship year — the five-way join where
    * the SAME dimension (nation) plays two roles and the supplier table
    * joins the fact on a second key. Both nation roles are force-broadcast
    * (25 rows at EVERY SF); supplier scales linearly with SF (10k × SF
    * rows), so its join is left to AQE — broadcast while it fits the
    * threshold, shuffled hash/sort-merge beyond, exactly like the two fact
    * joins. */
  def biNationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    val c  = Tables.customer(spark, sfDir)
    val s  = Tables.supplier(spark, sfDir)
    val n  = Tables.nation(spark, sfDir)
    val n1 = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = n.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n1), s("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(discRevenueSum
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q3-shaped shipping priority: the top unshipped orders by revenue
    * for one market segment at a pivot date. All three single-table
    * predicates (segment equality, two timestamp bounds) push to their
    * parquet scans BEFORE the joins, and the global top-10 on the aggregate
    * plans as TakeOrdered (never a full sort) — both pinned in PlanSpec.
    * Ties at the cut break on l_orderkey so the limit is deterministic
    * cross-engine. */
  def shippingPriority(spark: SparkSession, sfDir: String,
                       segment: String = "BUILDING",
                       pivotDate: String = "1998-06-30",
                       k: Int = 10): DataFrame = {
    // the driver writes these dates as TIMESTAMP_NTZ; the NTZ literal keeps
    // the pushdown cast-free and the UTC-session unix_micros matches
    // DuckDB's naive epoch_us
    val pivot = lit(pivotDate).cast("timestamp_ntz")
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === segment)
    val o = Tables.orders(spark, sfDir).filter(col("o_orderdate") < pivot)
    val li = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > pivot)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"),
               unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"))
      .agg(discRevenueSum
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
  }

  /** Top-k per group via ranking window: top 3 parts by revenue within each
    * brand. Deterministic tie-break on p_partkey so the oracle hash-matches. */
  def topPartsByBrand(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p  = Tables.part(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val rev = li.groupBy(col("l_partkey"))
      .agg(discRevenueSum
        .cast("double").as("revenue"))
    val joined = rev.join(p, rev("l_partkey") === p("p_partkey"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
    joined.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("p_brand"), col("rk"), col("p_partkey"), col("revenue"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** The Q1 CHARGE aggregate: sum of price·(1−disc)·(1+tax) per
    * (returnflag, linestatus) — the three-factor money product, kept EXACT
    * by sizing the decimal operands so no intermediate precision cap ever
    * rounds: (18,2)·(5,2)→(24,4), ·(5,2)→(30,6), all under Spark's 38-digit
    * ceiling (and DuckDB's), so the distributed sum is exact integer
    * arithmetic in both engines and the final double cast is the only
    * rounding anywhere. */
  def pricingCharge(spark: SparkSession, sfDir: String): DataFrame = {
    def d2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def s2(c: org.apache.spark.sql.Column) = c.cast("decimal(4,2)")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d2(col("l_extendedprice")) *
            (lit(1).cast("decimal(4,2)") - s2(col("l_discount"))) *
            (lit(1).cast("decimal(4,2)") + s2(col("l_tax"))))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6-shaped filtered revenue: the predicate-pushdown probe — all
    * three filters must reach the parquet scan (verified in the plan spec). */
  def filteredRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Non-equi BANDING join: each lineitem priced into an IRREGULAR price
    * band from a small dimension of [lo, hi) ranges — the dimension-lookup
    * class (rate cards, tax brackets, risk tiers) that no equi-join can
    * express. The band table rides a BROADCAST nested-loop join: with B
    * bands each row evaluates ≤ B range predicates map-side and NOTHING
    * shuffles until the band-sized aggregate — the only sane plan when the
    * probe side is 100 TB and the build side is rows-you-can-print. For
    * dimension tables too big to scan per row the scale path is
    * interval-tree / sorted-bound binary search (bucketize + equi-join);
    * for REGULAR widths `width_bucket` (q32) is the closed form. Bands
    * here tile [0, ∞) disjointly, so the join is also a cardinality
    * witness: output rows = probe rows, pinned by n_rows summing to the
    * lineitem count in the oracle. */
  def bandJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val s = spark
    import s.implicits._
    val bands = Seq(
      (0L, "micro", 0.0, 2000.0),
      (1L, "small", 2000.0, 15000.0),
      (2L, "mid", 15000.0, 40000.0),
      (3L, "large", 40000.0, 75000.0),
      (4L, "jumbo", 75000.0, Double.MaxValue)
    ).toDF("band_id", "band", "lo", "hi")
    Tables.lineitem(spark, sfDir)
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band_id"), col("band"))
      .agg(count(lit(1)).as("n_rows"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy(col("band_id"))
  }

  /** Pareto / ABC revenue-concentration analysis per part — the
    * 80/15/5 classification every supply-chain BI stack runs: parts are
    * ranked by discounted revenue, the running share of total revenue is
    * accumulated down the ranking, and each part classes A (within the
    * first 80% of revenue), B (80–95%), or C (tail). Class boundaries are
    * CROSS-MULTIPLIED decimal comparisons (`cum·5 ≤ tot·4`,
    * `cum·20 ≤ tot·19`) — exact, no float thresholds; the reported share
    * is the only float (one division of exact decimals).
    *
    * Scale shape: the corpus-sized work is the part-keyed revenue groupBy
    * (map-side combinable); the ranking window and cumulative sum run on
    * the PART-dimension aggregate. The single-partition cumulative window
    * is bounded by the part table — the rfm-exact precedent, with the
    * same documented trade: at extreme part cardinalities the scale path
    * is range-partitioned two-pass prefix sums (the pack_assign
    * two-level machinery). */
  def paretoPartsAbc(spark: SparkSession, sfDir: String): DataFrame = {
    val ranked = Window.orderBy(col("rev_dec").desc, col("l_partkey"))
    val byRev = ranked.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the total is the SAME window with a whole-partition frame — one sort,
    // two frames, zero extra scans (an agg-derived total would inline the
    // revenue aggregate a second time = a second corpus scan)
    val whole = ranked.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(discRevenueSum.as("rev_dec"))
    rev
      .withColumn("cum_dec", sum(col("rev_dec")).over(byRev))
      .withColumn("tot_dec", sum(col("rev_dec")).over(whole))
      .select(col("l_partkey"),
        col("rev_dec").cast("double").as("revenue"),
        (col("cum_dec").cast("double") / col("tot_dec").cast("double")).as("cum_share"),
        when(col("cum_dec") * 5 <= col("tot_dec") * 4, "A")
          .when(col("cum_dec") * 20 <= col("tot_dec") * 19, "B")
          .otherwise("C").as("abc"))
      .orderBy(col("revenue").desc, col("l_partkey"))
  }

  /** [[paretoPartsAbc]] WITHOUT the single-partition ranking window — the
    * registered scale path (the weak-register retirement, the
    * rfm_segments_approx playbook): the ranking is BANDED by a
    * revenue-value chunk `chk = −(⌊rev⌋ div bandWidth)`, a pure function
    * of the row that preserves the global order BETWEEN bands (higher
    * revenue → smaller chk; equal revenues always share a band), so the
    * cumulative share splits into pack_assign's two-level prefix sum:
    * an in-band running sum partitioned by chk, plus a band-offset table
    * (band-count-sized — ≤ 50 rows here — whose own prefix window and
    * grand total are the only single-partition work) broadcast back.
    * All sums stay exact decimal, so `cum_in + off` equals the
    * single-window cumulative bit-for-bit and this registers under
    * pareto_parts_abc's own oracle. Banding is value-static (no sampling
    * pass); a pathological distribution collapsing into one band degrades
    * to the exact form's profile, never below it. */
  def paretoPartsAbcScalable(spark: SparkSession, sfDir: String,
                             bandWidth: Long = 50000L): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(discRevenueSum.as("rev_dec"))
      .withColumn("chk", expr(s"-(cast(rev_dec as bigint) div $bandWidth)"))
    val wIn = Window.partitionBy(col("chk"))
      .orderBy(col("rev_dec").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBand = rev.withColumn("cum_in", sum(col("rev_dec")).over(wIn))
    val wOff = Window.orderBy(col("chk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("chk"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = rev.groupBy(col("chk")).agg(sum(col("rev_dec")).as("tot_band"))
      .withColumn("off", sum(col("tot_band")).over(wOff))
      .withColumn("tot_dec", sum(col("tot_band")).over(wAll))
      .select(col("chk"), col("off"), col("tot_dec"))
    inBand.join(broadcast(offs), "chk")
      .withColumn("cum_dec",
        when(col("off").isNull, col("cum_in")).otherwise(col("cum_in") + col("off")))
      .select(col("l_partkey"),
        col("rev_dec").cast("double").as("revenue"),
        (col("cum_dec").cast("double") / col("tot_dec").cast("double")).as("cum_share"),
        when(col("cum_dec") * 5 <= col("tot_dec") * 4, "A")
          .when(col("cum_dec") * 20 <= col("tot_dec") * 19, "B")
          .otherwise("C").as("abc"))
      .orderBy(col("revenue").desc, col("l_partkey"))
  }

  /** Order-to-ship LATENCY distribution per order priority — the
    * fulfillment-SLA report: p50/p95/mean days between an order's date and
    * each line's ship date, over the canonical fact-to-fact orderkey join.
    * Latency is a DIFFERENCE OF DAY NUMBERS, each `unix_micros(date_trunc)
    * div 86_400_000_000` of a positive timestamp — on positives truncating
    * (Spark `div`) and flooring (DuckDB `//`) integer division agree, so
    * the negative latencies present in the synthetic data (ship before
    * order) stay cross-engine exact, where dividing the raw µs difference
    * would diverge on sign. Percentile interpolation parity is q33's gate;
    * the mean is one division of exact longs. */
  def shipLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val DayUs = 86400000000L
    def dayNum(c: String) = expr(s"unix_micros(date_trunc('DAY', $c)) div $DayUs")
    Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        (dayNum("l_shipdate") - dayNum("o_orderdate")).as("lat_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("lat_days")).cast("long").as("sum_days"),
        expr("percentile(lat_days, array(0.5D, 0.95D))").as("ps"))
      .select(col("o_orderpriority"), col("n"),
        col("ps").getItem(0).as("p50_days"),
        col("ps").getItem(1).as("p95_days"),
        (col("sum_days").cast("double") / col("n")).as("mean_days"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13-shaped customer distribution: how many customers placed
    * exactly k orders, INCLUDING the zero-order customers — the outer-join
    * + double-aggregation lattice (the classic "count the absent" query a
    * plain join silently drops rows from). Orders pre-aggregate to
    * per-customer counts BEFORE the join, so the left join moves one row
    * per ordering customer instead of one per order — at 100 TB the
    * difference between joining the fact table and joining its group-by;
    * zero-order customers surface via coalesce(_, 0) after the outer join.
    * The second aggregate runs on the customer-sized count table and the
    * result is count-distribution-sized. */
  def custDist(spark: SparkSession, sfDir: String): DataFrame = {
    val oc = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, sfDir).select(col("c_custkey"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** 2-D SKYLINE (Pareto frontier): the parts no other part beats on both
    * axes at once — price LOWER-is-better, size BIGGER-is-better; a part
    * survives iff no part is at-least-as-good on both and strictly
    * better on one (the multi-criteria shortlist operator). NOT the
    * all-pairs dominance join the textbook NOT EXISTS states: sorted by
    * price, a part is dominated exactly when some cheaper-or-equal price
    * reaches a larger-or-equal size, so the frontier falls out of a
    * strictly-before running MAX of per-price max sizes — banded
    * two-level like [[paretoPartsAbcScalable]] (in-band prefix max
    * partitioned by a value-static price band + the band-count-sized
    * offset table broadcast back; no single-partition window over the
    * part table). Frontier levels: size equal to the level's own max AND
    * strictly above every cheaper level's max — so ties ON a frontier
    * point all survive (equal points do not dominate each other), and a
    * same-price smaller size or a cheaper equal size is dominated. The
    * frontier (≤ price levels, in practice a handful of rows) broadcasts
    * back to recover part keys. */
  def skyline2d(spark: SparkSession, sfDir: String,
                bandWidth: Long = 100L): DataFrame = {
    val lvl = Tables.part(spark, sfDir)
      .groupBy(col("p_retailprice").as("pr"))
      .agg(max(col("p_size")).as("smax"))
      .withColumn("chk", expr(s"cast(pr as bigint) div $bandWidth"))
    val wIn = Window.partitionBy(col("chk")).orderBy(col("pr"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("chk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = lvl.groupBy(col("chk")).agg(max(col("smax")).as("band_max"))
      .withColumn("m_off", max(col("band_max")).over(wOff))
      .select(col("chk"), col("m_off"))
    val frontier = lvl
      .withColumn("m_in", max(col("smax")).over(wIn))
      .join(broadcast(offs), "chk")
      .filter(greatest(coalesce(col("m_in"), lit(Long.MinValue)),
                       coalesce(col("m_off"), lit(Long.MinValue)))
        < col("smax"))
      .select(col("pr"), col("smax"))
    Tables.part(spark, sfDir)
      .join(broadcast(frontier),
        col("p_retailprice") === col("pr") && col("p_size") === col("smax"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  /** Order-priority counts with a semi-join (EXISTS) against lineitem:
    * exercises left-semi planning; count-distinct-free so it stays one pass. */
  def orderPriorityCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val o  = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Distinct + approx-distinct probe over lineitem; exact distinct count per
    * returnflag (shuffle on the group key with partial distinct aggregation). */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Approximate distinct count (HyperLogLog++) — the scale path when exact
    * distinct is too expensive (exact needs a per-group distinct shuffle of
    * every key; HLL++ is one pass with a fixed-size sketch, map-side merged).
    * An approximate answer can't hash-match a foreign engine directly, so the
    * registered output is the EXACT count plus `approx_ok` — whether the
    * HLL++ estimate landed within `tolerance` of it (oracled as literal
    * TRUE): the gate fails if Spark's sketch ever drifts out of bounds,
    * while the sketch itself stays in the measured plan. */
  def approxDistinctCounts(spark: SparkSession, sfDir: String,
                           rsd: Double = 0.05, tolerance: Double = 0.15): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"))
      .select(col("l_returnflag"), col("n_parts"),
        (abs(col("approx_parts") - col("n_parts")).cast("double") / col("n_parts")
          <= lit(tolerance)).as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** HLL SET ALGEBRA — approximate SET INTERSECTION via inclusion-
    * exclusion over three sketches: |viewers ∩ purchasers| ≈ |A|̂ + |B|̂ −
    * |A∪B|̂. HLL sketches union natively but cannot intersect, so
    * inclusion-exclusion is THE one-pass answer to "how many users did
    * BOTH" at 100 TB — with the standard caveat that its error scales
    * with the UNION's cardinality, not the intersection's (a tiny overlap
    * of two huge sets is unestimable; the gate below is therefore
    * relative to n_union). The exact pass (three countDistincts — one
    * multi-distinct expand, the column_stats_profile adjudication: the
    * oracle-strongest form, dropped in production) and the sketch pass
    * run as SEPARATE aggregates so the sketches never ride the expand
    * (the profile_sketch lesson); the emitted columns are the exact
    * counts plus the in-plan boolean gate (the q10a pattern — the sketch
    * estimate itself is not bit-reproducible across engines and rides
    * only through the gate). */
  def hllIntersectionUsers(spark: SparkSession, sfDir: String,
                           rsd: Double = 0.02,
                           // gate margin: the inclusion-exclusion estimate
                           // combines THREE sketches, worst-case error std
                           // ≈ rsd·√(v²+p²+u²) ≤ rsd·√3·u ≈ 3.5% of the
                           // union at rsd 0.02 — 15% is > 4σ (the
                           // approxDistinctCounts 3×-headroom convention),
                           // so the TRUE-literal oracle cannot flip at an
                           // unprobed scale (r16 review fix; was 5% ≈ 1.4σ)
                           tolPpm: Long = 150000L): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
    val isV = col("event_type") === "view"
    val isP = col("event_type") === "purchase"
    val exact = ev.agg(
      countDistinct(when(isV, col("user_id"))).cast("long").as("n_viewers"),
      countDistinct(when(isP, col("user_id"))).cast("long").as("n_purchasers"),
      countDistinct(when(isV || isP, col("user_id"))).cast("long").as("n_union"))
    val sk = ev.agg(
      approx_count_distinct(when(isV, col("user_id")), rsd).as("e_v"),
      approx_count_distinct(when(isP, col("user_id")), rsd).as("e_p"),
      approx_count_distinct(when(isV || isP, col("user_id")), rsd).as("e_u"))
    exact.crossJoin(broadcast(sk))
      .select(col("n_viewers"), col("n_purchasers"), col("n_union"),
        (col("n_viewers") + col("n_purchasers") - col("n_union")).as("n_both"),
        (abs((col("e_v") + col("e_p") - col("e_u")) -
             (col("n_viewers") + col("n_purchasers") - col("n_union")))
           * lit(1000000L) <= lit(tolPpm) * col("n_union")).as("approx_ok"))
  }

  /** Approximate percentiles — the quantile-sketch family member next to
    * q10a's HLL: per returnflag, p50/p95 of l_extendedprice. The sketch
    * (approx_percentile, a mergeable fixed-size summary — the only way to
    * compute quantiles in one pass at 100 TB) is checked IN-PLAN against the
    * exact DISCRETE percentile (the value at row ceil(p*n) of the sorted
    * group — a value PICK, no interpolation, so the exact side is
    * bit-reproducible across engines; the sketch itself is not and rides
    * only through the boolean gate). */
  def approxQuantiles(spark: SparkSession, sfDir: String,
                      tolerance: Double = 0.05): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"))
    def pick(p: Double) =
      max(when(col("rn") === ceil(lit(p) * col("n")), col("l_extendedprice")))
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(pick(0.5).as("p50_disc"), pick(0.95).as("p95_disc"),
           expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 1000)").as("ap"))
      .select(col("l_returnflag"), col("p50_disc"), col("p95_disc"),
        (abs(element_at(col("ap"), 1) - col("p50_disc")) / col("p50_disc") <= tolerance &&
         abs(element_at(col("ap"), 2) - col("p95_disc")) / col("p95_disc") <= tolerance)
          .as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Set operations (INTERSECT / EXCEPT / UNION with set semantics):
    * (brands of large parts ∩ brands of cheap parts) ∪
    * (brands of pricey parts \ brands of large parts). */
  def brandSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val big    = p.filter(col("p_size") >= 40).select(col("p_brand")).distinct()
    val cheap  = p.filter(col("p_retailprice") < 1200.0).select(col("p_brand")).distinct()
    val pricey = p.filter(col("p_retailprice") >= 1800.0).select(col("p_brand")).distinct()
    big.intersect(cheap).union(pricey.except(big)).distinct()
      .orderBy(col("p_brand"))
  }

  /** Anti-join: parts that never appear in lineitem (NOT EXISTS). */
  def neverOrderedParts(spark: SparkSession, sfDir: String): DataFrame = {
    val p  = Tables.part(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** Full CUBE over (l_returnflag, l_linestatus) — all four grouping sets. */
  def lineitemCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Semi-structured extraction: events.props is a JSON object ({"k": int});
    * pull k out and aggregate it per event_type — the JSON-column surface. */
  def jsonPropsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Analytic-function suite per user: rank by value, lag/lead, and a
    * 3-row moving decimal-exact sum — the ranking/analytic window surface. */
  def analyticSuite(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val frame = byUser.rowsBetween(-2, 0)
    Tables.events(spark, sfDir)
      .withColumn("rk", rank().over(Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)).cast("long"))
      .withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .withColumn("next_value", lead(col("value"), 1).over(byUser))
      .withColumn("mov_sum3",
        sum(col("value").cast("decimal(18,2)")).over(frame).cast("double"))
      .select(col("event_id"), col("user_id"), col("rk"),
              col("prev_value"), col("next_value"), col("mov_sum3"))
      .orderBy(col("event_id"))
  }

  /** The window surface q19 leaves out: distribution functions
    * (dense_rank / ntile / percent_rank / cume_dist — the latter two are
    * single divisions of exact ranks, bit-deterministic), a first_value
    * rows-frame, and a VALUE-RANGE frame (trailing 5 minutes on the ns
    * clock — `rangeBetween` on ts_ns, the frame kind q19's rows-frames
    * don't exercise). One shuffle per distinct (partition, order) pair;
    * both orderings share the user_id partitioning.
    *
    * Time key: `ts_ns div 1000 * 1000` — MICROSECOND-truncated, because the
    * DuckDB oracle can only order/frame on `epoch_us(ts)*1000` (its
    * TIMESTAMP truncates parquet nanos to µs). On micros-encoded fixtures
    * the truncation is the identity; on a nanos-encoded fixture (an encoding
    * normalizeEvents still supports) it keeps first_v tie-breaks and the
    * range-frame boundary membership bit-identical to the oracle instead of
    * diverging on sub-µs digits. */
  def windowSuite(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tsUsNs = expr("ts_ns div 1000 * 1000")
    val wv = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    val wt = Window.partitionBy(col("user_id"))
      .orderBy(tsUsNs, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy(col("user_id")).orderBy(tsUsNs)
      .rangeBetween(-300000000000L, 0L)
    Tables.events(spark, sfDir)
      .withColumn("drk", dense_rank().over(wv).cast("long"))
      .withColumn("quartile", ntile(4).over(wv).cast("long"))
      .withColumn("prk", percent_rank().over(wv))
      .withColumn("cd", cume_dist().over(wv))
      .withColumn("first_v", first(col("value")).over(wt))
      .withColumn("n_5min", count(lit(1)).over(wr).cast("long"))
      .select(col("event_id"), col("user_id"), col("drk"), col("quartile"),
              col("prk"), col("cd"), col("first_v"), col("n_5min"))
      .orderBy(col("event_id"))
  }

  /** Data-quality constraint report (the Deequ shape): declared checks over
    * the orders table evaluated in ONE aggregation pass — row count,
    * key-null fraction, key uniqueness, value bounds — each emitted as a
    * (check, metric, threshold, pass) row. At 100 TB this is the
    * admission gate in front of every downstream consumer: one scan, one
    * shuffle (the distinct), and a constant-size report; a constraint
    * failure is DATA (a row with pass = 0), not a log line. All metrics
    * are exact counts or exact extremes — no sampled approximations to
    * disagree with the oracle. */
  def dqReport(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val stats = o.agg(
      count(lit(1)).cast("long").as("n_rows"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).cast("long").as("null_keys"),
      countDistinct(col("o_orderkey")).cast("long").as("distinct_keys"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))
    def check(name: String, metric: Column, threshold: Double,
              pass: Column): DataFrame =
      stats.select(lit(name).as("check"), metric.cast("double").as("metric"),
                   lit(threshold).as("threshold"), pass.cast("long").as("pass"))
    check("row_count_positive", col("n_rows"), 0.0, col("n_rows") > 0)
      .unionAll(check("key_never_null", col("null_keys"), 0.0, col("null_keys") === 0))
      .unionAll(check("key_unique", col("distinct_keys"), 0.0,
        col("distinct_keys") === col("n_rows")))
      .unionAll(check("price_non_negative", col("min_price"), 0.0,
        col("min_price") >= 0.0))
      .unionAll(check("price_below_cap", col("max_price"), 1000000.0,
        col("max_price") <= 1000000.0))
      .orderBy(col("check"))
  }

  /** CDC event log → SCD2 intervals: each user's value history as
    * (valid_from, valid_to) rows, valid_to = next change's timestamp and
    * NULL on the current row — the slowly-changing-dimension materialization
    * every warehouse derives from a change stream. One user-keyed shuffle,
    * one lead() pass; integer microseconds. */
  def scd2UserValues(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
              expr("ts_ns div 1000").as("us"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
              col("us").as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  /** AS-OF (time-travel) SNAPSHOT over the [[scd2UserValues]] intervals:
    * the state of every user at a single cut instant — the point query an
    * SCD2 materialization exists to answer (training-data reproducibility:
    * "the features as they were when the run started"). The cut is the
    * DATA-DERIVED midpoint (min+max)/2 in integer µs (a 1-row broadcast),
    * so both engines state it exactly; interval membership is pure integer
    * comparison and each user's intervals partition time, so exactly one
    * row per user active by the cut survives. Scale: the snapshot is a
    * FILTER over the interval table — scan + broadcast, no join; at
    * warehouse scale the same predicate drives partition pruning on a
    * valid_from-partitioned layout. */
  /** Interval LIVENESS at a cut instant — THE SCD2 as-of boundary rule
    * (valid_from ≤ cut < valid_to; an open-ended row is live forever),
    * defined ONCE and shared by every as-of reader (asof snapshot,
    * snapshot diff, upsert snapshot, bitemporal snapshot) so a one-sided
    * boundary edit cannot silently desynchronize one reader from the
    * others and their shared oracles. (The temporal table join keeps its
    * own deliberately different STRICTLY-BEFORE rule.) */
  private[operators] def scd2LiveAt(cut: Column): Column =
    col("valid_from_us") <= cut &&
      (col("valid_to_us").isNull || col("valid_to_us") > cut)

  def scd2AsofSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = Tables.events(spark, sfDir)
      .agg(expr("(min(ts_ns div 1000) + max(ts_ns div 1000)) div 2").as("cut_us"))
    scd2UserValues(spark, sfDir)
      .crossJoin(broadcast(cut))
      .filter(scd2LiveAt(col("cut_us")))
      .select(col("user_id"), col("event_id"), col("value"),
              col("valid_from_us"), col("cut_us"))
      .orderBy(col("user_id"))
  }

  /** SNAPSHOT DIFF between two as-of cuts of the SCD2 interval table —
    * the audit query behind "what changed between the t1 training run and
    * the t2 rerun": users ADDED (absent at t1), REMOVED (no live interval
    * at t2), or CHANGED (live at both with a different value), with
    * unchanged users dropped. Cuts are the data-derived quartile instants
    * min + (span)/4 and min + 3·(span)/4 in integer µs (1-row broadcast,
    * both engines state them exactly); absent values carry the −1
    * sentinel (values are positive) so the diff row is null-free and
    * hash-stable.
    *
    * Scale shape: each snapshot is [[scd2AsofSnapshot]]'s broadcast-filter
    * over the interval table (partition-prunable on valid_from at
    * warehouse scale); the diff is one user-keyed full outer join of two
    * user-sized snapshots. */
  def scd2SnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val cuts = Tables.events(spark, sfDir)
      .agg(expr("min(ts_ns div 1000) + (max(ts_ns div 1000) - min(ts_ns div 1000)) div 4").as("cut1"),
           expr("min(ts_ns div 1000) + ((max(ts_ns div 1000) - min(ts_ns div 1000)) * 3) div 4").as("cut2"))
    val iv = scd2UserValues(spark, sfDir)
    def snapAt(cut: Column, v: String): DataFrame =
      iv.crossJoin(broadcast(cuts))
        .filter(scd2LiveAt(cut))
        .select(col("user_id"), col("value").as(v))
    snapAt(col("cut1"), "v1").join(snapAt(col("cut2"), "v2"),
        Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("v1").isNull, "added")
          .when(col("v2").isNull, "removed")
          .otherwise("changed").as("status"),
        coalesce(col("v1"), lit(-1.0)).as("value_t1"),
        coalesce(col("v2"), lit(-1.0)).as("value_t2"))
      .filter(col("status") =!= "changed" || col("value_t1") =!= col("value_t2"))
      .orderBy(col("user_id"))
  }

  /** Decorrelated "orders above their customer's average" — the correlated
    * scalar subquery expressed as the join Catalyst would decorrelate it to
    * (aggregate once per customer, join back, filter). */
  def aboveAvgOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val avg = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
    o.join(avg, col("o_custkey") === col("ac_custkey"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("avg_price"))
      .orderBy(col("o_orderkey"))
  }

  /** Pivot: the revenue matrix l_returnflag × l_linestatus, one column per
    * linestatus. The pivot values are EXPLICIT — `pivot(col)` without them
    * first runs a driver-side DISTINCT collect over the pivot column, an
    * extra full pass at 100 TB (and a nondeterministic column set); with
    * values given, the pivot plans in two phases: an ordinary map-side-
    * combined sum down to the ≤ |groups|×|values| cells, then a `pivotfirst`
    * over those cells — so only the first shuffle ever carries rows
    * proportional to the input (pinned in PlanSpec). Decimal-exact sums cast
    * to double once, as everywhere. */
  def revenuePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(discRevenueSum
        .cast("double"))
      .withColumnRenamed("F", "rev_f")
      .withColumnRenamed("O", "rev_o")
      .orderBy(col("l_returnflag"))

  /** Unpivot (melt): wide part metrics to long (p_partkey, metric, value).
    * Plans as a zero-shuffle Expand projection — each input row emits one
    * output row per value column in place, so the operator is a pure map at
    * any scale (the UNION-ALL formulation the oracle uses would scan the
    * table once per metric). Value columns are cast to a common double type,
    * which `unpivot` requires. */
  def partMetricsUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  /** Rollup (grouping-sets family) over year(o_orderdate) × o_orderstatus. */
  def ordersRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .rollup(col("o_year"), col("o_orderstatus"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total_price"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** EXPLICIT grouping sets — ((flag,status), (flag), (status)) — an
    * irregular lattice neither CUBE nor ROLLUP can express: no grand-total
    * set (rollup always ends in ()), and not the full power set (cube would
    * add it). `Dataset.groupingSets` takes the arbitrary set list, and
    * `grouping_id()` disambiguates a real NULL group value from a
    * rolled-up one — the disambiguator any BI layer over nullable group
    * keys needs. Single expand+aggregate pass, one shuffle, same plan
    * shape as cube. */
  def explicitGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
           sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
              col("sum_qty"), col("n_rows"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** Fixed-bin histogram of events.value per event_type via the native
    * `width_bucket` expression (codegen'd): 25 buckets over [0, 500).
    * A histogram is just a group-by on the bucket expression — fully
    * map-side combinable, shuffle proportional to types × buckets. The
    * oracle states the arithmetic definition (floor(v/width)+1), so the
    * gate pins Spark's width_bucket semantics against it. */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
               width_bucket(col("value"), lit(0.0d), lit(500.0d), lit(25L)).as("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("min_v"),
           max(col("value")).as("max_v"))
      .orderBy(col("event_type"), col("bucket"))

  /** EXACT percentiles (p50/p95/p99 of events.value per type) — the exact
    * twin of q10b's `approx_percentile`: Spark's sort-based `percentile`
    * aggregate, whose buffer is a value→count map, i.e. bounded by the
    * DISTINCT-value cardinality per group, not the row count — for
    * fixed-precision data (2-decimal values here) that is a bounded state
    * even at 100 TB row counts. For genuinely continuous domains q10b's
    * sketch remains the scale path; registering both makes the trade
    * explicit and lets the gate pin that the two engines' linear
    * interpolation (`lo + (hi−lo)·frac` at rank p·(n−1)) is bit-identical. */
  def percentileExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("ps"))
      .select(col("event_type"), col("n"),
              col("ps").getItem(0).as("p50"),
              col("ps").getItem(1).as("p95"),
              col("ps").getItem(2).as("p99"))
      .orderBy(col("event_type"))

  /** IN-FLIGHT METRICS via `Dataset.observe` — the zero-cost observability
    * face of [[dqReport]]: the metric expressions ride the scan as plan
    * accumulators (no second pass, no extra shuffle — at 100 TB the
    * difference between "audit the load" and "scan the corpus twice"), and
    * the collected metrics row is re-surfaced as a one-row frame under a
    * plain aggregate oracle. `executeCollect` runs the OBSERVED plan's own
    * QueryExecution, which is where the accumulators live — an action on a
    * derived Dataset would execute a different plan and leave them empty. */
  def dqObserve(spark: SparkSession, sfDir: String): DataFrame = {
    val observed = Tables.events(spark, sfDir).observe("dq",
      count(lit(1)).as("n_rows"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_negative"),
      count(col("user_id")).as("n_user_nonnull"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
    val qe = observed.queryExecution
    qe.executedPlan.executeCollect()
    val row = qe.observedMetrics("dq")
    spark.createDataFrame(java.util.Collections.singletonList(row), row.schema)
  }

  /** SCHEMA EVOLUTION across dataset generations: an "old" slice of orders
    * lacking `o_orderstatus` unions with a "new" slice that has it, via
    * `unionByName(allowMissingColumns = true)` — the missing column
    * null-fills, by NAME not position (a positional union would silently
    * misalign). The generations are simulated by orderkey parity so the
    * oracle can state the same split. Downstream aggregation sees one
    * logical table with a nullable evolved column — the data-lake pattern
    * when a 100 TB corpus's newer partitions carry columns older ones
    * predate. Both branches prune to their own column sets at the scan. */
  def unionSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val oldGen = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val newGen = o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    oldGen.unionByName(newGen, allowMissingColumns = true)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first)
  }

  /** TPC-H Q15 shape (top supplier): suppliers whose discounted revenue
    * EQUALS the global maximum — the "scalar subquery over a derived
    * view" decorrelation class. The revenue view aggregates once; its
    * 1-row max rides a broadcast back over the supplier-count-sized
    * aggregate (never the fact table), so the only fact-sized work is the
    * one map-side-combined revenue groupBy. Ties all surface (the
    * TPC-H-specified semantics) — no LIMIT 1 nondeterminism. The equality
    * compares EXACT DECIMALS: crossing to double first could merge two
    * revenues that differ below double resolution. */
  def topSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(discRevenueSum.as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
              col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q11 shape (important stock): brands whose inventory value
    * exceeds the uniform 1/25 share of the corpus total — a HAVING over
    * aggregated groups against a broadcast global scalar. The share test
    * is CROSS-MULTIPLIED in exact decimal (value·25 > total, the pareto
    * boundary discipline) — a double share threshold would make group
    * membership float-sensitive at the boundary. Both the group aggregate
    * and the total fold out of ONE fact scan shape (value per brand, then
    * a 1-row re-aggregate of the brand table — never a second corpus
    * pass); part is the broadcast dimension. */
  def importantBrands(spark: SparkSession, sfDir: String): DataFrame = {
    val v = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("value"))
    val tot = v.agg(sum(col("value")).as("total"))
    // keep the ×25 product WITHIN precision 38: value is DECIMAL(38,8), and
    // decimal(38,8) × int takes Catalyst's precision-loss path (rounded to
    // scale 6 — no longer exact). Narrowing to (35,8) first (the corpus
    // total needs far fewer than 27 integer digits even at 100 TB) makes
    // the product decimal(38,8): 35+2+1 = 38, scale preserved, bit-exact.
    v.join(broadcast(tot),
           col("value").cast("decimal(35,8)") * lit(25).cast("decimal(2,0)") >
             col("total"))
      .select(col("p_brand"), col("value").cast("double").as("value"),
              (col("value").cast("double") / col("total").cast("double")).as("share"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total quantity
    * exceeds a threshold, rejoined to orders+customer for the report — the
    * "IN (SELECT key FROM agg HAVING ...)" class. The quantity HAVING
    * prunes at the aggregate (order-count-sized) BEFORE any dimension
    * join, so the orders/customer joins move only qualifying keys; at
    * 100 TB the orderkey agg and the orders join share co-partitioned
    * shuffles. Quantity sums are exact decimal. */
  def largeVolumeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val qty = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    qty.join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
              col("o_orderdate"), col("o_totalprice"),
              col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** Correlated EXISTS + NOT EXISTS pair (the TPC-H Q21 decorrelation
    * class on available columns): orders containing at least one item of
    * one brand and NONE of another. Both correlated subqueries decorrelate
    * to key-level semi/anti joins against brand-filtered orderkey sets;
    * the brand filters ride a broadcast part dimension, so each side's
    * fact scan prunes to one brand's rows before its DISTINCT — the
    * semi/anti build sides are orderkey-sized, never lineitem-sized. */
  def existsNotExists(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    def brandOrders(brand: String) = li
      .join(broadcast(p.filter(col("p_brand") === brand)),
            col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey")).distinct()
    Tables.orders(spark, sfDir)
      .join(brandOrders("Brand#11"), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .join(brandOrders("Brand#22"), col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** ANALYZE-style NUMERIC COLUMN PROFILE of the lineitem fact — the
    * catalog-statistics collection pass a cost-based optimizer (and every
    * data-contract check) feeds on: per column, row count, null count,
    * exact NDV, and min/max, one report row per column. Dates profile as
    * epoch day numbers (the shipLatency dayNum rule) so every stat is a
    * double-exact integer or an exact double — no engine-variant string
    * formatting in the output.
    *
    * Scale shape: ONE corpus scan — all per-column aggregates (including
    * the seven exact countDistincts, which Catalyst plans as one expand)
    * collapse in a single aggregate to a 1-row frame, and `stack` unpivots
    * that single row into the 7-row report with no re-execution (the
    * dq_report union-of-selects shape would re-run the aggregate per
    * branch). At 100 TB the exact NDVs are the expensive half; the
    * registered approximate path is q10a's HLL form. */
  def columnStatsProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = ProfileCols
    val li = profileInput(spark, sfDir)
    val aggs = count(lit(1)).cast("long").as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"cnt_$c"),
          countDistinct(col(c)).cast("long").as(s"ndv_$c"),
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val stats = li.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', n, n - cnt_$c, ndv_$c, min_$c, max_$c"
    }.mkString(", ")
    stats.selectExpr(
      s"stack(${cols.size}, $stacked) AS (column_name, n_rows, n_nulls, ndv, min_val, max_val)")
      .orderBy(col("column_name"))
  }

  /** [[columnStatsProfile]]'s SKETCH sibling — the 100 TB profile pass:
    * NDV via HyperLogLog++ (`approx_count_distinct`, a constant-size
    * mergeable sketch, map-side combined — ONE plain aggregate over one
    * scan with NO expand, where the exact form multiplies scan rows ×8
    * through Catalyst's multi-countDistinct expand). The sketch estimate
    * itself is not bit-reproducible across engines, so it rides only
    * through an IN-PLAN tolerance gate (the q10a pattern): the output
    * carries the exact NDV as the oracle-checkable truth plus a per-column
    * `approx_ok` boolean pinning that the sketch lands within `tolerance`
    * of the truth it replaces at scale. The exact countDistincts remain in
    * this plan only to FEED that gate; the production profile drops them
    * and keeps the sketch (the exact sibling is perf-weak-registered). */
  def columnStatsProfileSketch(spark: SparkSession, sfDir: String,
                               rsd: Double = 0.05,
                               tolerance: Double = 0.15): DataFrame = {
    val cols = ProfileCols
    val li = profileInput(spark, sfDir)
    // the exact side keeps columnStatsProfile's expand-based plan; the
    // SKETCH side runs as its OWN plain aggregate — mixed into one agg,
    // Catalyst routes the HLL updates through the multi-countDistinct
    // expand and pays the ×8 row multiplier on the sketches too (measured
    // 11.0 s vs 3.5 s for the exact form at sf0.1); split out, the sketch
    // pass is the cheap no-expand single scan the 100 TB profile actually
    // runs, and the two 1-row frames meet in a broadcast
    val exactAggs = count(lit(1)).cast("long").as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"cnt_$c"),
          countDistinct(col(c)).cast("long").as(s"ndv_$c"),
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val sketchAggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"andv_$c"))
    val stats = li.agg(exactAggs.head, exactAggs.tail: _*)
      .crossJoin(broadcast(li.agg(sketchAggs.head, sketchAggs.tail: _*)))
    profileReport(stats, tolerance)
  }

  /** The sketch-profile report tail — stack-unpivot the 1-row stats frame
    * (n, cnt_/ndv_/andv_/min_/max_ per [[ProfileCols]] column) and gate
    * the sketch NDV against the exact truth. ONE definition shared by the
    * single-pass and incremental forms (r18 review: the copies would
    * drift on the next gate change). */
  private def profileReport(stats: DataFrame, tolerance: Double): DataFrame = {
    val stacked = ProfileCols.map { c =>
      s"'$c', n, n - cnt_$c, ndv_$c, andv_$c, min_$c, max_$c"
    }.mkString(", ")
    stats.selectExpr(
        s"stack(${ProfileCols.size}, $stacked) AS " +
          "(column_name, n_rows, n_nulls, ndv, andv, min_val, max_val)")
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        col("min_val"), col("max_val"),
        (abs(col("andv") - col("ndv")).cast("double") / col("ndv")
          <= lit(tolerance)).as("approx_ok"))
      .orderBy(col("column_name"))
  }

  /** The profile's column set — ONE definition shared by the exact,
    * sketch, and incremental forms (a column added to the profile must
    * reach all three or none). */
  private val ProfileCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")

  private def profileInput(spark: SparkSession, sfDir: String): DataFrame = {
    val DayUs = 86400000000L
    Tables.lineitem(spark, sfDir).select(ProfileCols.map { c =>
      (if (c == "l_shipdate")
         expr(s"unix_micros(date_trunc('DAY', $c)) div $DayUs")
       else col(c)).cast("double").as(c)
    }: _*)
  }

  /** Increment count for [[columnStatsIncremental]]. */
  private[graft] val StatsIncrements = 3

  /** INCREMENTAL PROFILE MAINTENANCE — [[columnStatsProfileSketch]]'s
    * pipeline-shaped sibling (the third consumer of the versioned-replay
    * journal, after the dedup snapshot and the IVF append): each corpus
    * increment is profiled ONCE into a constant-size row — exact
    * mergeable stats (count, non-null count, min, max) plus a PERSISTED
    * DataSketches HLL blob per column — and the corpus profile is
    * recovered by folding the journal: sums, min-of-mins, max-of-maxes,
    * and `hll_union_agg` over the stored sketches. This is how a 100 TB
    * profile dashboard actually stays current: each day's ingest scans
    * only ITSELF; history is never rescanned, because everything that
    * must merge is either algebraic (counts, extrema) or a mergeable
    * sketch (NDV — the one stat that is NOT algebraic exactly, which is
    * the entire reason the sketch is stored rather than the estimate).
    *
    * Same-lgK HLL union is register-lossless, so the merged estimate
    * equals the single-pass estimate (spec-pinned); it registers through
    * the in-plan tolerance gate (`approx_ok`) against the exact NDV, the
    * [[columnStatsProfileSketch]] pattern — the exact side exists only to
    * FEED the gate and is dropped by the production profile. The doubles
    * feed the sketch as canonical strings (DataSketches HLL takes
    * int/long/string/binary; the cast is injective, so distinctness is
    * preserved). */
  def columnStatsIncremental(spark: SparkSession, sfDir: String,
                             lgK: Int = 14,
                             tolerance: Double = 0.15): DataFrame = {
    val outDir = statsIncCache.computeIfAbsent(s"$sfDir|$lgK", { _ =>
      val d = java.nio.file.Files
        .createTempDirectory("graft-stats-inc-").toString
      buildStatsJournal(spark, sfDir, d, lgK)
      d
    })
    statsProfileFromJournal(spark, sfDir, outDir, tolerance)
  }

  /** [[columnStatsIncremental]]'s journal read through a COMPACTED copy —
    * the read-equivalence gate on the THIRD journal shape (after the
    * fingerprint store and the LSH band index): this one exercises the
    * two interactions most likely to break a fold — the
    * first-version-per-residue redelivery rule re-ranks on the
    * `increment`/`residue` DATA columns (which must survive the read-all →
    * write-all rewrite), and the persisted HLL register blobs must cross
    * the parquet rewrite byte-identical for `hll_union_agg` to merge them
    * losslessly. Same oracle as the incremental form. */
  def columnStatsCompacted(spark: SparkSession, sfDir: String,
                           lgK: Int = 14,
                           tolerance: Double = 0.15): DataFrame = {
    val outDir = statsCompactedCache.computeIfAbsent(s"$sfDir|$lgK", { _ =>
      // the CALL builds the journal through the incremental entry point
      // (its computeIfAbsent side effect); the returned frame is unused
      val _ = columnStatsIncremental(spark, sfDir, lgK, tolerance)
      Dedup.compactedCopyOf(spark, statsIncCache.get(s"$sfDir|$lgK"),
        "graft-stats-compact-")
    })
    statsProfileFromJournal(spark, sfDir, outDir, tolerance)
  }

  private val statsCompactedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The journal fold shared by the incremental and compacted reads:
    * first version per residue, algebraic merges + register-lossless HLL
    * union, tolerance-gated against the exact NDV. */
  private def statsProfileFromJournal(spark: SparkSession, sfDir: String,
                                      outDir: String,
                                      tolerance: Double): DataFrame = {
    val raw = Dedup.snapshotVersionsBefore(spark, outDir, Long.MaxValue)
      .getOrElse(sys.error("no stats journal version written"))
    // first version per residue: a redelivered increment (new batch id,
    // same doc class) folds ONCE — the journal family's convergence rule;
    // null-residue rows are empty batches and contribute nothing
    val firstW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("residue")).orderBy(col("increment"))
    val parts = raw.filter(col("residue").isNotNull)
      .withColumn("rn", row_number().over(firstW)).filter(col("rn") === 1)
      .drop("rn")
    val mergedAggs = sum(col("n")).cast("long").as("n") +:
      ProfileCols.flatMap { c =>
        Seq(sum(col(s"cnt_$c")).cast("long").as(s"cnt_$c"),
            min(col(s"min_$c")).as(s"min_$c"),
            max(col(s"max_$c")).as(s"max_$c"),
            hll_sketch_estimate(hll_union_agg(col(s"sk_$c")))
              .cast("long").as(s"andv_$c"))
      }
    val li = profileInput(spark, sfDir)
    val exactAggs =
      ProfileCols.map(c => countDistinct(col(c)).cast("long").as(s"ndv_$c"))
    profileReport(parts.agg(mergedAggs.head, mergedAggs.tail: _*)
      .crossJoin(broadcast(li.agg(exactAggs.head, exactAggs.tail: _*))),
      tolerance)
  }

  private val statsIncCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The built journal dir for a corpus (None before the first build) —
    * `private[graft]` so the spec can inject a simulated redelivery
    * (duplicate version dir) and witness the residue fold absorbing it. */
  private[graft] def statsJournalDir(sfDir: String, lgK: Int = 14): Option[String] =
    Option(statsIncCache.get(s"$sfDir|$lgK"))

  private def buildStatsJournal(spark: SparkSession, sfDir: String,
                                outDir: String, lgK: Int): Unit = {
    val n = StatsIncrements
    val withKey = profileInput(spark, sfDir)
      .withColumn("splitk", col("l_orderkey").cast("long"))
    StatefulQueries.versionedReplayJournal(spark, s"statsinc:$sfDir",
      (0 until n).map(i => s"s$i.parquet"),
      (0 until n).map(i => withKey.filter(col("splitk") % n === i)), n) {
      (batch, id) =>
        // residue stamps WHICH increment this row profiles (every row of a
        // batch shares one doc class by the split construction) — the
        // at-least-once defense the sibling journals get from anti-joins:
        // a redelivery under a NEW batch id writes a duplicate row, and
        // the fold keeps only the FIRST version per residue
        val aggs = count(lit(1)).cast("long").as("n") +:
          (min(col("splitk") % n).as("residue") +:
            ProfileCols.flatMap { c =>
              Seq(count(col(c)).cast("long").as(s"cnt_$c"),
                  min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
                  hll_sketch_agg(col(c).cast("string"), lit(lgK)).as(s"sk_$c"))
            })
        batch.agg(aggs.head, aggs.tail: _*)
          .withColumn("increment", lit(id))
          .write.mode("overwrite").parquet(s"$outDir/v=$id")
    }
  }

  /** KEY-SKEW DIAGNOSTIC for the orders→customer key — the pre-flight
    * check behind every salting/AQE-skew decision: row count, key
    * cardinality, the heaviest key and its row count, and the skew ratio
    * max/avg in PPM. A ratio near 1e6 is uniform; a hot key shows up as
    * the number the partitioner would feel. Argmax ties break to the
    * SMALLEST key (stated in the oracle); the ratio is the single fixed
    * double→PPM tree over exact longs.
    *
    * Scale shape: one map-side-combinable groupBy to the key-count table,
    * one aggregate over it, and a 1-row broadcast back to pick the argmax
    * — never a sort of the key table. */
  def keySkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    val kc = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).cast("long").as("cnt"))
    val tot = kc.agg(sum(col("cnt")).cast("long").as("n_rows"),
                     count(lit(1)).cast("long").as("n_keys"),
                     max(col("cnt")).as("max_key_rows"))
    kc.crossJoin(broadcast(tot))
      .filter(col("cnt") === col("max_key_rows"))
      .groupBy(col("n_rows"), col("n_keys"), col("max_key_rows"))
      .agg(min(col("o_custkey")).as("argmax_key"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("argmax_key"),
        round(lit(1000000.0) * col("max_key_rows").cast("double") /
              (col("n_rows").cast("double") / col("n_keys").cast("double")))
          .cast("bigint").as("skew_ppm"))
  }

  /** EQUI-DEPTH QUANTILE DISCRETIZER over the event value — the ML
    * feature-binning pass (and the histogram a CBO prefers over
    * equi-width when the data is skewed): decile edges from the exact
    * sort-based `percentile` (q33's quantile_cont parity), then every
    * value assigned bin = #(edges strictly below it) — a branch-free
    * comparison sum against the broadcast 1-row edge vector, values equal
    * to an edge going LOW. Per bin: count and exact min/max cents.
    *
    * Scale shape: one percentile pass (buffer bounded by distinct cents
    * values), edges broadcast, one map-side-combinable groupBy to the
    * 10-row report. */
  def quantileBinsValue(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Tables.events(spark, sfDir)
      .select(expr("cast(round(value * 100) as bigint)").as("c"))
    val edges = cents.agg(expr(
      "percentile(c, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("es"))
    val bin = (0 until 9).map(i =>
      when(col("c").cast("double") > col("es").getItem(i), 1L).otherwise(0L))
      .reduce(_ + _)
    cents.crossJoin(broadcast(edges))
      .select(bin.as("bin"), col("c"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
           min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
      .orderBy(col("bin"))
  }

  /** SCD2 HISTORY COMPACTION — the maintenance pass every slowly-changing
    * dimension needs once a tracked attribute gets DERIVED at coarser
    * grain: consecutive versions whose VALUE TIER (cents div 10000 — the
    * pricing-band attribute) did not change merge into one interval, the
    * classic gaps-and-islands collapse over [[scd2UserValues]]'s interval
    * chain. Islands form off the exact-integer change marker (tier ≠
    * previous tier → new island via a running sum — the
    * userActivityStreaks machinery applied to intervals); each island
    * emits its first valid_from, and the compacted valid_to is the NEXT
    * island's valid_from via lead() — which sidesteps the NULL-poisoned
    * max(valid_to) of an open last interval entirely and reconstructs
    * the chain property (intervals tile the span, last one open) by
    * construction. n_merged makes the compaction ratio data.
    *
    * Scale shape: everything rides ONE user-keyed exchange (the scd2
    * build's own): the change-marker window, the island rollup, and the
    * lead() all share it. */
  def scd2CompactTiers(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("event_id"))
    val marked = scd2UserValues(spark, sfDir)
      .withColumn("tier", expr("cast(round(value * 100) as bigint) div 10000"))
      .withColumn("chg",
        when(lag(col("tier"), 1).over(w).isNull ||
             col("tier") =!= lag(col("tier"), 1).over(w), 1L).otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    val islands = marked.groupBy(col("user_id"), col("grp"))
      .agg(min(col("tier")).as("tier"),
           min(col("valid_from_us")).as("valid_from_us"),
           count(lit(1)).cast("long").as("n_merged"))
    islands
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"))))
      .select(col("user_id"), col("tier"), col("valid_from_us"),
              col("valid_to_us"), col("n_merged"))
      .orderBy(col("user_id"), col("valid_from_us"))
  }

  /** EXACT WEIGHTED MEDIAN of line-item price weighted by quantity, per
    * return flag — the "median dollar" (half the QUANTITY ships at or
    * below this price), which a plain median-of-rows misstates whenever
    * quantity correlates with price. Deterministic discrete rule, exact
    * integers end to end: the smallest price whose cumulative quantity
    * reaches half the total, i.e. min price with 2·cumw ≥ totw — the
    * doubled-units trick (mannwhitney's) so "half" never materializes a
    * fraction. No percentile interpolation, no floats anywhere.
    *
    * Scale shape: the corpus collapses FIRST to per-(flag, price-cents)
    * weights (map-side combinable); the cumulative window runs over that
    * DISTINCT-PRICE table (bounded by the cents domain, never row count —
    * the mannwhitney bounded-domain contract); the rollup reuses the same
    * flag key. */
  def weightedMedianLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("pc"),
        expr("cast(round(l_quantity) as bigint)").as("q"))
    val g = li.groupBy(col("l_returnflag"), col("pc"))
      .agg(sum(col("q")).cast("long").as("w"))
    val wf = Window.partitionBy(col("l_returnflag"))
    val c = g
      .withColumn("cw", sum(col("w")).over(wf.orderBy(col("pc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .withColumn("tw", sum(col("w")).over(wf).cast("long"))
    c.groupBy(col("l_returnflag"))
      .agg(min(col("tw")).as("total_qty"),
           min(when(lit(2L) * col("cw") >= col("tw"), col("pc")))
             .as("wmedian_cents"))
      .orderBy(col("l_returnflag"))
  }
}
