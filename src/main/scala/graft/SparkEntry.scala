package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{Dedup, KeyedOps, Relational, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: q1..q4 are the reference's four keyed-state jobs
  * (SURVEY.md §2.1 A1..A4) re-targeted onto the `events` table with a
  * deterministic total order (ts, event_id); q5+ are the relational surface
  * (joins, top-k, pushdown, semi-join, distinct, rollup); the named queries
  * are the training-data-pipeline operators (text analysis, dedup,
  * similarity search).
  *
  * Oracle parity rules used throughout (and verified bit-exact locally):
  *  - money/value aggregates: exact DECIMAL(18,x) sums cast to DOUBLE at the
  *    end — partial-aggregation order can't perturb the result;
  *  - integer outputs: long on the Spark side (DuckDB emits BIGINT);
  *  - text hashing: polynomial ASCII hashes (integer arithmetic only);
  *  - cosine: sequential-fold dot products in double (bit-equal to DuckDB's
  *    list_dot_product on DOUBLE[]);
  *  - every query ends in the same deterministic ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  private val P = graft.functions.TextFunctions.HashMod // 1000000007

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: the four keyed-state jobs (batch window forms) ----
    "q1_running_max" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("yr", year(col("ts")).cast("long"))
      KeyedOps.runningMax(ev, Seq(col("yr")), Seq(col("ts_ns"), col("event_id")),
          col("value"), "run_max")
        .select(col("event_id"), col("yr"), col("run_max"))
        .orderBy(col("event_id"))
    }),
    "q2_block_avg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      KeyedOps.blockAverage(ev, Seq(col("event_type")), Seq(col("ts_ns"), col("event_id")),
          col("value"), "avg_value")
        .orderBy(col("event_type"), col("block"))
    }),
    "q3_running_max_month" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("yr", year(col("ts")).cast("long"))
        .withColumn("mon", month(col("ts")).cast("long"))
      KeyedOps.runningMax(ev, Seq(col("yr"), col("mon")), Seq(col("ts_ns"), col("event_id")),
          col("value"), "run_max")
        .select(col("event_id"), col("yr"), col("mon"), col("run_max"))
        .orderBy(col("event_id"))
    }),
    "q4_threshold_gaps" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      KeyedOps.thresholdGaps(ev, Seq(col("event_type")), Seq(col("ts_ns"), col("event_id")),
          col("value"), 100.0, "gap")
        .select(col("event_id"), col("event_type"), col("gap"))
        .orderBy(col("event_id"))
    }),
    // ---- relational surface ----
    "q5_pricing_summary"  -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "q6_revenue_by_nation" -> ((s, dir) => Relational.revenueByNation(s, dir)),
    "q7_top_parts"        -> ((s, dir) => Relational.topPartsByBrand(s, dir)),
    "q8_filtered_revenue" -> ((s, dir) => Relational.filteredRevenue(s, dir)),
    "q9_order_priority"   -> ((s, dir) => Relational.orderPriorityCounts(s, dir)),
    "q10_distinct_counts" -> ((s, dir) => Relational.distinctCounts(s, dir)),
    "q11_orders_rollup"   -> ((s, dir) => Relational.ordersRollup(s, dir)),
    // ---- training-data pipeline: text analysis ----
    "text_stats"       -> ((s, dir) => TextOps.textStats(s, dir)),
    "lang_id"          -> ((s, dir) => TextOps.langId(s, dir)),
    "doc_fingerprints" -> ((s, dir) => TextOps.fingerprints(s, dir)),
    // ---- training-data pipeline: dedup ----
    "dedup_exact"      -> ((s, dir) => Dedup.exact(s, dir)),
  )

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(18,4))"
  private val decDisc  = "CAST(l_discount AS DECIMAL(18,4))"
  private val one      = "CAST(1 AS DECIMAL(18,4))"
  private val revenueExpr =
    s"CAST(sum($decPrice * ($one - $decDisc)) AS DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "q1_running_max" ->
      """SELECT event_id, CAST(year(ts) AS BIGINT) AS yr,
        | max(value) OVER (PARTITION BY year(ts) ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        |FROM events ORDER BY event_id""".stripMargin,
    "q2_block_avg" ->
      """WITH t AS (
        | SELECT event_type, value,
        |   row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
        |   count(*) OVER (PARTITION BY event_type) AS n
        | FROM events)
        |SELECT event_type, CAST(floor((rn-1)/51.0) AS BIGINT) AS block,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/50 AS avg_value
        |FROM t
        |WHERE (rn-1)%51 < 50 AND floor((rn-1)/51.0) < floor(n/51.0)
        |GROUP BY event_type, CAST(floor((rn-1)/51.0) AS BIGINT)
        |ORDER BY event_type, block""".stripMargin,
    "q3_running_max_month" ->
      """SELECT event_id, CAST(year(ts) AS BIGINT) AS yr, CAST(month(ts) AS BIGINT) AS mon,
        | max(value) OVER (PARTITION BY year(ts), month(ts) ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        |FROM events ORDER BY event_id""".stripMargin,
    "q4_threshold_gaps" ->
      """WITH t AS (
        | SELECT event_id, event_type, value, ts,
        |  sum(CASE WHEN value < 100.0 THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        | FROM events),
        |b AS (SELECT event_id, event_type, ts, c FROM t WHERE value >= 100.0)
        |SELECT event_id, event_type,
        |  CAST(c - coalesce(lag(c) OVER (PARTITION BY event_type ORDER BY ts, event_id), 0) AS BIGINT) AS gap
        |FROM b ORDER BY event_id""".stripMargin,
    "q5_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         | CAST(sum($decPrice) AS DOUBLE) AS sum_base_price,
         | $revenueExpr AS sum_disc_price,
         | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/count(*) AS avg_qty,
         | CAST(sum($decPrice) AS DOUBLE)/count(*) AS avg_price,
         | CAST(sum($decDisc) AS DOUBLE)/count(*) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_by_nation" ->
      s"""SELECT n_name, $revenueExpr AS revenue, count(*) AS n_lineitems
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q7_top_parts" ->
      s"""WITH rev AS (
         | SELECT l_partkey, $revenueExpr AS revenue
         | FROM lineitem GROUP BY l_partkey),
         |rk AS (
         | SELECT p_brand, p_partkey, revenue,
         |  row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rk
         | FROM rev JOIN part ON l_partkey = p_partkey)
         |SELECT p_brand, rk, p_partkey, revenue
         |FROM rk WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q8_filtered_revenue" ->
      s"""SELECT CAST(sum($decPrice * $decDisc) AS DOUBLE) AS revenue, count(*) AS n_rows
         |FROM lineitem
         |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q9_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_distinct_counts" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_orders_rollup" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)
        |ORDER BY o_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "text_stats" ->
      """WITH t AS (
        | SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
        |  length(text) AS n_chars,
        |  len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS n_stop
        | FROM documents)
        |SELECT doc_id, n_tokens, n_bpe_tokens, n_chars, n_stop,
        | CAST(n_chars - (n_tokens-1) AS DOUBLE)/n_tokens AS avg_token_len,
        | CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
        | CAST(least(n_tokens,100) AS DOUBLE)/100.0*(1.0 - CAST(n_stop AS DOUBLE)/n_tokens) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH t AS (
        | SELECT doc_id,
        |  len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS score_en,
        |  len(list_filter(string_split(text,' '), x -> x='der' OR x='die' OR x='und')) AS score_de,
        |  len(list_filter(string_split(text,' '), x -> x='le' OR x='la' OR x='et')) AS score_fr,
        |  len(list_filter(string_split(text,' '), x -> x='el' OR x='los' OR x='y')) AS score_es
        | FROM documents)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        | CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
        |  WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
        |  WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
        |  WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
        |  ELSE 'es' END AS lang_guess
        |FROM t ORDER BY doc_id""".stripMargin,
    "doc_fingerprints" ->
      s"""SELECT doc_id,
         | md5(lower(trim(text))) AS fp_md5,
         | list_reduce(
         |   list_transform(string_split(text,' '),
         |     t -> list_reduce(list_transform(string_split(t,''), c -> CAST(ascii(c) AS BIGINT)),
         |                      (a,b) -> (a*31+b) % $P)),
         |   (a,b) -> (a*31+b) % $P) AS fp_poly
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp_md5, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(lower(trim(text))) ORDER BY fp_md5""".stripMargin,
  )
}
