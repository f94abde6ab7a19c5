package graft

import org.apache.spark.sql.functions._
import graft.operators.{FreqSketch, TextOps}

class FreqSketchSpec extends SparkSpec {

  test("vocab_topk_sketch equals the exact vocab_topk at non-overflow capacity") {
    val exact = TextOps.vocabTopK(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sketched = FreqSketch.vocabTopKSketch(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sketched.toSeq === exact.toSeq)
  }

  test("streaming sketch (complete-mode global agg) equals the exact top-k") {
    val exact = TextOps.vocabTopK(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val streamed = FreqSketch.vocabTopKSketchStreaming(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq === exact.toSeq)
  }

  test("keyed sketch equals the exact per-lang ranked top-k") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.io.Tables.documents(spark, Sf0001)
    val exact = d.select(col("lang"), col("doc_id"),
        explode(array_distinct(
          graft.functions.TextFunctions.tokenHashes(col("text")))).as("th"))
      .distinct()
      .groupBy(col("lang"), col("th")).agg(count(lit(1)).as("df"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("df").desc, col("th").asc)))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk").cast("long"), col("th"), col("df"))
      .orderBy(col("lang"), col("rk"))
      .collect().map(_.toSeq).toSeq
    val sketched = FreqSketch.vocabTopKByLangSketch(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(sketched === exact)
    assert(sketched.nonEmpty)
  }

  test("sketch plan: partial summaries merge through ONE single-partition " +
       "exchange — no vocabulary-keyed shuffle anywhere") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val th = graft.io.Tables.documentsNarrow(spark, Sf0001)
      .select(explode(array_distinct(
        graft.functions.TextFunctions.tokenHashes(col("text")))).as("th"))
      .as[Long]
    val p = th.select(FreqSketch.MGAgg(4096).toColumn)
      .queryExecution.executedPlan.toString
    // partial aggregation happens map-side (below the exchange), so the only
    // exchange in the plan carries <= capacity-entry summaries to one reducer
    assert(p.contains("SinglePartition"), p)
    assert(!p.contains("hashpartitioning(th"), p)
  }

  test("windowed sketch: top users per day equal the exact per-window counts; " +
       "the shuffle is keyed on the window, never the user") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val got = FreqSketch.topKUsersDailySketch(spark, Sf0001)
    val exact = graft.io.Tables.events(spark, Sf0001)
      .select(unix_timestamp(date_trunc("day", col("ts"))).cast("long").as("day_start"),
              col("user_id"))
      .groupBy(col("day_start"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("day_start"))
        .orderBy(col("n_events").desc, col("user_id").asc)).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("day_start"), col("rk"), col("user_id"), col("n_events"))
      .orderBy(col("day_start"), col("rk"))
    assert(got.collect().toSeq === exact.collect().toSeq)
    assert(got.count() > 0)
    // the scale claim: no exchange is keyed on the item (user) column —
    // partial per-window summaries combine map-side and only window-keyed
    // summaries cross the wire
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning(user_id"), p)
  }

  test("count-min estimates equal exact df on the test vocabulary") {
    val exact = graft.io.Tables.documentsNarrow(spark, Sf0001)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.tokenHashes(col("text")))).as("th"))
      .distinct()
      .groupBy(col("th")).agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = FreqSketch.tokenDfCountMin(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    for ((th, df) <- got) assert(df === exact(th), s"token $th")
  }

  test("TWS keyed sketch (ValueState per language) equals the batch keyed sketch") {
    // the streaming twin: same ranked per-language top-k as the batch form,
    // produced through the real micro-batch engine with cross-batch state
    // (the drain itself asserts >= 2 data batches)
    val batch = FreqSketch.vocabTopKByLangSketch(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    val streamed = FreqSketch.vocabTopKByLangSketchTws(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("token_rarity_sketch equals the exact broadcast form on the test vocabulary") {
    // the open-vocabulary variant: CM point estimates replace the exact
    // counts broadcast — collision-free at w=1024 on this corpus, so every
    // per-doc stat (n_tokens, sum_cnt, rare_n, ratios) is bit-identical
    val exact = TextOps.tokenRarity(spark, Sf0001).collect().map(_.toSeq).toSeq
    val sketched = TextOps.tokenRaritySketch(spark, Sf0001).collect().map(_.toSeq).toSeq
    assert(sketched === exact)
    assert(sketched.nonEmpty)
  }

  test("cm_estimate expression agrees with the aggregator's JVM-side estimate") {
    import spark.implicits._
    // one shared hash definition (HashKernels.cmCell) probed two ways: the
    // driver-side CMAgg.estimate and the codegen'd column expression must
    // agree for every item, INCLUDING items never inserted (both sides
    // return the same collision cell sums)
    val agg = FreqSketch.CMAgg(w = 64, d = 4)
    val items = (0L until 300L).flatMap(i => Seq.fill((i % 5 + 1).toInt)(i * 7919L))
    val cm = spark.createDataset(items.toVector).repartition(4).as[Long]
      .select(agg.toColumn).head()
    val probes = (0L until 400L).map(_ * 7919L) // 100 of them never inserted
    val viaExpr = spark.createDataset(probes.toVector).toDF("x")
      .select(col("x"), graft.functions.HashExpressions.cm_estimate(
        col("x"), cm.cells, 64, 4).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (x <- probes)
      assert(viaExpr(x) === agg.estimate(cm, x), s"item $x")
  }

  test("count-min never underestimates, even at colliding widths") {
    import spark.implicits._
    // 200 distinct items into w=16: collisions guaranteed; the min-over-rows
    // estimate must stay >= truth for every item (the one-sided CM bound)
    val agg = FreqSketch.CMAgg(w = 16, d = 4)
    val items = (0L until 200L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i))
    val truth = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val cm = spark.createDataset(items.toVector).repartition(8).as[Long]
      .select(agg.toColumn).head()
    assert(cm.n === items.size)
    for ((item, t) <- truth)
      assert(agg.estimate(cm, item) >= t, s"underestimate for $item")
  }

  test("Misra-Gries guarantees hold on an overflowing, skewed stream") {
    import spark.implicits._
    val capacity = 9
    // 10 heavy items (ids 0-9, frequency 1000-100) + 5000 singleton ids:
    // distinct count 5010 >> capacity, so decrements and merge-trims fire
    val heavy = (0 until 10).flatMap(i => Seq.fill((10 - i) * 100)(i.toLong))
    val noise = (1000L until 6000L)
    val items = heavy ++ noise
    val n = items.size
    val truth = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    // 8 partitions so the merge path (not just reduce) is exercised
    // seeded shuffle: a failure (e.g. a merge-logic regression that only
    // manifests under a specific partition split) must replay from the seed
    val summary = FreqSketch.sketch(
      spark.createDataset(new scala.util.Random(42).shuffle(items.toVector))
        .repartition(8).as[Long],
      capacity)
    assert(summary.n === n)
    assert(summary.counters.size <= capacity)
    val bound = n.toDouble / (capacity + 1)
    for ((item, est) <- summary.counters) {
      val t = truth(item)
      assert(est <= t, s"overestimate for $item: $est > $t")
      assert(est >= t - bound, s"estimate for $item below bound: $est < $t - $bound")
    }
    // completeness: every item more frequent than the bound must survive
    for ((item, t) <- truth if t > bound)
      assert(summary.counters.contains(item),
        s"heavy item $item (freq $t > bound $bound) missing from summary")
  }
}
