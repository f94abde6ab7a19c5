package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Behavioral checks for the round-13 text-mining operators on crafted
  * corpora — the properties the corpus-level oracle gate cannot isolate
  * (a known collocation ranking first, an exact duplicate scoring cosine
  * 1.0, the diversity extremes). */
class TextMiningSpec extends SparkSpec {
  import spark.implicits._

  test("pmi_bigrams: an exclusive collocation outranks a promiscuous pair") {
    // "aa bb" always and only together (P(ab)=P(a)=P(b) among themselves);
    // "cc" pairs with everything, so (cc, dd) has high counts but low lift
    val docs = (
      Seq.fill(6)("aa bb") ++
      Seq.fill(6)("cc dd") ++ Seq.fill(6)("cc ee") ++ Seq.fill(6)("cc ff")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val top = TextOps.pmiBigramsOf(docs, minCount = 5L, k = 10).collect()
    assert(top.nonEmpty)
    val best = top.head
    // decode nothing: just assert the top pair's counts are the exclusive
    // pair's (bc = uc1 = uc2 = 6)
    assert(best.getAs[Long]("bc") === 6L &&
      best.getAs[Long]("uc1") === 6L && best.getAs[Long]("uc2") === 6L, best)
    // every score is finite and positive; ordering is non-increasing
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.forall(s => s > 0 && !s.isInfinite))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("doc_sim_sparse_topk: an exact duplicate pair ranks first at cosine 1.0") {
    // docs 0/1 identical (share every shingle); doc 2 overlaps them in one
    // shingle run; docs 3+ provide df >= 2 company so terms survive the cap
    val base = "x1 x2 x3 x4 x5 x6 x7 x8"
    val docs = Seq(
      0L -> base, 1L -> base,
      2L -> "x1 x2 x3 y4 y5 y6 y7 y8",
      3L -> "y4 y5 y6 y7 y8 z1 z2 z3",
      4L -> "z1 z2 z3 z4 z5 z6 z7 z8",
      5L -> "z4 z5 z6 z7 z8 w1 w2 w3"
    ).toDF("doc_id", "text")
    val rows = TextOps.docSimSparseTopKOf(docs, dfCap = 100L, k = 5).collect()
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getAs[Long]("doc_a") === 0L && first.getAs[Long]("doc_b") === 1L, first)
    // identical weight vectors: dot = norm², so the quotient is EXACTLY 1.0
    // (s/(sqrt(s)*sqrt(s)) can drift an ulp, but both norms are the same
    // double here and dot/norm² rounds to 1.0 when dot = n2 exactly... assert
    // to an ulp to stay robust)
    assert(math.abs(first.getAs[Double]("cosine") - 1.0) < 1e-12, first)
    // cosines are non-increasing and within [0, 1+ulp]
    val cs = rows.map(_.getAs[Double]("cosine"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    assert(cs.forall(c => c >= 0.0 && c <= 1.0 + 1e-12))
  }

  test("doc_sim_df_stats: counts re-derived from a constructed df distribution") {
    // disjoint 8-token vocabularies → 6 distinct word-3-gram shingles per
    // text, shared only between copies of the same text, so the df
    // distribution is known by construction: text A df=5 (above cap 3),
    // B df=3, C df=2 (indexed), D df=1 (dead weight)
    def text(p: String) = (1 to 8).map(i => s"$p$i").mkString(" ")
    val docs = (
      Seq.fill(5)(text("a")) ++ Seq.fill(3)(text("b")) ++
      Seq.fill(2)(text("c")) ++ Seq(text("d"))
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = TextOps.docSimDfStatsOf(docs, dfCap = 3L).collect()
    assert(r.length === 1)
    val row = r.head
    // independent re-derivation: 6 shingles per text, pair count per term
    // is df*(df-1)/2 — A: 6 terms * 10 pairs dropped; B: 6*3 + C: 6*1 kept
    assert(row.getAs[Long]("n_terms") === 24L, row)
    assert(row.getAs[Long]("max_df") === 5L, row)
    assert(row.getAs[Long]("n_terms_df1") === 6L, row)
    assert(row.getAs[Long]("n_terms_indexed") === 12L, row)
    assert(row.getAs[Long]("n_dropped_terms") === 6L, row)
    assert(row.getAs[Long]("candidate_pairs") === 6L * 3 + 6L * 1, row)
    assert(row.getAs[Long]("dropped_pairs") === 6L * 10, row)
    // the partition identity every df regime must satisfy
    assert(row.getAs[Long]("n_terms") ===
      row.getAs[Long]("n_terms_df1") + row.getAs[Long]("n_terms_indexed") +
      row.getAs[Long]("n_dropped_terms"))
    // candidate_pairs IS the indexed self-join's output-row bound: measure
    // the actual join the operator runs at the same cap and compare
    val tf = TextOps.docTermTf(docs)
    val kept = tf.groupBy(col("th")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 3)
      .select(col("th").as("kth"))
    val measured = tf.as("a").join(tf.as("b"),
        col("a.th") === col("b.th") && col("a.doc_id") < col("b.doc_id"))
      .join(kept, col("a.th") === col("kth")).count()
    assert(measured === row.getAs[Long]("candidate_pairs"), measured)
  }

  test("token_diversity: single-token source hits simpson 0, all-distinct approaches 1") {
    val docs = Seq(
      ("mono", "aa aa aa aa"),
      ("vari", "b1 b2 b3 b4")
    ).zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) }
      .toDF("doc_id", "source", "text")
    val rows = TextOps.tokenDiversityBySourceOf(docs.select(col("source"), col("text")))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("mono").getAs[Double]("simpson") === 0.0)
    assert(rows("mono").getAs[Double]("ttr") === 0.25)
    // 4 distinct of 4: simpson = 1 - 4/16 = 0.75 (max for N=4)
    assert(rows("vari").getAs[Double]("simpson") === 0.75)
    assert(rows("vari").getAs[Double]("ttr") === 1.0)
  }

  test("vocab drift: dense 2-cell rows per kept token, marginal identity, chi2 = sum of contributions") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val d = TextOps.vocabDriftChi2(spark, Sf0001).cache()
    // dense: every kept token has exactly one cell per half
    assert(d.groupBy(col("th")).count().filter(col("count") =!= 2).count() == 0)
    // kept tokens really clear the floor
    val under = d.groupBy(col("th")).agg(sum(col("obs")).as("rt"))
      .filter(col("rt") < TextOps.VocabDriftMinCount).count()
    assert(under == 0)
    // chi2 identity: sum(obs) == sum(exp) up to fp; chi2 is the capped
    // integer-micro quantization of the contributions — BIT-EXACT against
    // the same fold recomputed here, and within cells*1e-6 of the raw sum
    val r = d.agg(sum(col("obs")).cast("double").as("so"), sum(col("exp")).as("se"),
                  sum(col("contrib")).as("sc"), max(col("chi2")).as("x2"),
                  min(col("chi2")).as("x2min"),
                  (sum(least(floor(col("contrib") * lit(1000000.0)),
                             lit(1000000000000000L)).cast("decimal(38,0)"))
                     .cast("double") / lit(1000000.0)).as("qc"),
                  count(lit(1)).as("cells")).head()
    assert(math.abs(r.getAs[Double]("so") - r.getAs[Double]("se")) < 1e-6)
    assert(r.getAs[Double]("x2") == r.getAs[Double]("qc")) // exact quantized fold
    val floorLoss = r.getAs[Double]("sc") - r.getAs[Double]("x2")
    assert(floorLoss >= -1e-9 && floorLoss <= r.getAs[Long]("cells") * 1e-6 + 1e-9)
    assert(r.getAs[Double]("x2") == r.getAs[Double]("x2min")) // one statistic on every row
    d.unpersist()
  }

  test("doc chunks: spans tile each doc with the stated overlap and cover every token") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val (w, s) = (TextOps.ChunkWindowTokens, TextOps.ChunkStrideTokens)
    val c = TextOps.docChunks(spark, Sf0001).cache()
    // spans are well-formed and within the doc
    assert(c.filter(col("start_tok") < 0 || col("end_tok") > col("n_tok") ||
                    col("chunk_tok") < 0 || col("chunk_tok") > w).count() == 0)
    // chunk 0 starts at 0; the LAST chunk ends at n_tok (full coverage)
    val agg = c.groupBy(col("doc_id"), col("n_tok"))
      .agg(count(lit(1)).as("n_chunks"), min(col("start_tok")).as("s0"),
           max(col("end_tok")).as("eMax"))
    assert(agg.filter(col("s0") =!= 0 || col("eMax") =!= col("n_tok")).count() == 0)
    // short docs take exactly one chunk; long docs the ceil formula
    assert(agg.filter(col("n_tok") <= w && col("n_chunks") =!= 1).count() == 0)
    assert(agg.filter(col("n_tok") > w &&
      col("n_chunks") =!= expr(s"(n_tok - $w + $s - 1) div $s") + 1).count() == 0)
    // the fixture genuinely exercises multi-chunk docs
    assert(agg.filter(col("n_chunks") >= 2).count() > 0)
    // consecutive chunks overlap by exactly w - s while the window is full
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("chunk_id"))
    assert(c.withColumn("prev_end", lag(col("end_tok"), 1).over(wn))
      .filter(col("prev_end").isNotNull && col("prev_end") - col("start_tok") =!= w - s &&
              col("end_tok") =!= col("n_tok"))
      .count() == 0)
    c.unpersist()
  }

  test("repetition stats: n-gram identity, bounded fraction, discriminating flag") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val r = TextOps.repetitionNgramStats(spark, Sf0001).cache()
    assert(r.filter(col("n_distinct") > col("n_ngrams") || col("n_dup") < 0).count() == 0)
    assert(r.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    // a doc with n tokens has exactly max(0, n-2) word 3-grams
    val toks = graft.io.Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long")).as("nt"))
    val j = r.join(toks, "doc_id")
    assert(j.filter(col("n_ngrams") =!= greatest(lit(0L), col("nt") - 2)).count() == 0)
    // the flag is exactly the cross-multiplied 2% test, and non-vacuous
    assert(r.filter((col("is_repetitive") === 1) =!=
      (col("n_ngrams") > 0 &&
       col("n_dup") * TextOps.RepetitionDupDenom >= col("n_ngrams"))).count() == 0)
    val flagged = r.filter(col("is_repetitive") === 1).count()
    assert(flagged > 0 && flagged < r.count())
    r.unpersist()
  }

  test("ppl buckets: partition the scored docs, bucket bounds bracket the mean extremes") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val b = TextOps.pplBucketStats(spark, Sf0001).cache()
    assert(b.count() >= 2) // a one-bucket histogram calibrates nothing
    // buckets partition exactly the docs the LM scorer emitted
    val scored = TextOps.lmBigramScoreSketch(spark, Sf0001).count()
    assert(b.agg(sum(col("n_docs"))).head().getLong(0) == scored)
    // the double mean lives in [int mean, int mean + 1), so each bucket's
    // extremes sit inside [bucket*w, (bucket+1)*w + 1)
    val w = TextOps.PplBucketPpm
    assert(b.filter(col("min_mean_ppm") < col("bucket") * w ||
                    col("max_mean_ppm") >= (col("bucket") + 1) * w + 1).count() == 0)
    b.unpersist()
  }

  test("weighted systematic sample: ≤K draws, banded prefix equals the global window, pick indices strictly increase") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val s = TextOps.sampleWeightedSystematic(spark, Sf0001).cache()
    val k = TextOps.SampleWeightedK
    assert(s.count() <= k && s.count() > k / 2)
    // pick_idx is strictly increasing in doc_id order (each draw consumes
    // at least one quantile) and bounded by K
    val idx = s.orderBy(col("doc_id")).select(col("pick_idx")).collect().map(_.getLong(0))
    assert(idx.zip(idx.tail).forall { case (a, b) => a < b })
    assert(idx.last <= k)
    // the banded two-level prefix sum must equal the textbook single
    // global window bit-for-bit (integer addition is associative)
    val W = org.apache.spark.sql.expressions.Window
    val d = graft.io.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long")).as("w"))
      .withColumn("cum", sum(col("w")).over(
        W.orderBy(col("doc_id")).rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("total", sum(col("w")).over(
        W.orderBy(col("doc_id"))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .filter(col("w") > 0 &&
        expr(s"(cum * $k) div total") > expr(s"((cum - w) * $k) div total"))
      .select(col("doc_id"), col("lang"), col("source"), col("w"),
              expr(s"(cum * $k) div total").as("pick_idx"))
    assert(s.exceptAll(d).count() == 0 && d.exceptAll(s).count() == 0)
    s.unpersist()
  }

  test("inverted index: df band respected, positions dense and doc-ascending, postings deduped") {
    val p = TextOps.invertedIndexPostings(spark, Sf0001).cache()
    assert(p.count() > 0)
    // band: every emitted token's df in [5, 40]; cap: pos never exceeds 32
    assert(p.filter(col("df") < 5 || col("df") > 40).count() == 0)
    assert(p.filter(col("pos") > 32).count() == 0)
    // per token: positions are 1..min(df, 32) dense, doc_ids strictly
    // ascending with pos, and no duplicate doc in a posting list
    val byTok = p.collect().groupBy(_.getAs[Long]("th"))
    byTok.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("pos"))
      val df = sorted.head.getAs[Long]("df")
      assert(sorted.map(_.getAs[Long]("pos")).toSeq ==
        (1L to math.min(df, 32L)).toSeq)
      val docs = sorted.map(_.getAs[Long]("doc_id")).toSeq
      assert(docs == docs.sorted && docs.distinct.size == docs.size)
    }
    p.unpersist()
  }

  test("hybrid rrf: scores recompute from the emitted ranks and the list is rrf-descending") {
    val f = graft.operators.Similarity.hybridRrfTopK(spark, Sf0001).collect()
    assert(f.length == 20)
    f.foreach { r =>
      val lr = r.getAs[Long]("lex_rank")
      val dr = r.getAs[Long]("dense_rank")
      assert(lr >= 0 && lr <= 100 && dr >= 0 && dr <= 100)
      assert(lr > 0 || dr > 0) // a fused doc came from at least one list
      val expect = (if (lr == 0) 0.0 else 1.0 / (60.0 + lr.toDouble)) +
                   (if (dr == 0) 0.0 else 1.0 / (60.0 + dr.toDouble))
      assert(r.getAs[Double]("rrf") == expect)
    }
    // descending with doc_id tie-break
    f.sliding(2).foreach {
      case Array(a, b) =>
        val (ra, rb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
        assert(ra > rb ||
          (ra == rb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ =>
    }
    // both retrievers contribute to the fused head: some doc carries two
    // live ranks, and the top doc beats any single-list-only candidate
    assert(f.exists(r => r.getAs[Long]("lex_rank") > 0 &&
                         r.getAs[Long]("dense_rank") > 0))
  }

  test("hybrid rrf ivf: dense candidates come only from the query's probed trained cells") {
    import graft.operators.Similarity
    // rebuild the shared coarse quantizer the fusion's scale path probes
    // (deterministic training — same input, same seed, same fixed-point
    // sums — so this is THE model, not a lookalike)
    val base = Similarity.baseOf(graft.io.Tables.embeddings(spark, Sf0001))
    val cents = Similarity.kmeansCentroids(base, k = 8, rounds = 2)
    val cluster = Similarity.withCluster(base, cents)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = graft.io.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    def dotl(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val probes = cents
      .map { case (cid, c) => ((dotl(c, c) - 2.0 * dotl(q, c), cid), cid) }
      .sortBy(_._1).take(4).map(_._2).toSet
    val f = graft.operators.Similarity.hybridRrfIvfTopK(spark, Sf0001).collect()
    assert(f.length == 20)
    // every dense-ranked doc sits in one of the query's 4 probed cells;
    // lex-only docs may not
    f.filter(_.getAs[Long]("dense_rank") > 0).foreach { r =>
      assert(probes.contains(cluster(r.getAs[Long]("doc_id"))),
        s"doc ${r.getAs[Long]("doc_id")} dense-ranked from an unprobed cell")
    }
    // the prune changes the dense list (some brute-ranked doc sits outside
    // the probed cells), so the two fusions genuinely differ
    val brute = graft.operators.Similarity.hybridRrfTopK(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_rank"))).toMap
    assert(brute.exists { case (d, dr) => dr > 0 && !probes.contains(cluster(d)) })
  }
}
