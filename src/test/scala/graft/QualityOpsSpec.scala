package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity, TextOps}

/** Repetition-quality stats, pivot/unpivot, and semantic near-dup — the
  * round-4 additions to the corpus-quality and relational surfaces. */
class QualityOpsSpec extends SparkSpec {

  import spark.implicits._

  test("rep_stats: a degenerate repetitive doc fails the gate, a diverse one passes") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),              // one token repeated
      (2L, "alpha beta gamma delta epsilon zeta theta"),  // all distinct
      (3L, "go stop go stop go stop go stop")             // 2 tokens, looping bigrams
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStatsOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap

    val spam = r(1L)
    assert(spam.getAs[Double]("distinct_ratio") === 1.0 / 6.0)
    assert(spam.getAs[Double]("top_token_frac") === 1.0)
    assert(spam.getAs[Double]("dup_bigram_frac") === 4.0 / 5.0)
    assert(spam.getAs[Long]("gopher_ok") === 0L)

    val diverse = r(2L)
    assert(diverse.getAs[Double]("distinct_ratio") === 1.0)
    assert(diverse.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(diverse.getAs[Long]("gopher_ok") === 1L)

    // "go stop ..." has distinct_ratio 0.25 and every bigram after the first
    // two repeated: the bigram signal catches loops token-level stats miss
    val loop = r(3L)
    assert(loop.getAs[Double]("dup_bigram_frac") === 5.0 / 7.0)
    assert(loop.getAs[Long]("gopher_ok") === 0L)
  }

  test("rep_stats: a single-token doc yields zero dup_bigram_frac, not NaN") {
    val r = TextOps.repetitionStatsOf(Seq((9L, "lonely")).toDF("doc_id", "text")).head()
    assert(r.getAs[Long]("n_tokens") === 1L)
    assert(r.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(r.getAs[Double]("top_token_frac") === 1.0)
  }

  test("rep_stats: the gate genuinely discriminates on the corpus") {
    val gate = TextOps.repetitionStats(spark, Sf0001).select(col("gopher_ok"))
      .collect().map(_.getLong(0))
    assert(gate.sum > 0, "no document passes the repetition gate")
    assert(gate.sum < gate.length, "no document fails the repetition gate")
  }

  test("pivot: each cell equals the directly filtered aggregate") {
    val piv = Relational.revenuePivot(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val direct = graft.io.Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)")) *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
        .cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(piv.keySet === Set("A", "N", "R"))
    piv.foreach { case (rf, (f, o)) =>
      assert(f === direct((rf, "F")))
      assert(o === direct((rf, "O")))
    }
  }

  test("unpivot: two rows per part, values round-trip") {
    val parts = graft.io.Tables.part(spark, Sf0001)
    val nParts = parts.count()
    val up = Relational.partMetricsUnpivot(spark, Sf0001)
    assert(up.count() === 2 * nParts)
    val one = parts.orderBy(col("p_partkey")).head()
    val firstTwo = up.filter(col("p_partkey") === one.getLong(0))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(firstTwo("p_size") === one.getAs[Int]("p_size").toDouble)
    assert(firstTwo("p_retailprice") === one.getAs[Double]("p_retailprice"))
  }

  test("semantic near-dup: pairs clear the threshold, stay ordered, and live in one trained cell") {
    val pairs = Similarity.semanticNearDup(spark, Sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
    // no duplicate pairs despite the 4-band OR-construction
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length === ids.length)
  }

  test("pii_scrub: planted emails and phones are counted and redacted byte-exactly") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "contact alice.smith+spam@example-mail.co or 555-123-4567 today"),
      (2L, "no pii in this perfectly ordinary document"),
      (3L, "two mails a@b.io c.d@e.org and a dotted phone 800.555.1212")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrubOf(docs).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 2L, 1L)))
    // the emitted md5 pins the REPLACEMENT, not just the counts
    val expMd5 = Seq("contact <EMAIL> or <PHONE> today").toDF("t")
      .select(md5(col("t"))).head().getString(0)
    assert(got(0).getString(3) === expMd5)
  }

  test("curation manifest: exact-dedup gate catches LSH-invisible duplicate clusters") {
    import graft.operators.Pipeline
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    val docs = (
      // 250 identical copies: one > MaxLshBucketSize bucket in EVERY band,
      // so the capped LSH path generates no candidate pairs for them
      (1 to 250).map(i => (i.toLong, boiler, "en", "web")) ++ Seq(
        // identical but too short to shingle: never enters a band at all
        (300L, "hi", "en", "web"),
        (301L, "hi", "en", "web"),
        (400L, "a genuinely distinct document about catalyst plan shapes", "en", "web"))
    ).toDF("doc_id", "text", "lang", "source")
    val m = Pipeline.curationManifestOf(docs).cache()
    try {
      assert(m.count() === 253)
      // of the 250-copy boilerplate cluster exactly the min doc_id survives
      val boilerKeeps = m.filter(col("doc_id") <= 250L && col("keep") === 1L)
        .select("doc_id").as[Long].collect()
      assert(boilerKeeps.toSeq === Seq(1L))
      // the short identical pair is collapsed by the exact gate too
      val shortKeeps = m.filter(col("doc_id").isin(300L, 301L) && col("keep") === 1L)
        .select("doc_id").as[Long].collect()
      assert(shortKeeps.toSeq === Seq(300L))
      // a unique document keeps itself
      assert(m.filter(col("doc_id") === 400L).head().getAs[Long]("keep") === 1L)
    } finally m.unpersist()
  }
}
