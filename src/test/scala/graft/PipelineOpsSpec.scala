package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Pipeline, TextOps}

/** Structural invariants of the composite pipeline operators (values are
  * oracle-gated: quality_filter, winnow_fingerprints, dedup_decisions). */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  test("quality_filter agrees with text_stats and lang_id on the kept set") {
    val kept = TextOps.qualityFilter(spark, Sf0001).cache()
    try {
      assert(kept.count() > 0)
      val stats = TextOps.textStats(spark, Sf0001)
        .select(col("doc_id"), col("quality_score").as("qs"))
      val langs = TextOps.langId(spark, Sf0001)
        .select(col("doc_id"), col("lang_guess").as("lg"))
      val joined = kept.join(stats, "doc_id").join(langs, "doc_id")
      assert(joined.filter(col("qs") =!= col("quality_score")).count() === 0)
      assert(joined.filter(col("lg") =!= lit("en")).count() === 0)
      assert(kept.filter(col("quality_score") < 0.5).count() === 0)
    } finally kept.unpersist()
  }

  test("winnowing: fingerprints come from the shingle set; identical docs share all of them") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words forming an unrelated document body here"),
      (4L, "too short")).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprintsOf(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // identical texts -> identical fingerprint sets
    assert(fps(1L) === fps(2L))
    assert(fps(1L).nonEmpty)
    // disjoint content -> disjoint fingerprints
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    // docs with < w shingles produce no fingerprints (not a crash, not junk)
    assert(!fps.contains(4L))
    // every fingerprint is one of the doc's shingle hashes
    val shingles = docs.filter(col("doc_id") === 1L)
      .select(explode(shingleHashes(col("text"), 3)).as("sh"))
      .as[Long].collect().toSet
    assert(fps(1L).subsetOf(shingles))
  }

  test("winnow kernel equals the HOF formulation on the real corpus") {
    val docs = graft.io.Tables.documentsNarrow(spark, Sf0001)
    val sh = shingleHashes(col("text"), 3)
    val viaHof = docs.select(col("doc_id"),
        explode(when(size(sh) >= 4,
          array_distinct(transform(sequence(lit(0), size(sh) - 4),
            i => array_min(slice(sh, i + 1, lit(4))))))
          .otherwise(typedLit(Array.empty[Long]))).as("fp"))
      .orderBy(col("doc_id"), col("fp")).collect().map(_.toSeq)
    val viaKernel = TextOps.winnowFingerprintsOf(docs).collect().map(_.toSeq)
    assert(viaKernel.toSeq === viaHof.toSeq)
  }

  test("property: chunkHashes kernel equals the naive grouped fold on random arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val P = graft.functions.HashKernels.P
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      val len = rnd.nextInt(40)
      val n = 1 + rnd.nextInt(6)
      val arr = Array.fill(len)(rnd.nextLong().abs % P)
      val naive = arr.grouped(n).map(_.foldLeft(0L)((a, x) => (a * 31 + x) % P)).toSeq
      val got = graft.functions.HashKernels
        .chunkHashes(new GenericArrayData(arr), n).toLongArray.toSeq
      assert(got === naive, s"trial=$trial len=$len n=$n")
    }
  }

  test("property: winnowMins kernel equals the naive sliding-min-distinct on random arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(30)
      val w = 1 + rnd.nextInt(8)
      // small value range to exercise duplicate minima and tie handling
      val arr = Array.fill(n)(rnd.nextInt(10).toLong)
      val naive = (0 to n - w).map(i => arr.slice(i, i + w).min).distinct
      val got = graft.functions.HashKernels
        .winnowMins(new GenericArrayData(arr), w).toLongArray.toSeq
      assert(got === naive, s"trial=$trial n=$n w=$w arr=${arr.mkString(",")}")
    }
  }

  test("stratified split: exact per-stratum proportions, deterministic, total coverage") {
    val s = TextOps.stratifiedSplit(spark, Sf0001).cache()
    try {
      val docs = graft.io.Tables.documents(spark, Sf0001)
      assert(s.count() === docs.count()) // every doc lands in exactly one split
      // per-stratum proportions are exact up to the round-robin remainder:
      // each full deal of 10 gives 8/1/1
      val perStratum = s.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("split") === "train", 1L).otherwise(0L)).as("tr"),
             sum(when(col("split") === "val", 1L).otherwise(0L)).as("va"),
             sum(when(col("split") === "test", 1L).otherwise(0L)).as("te"))
        .collect()
      perStratum.foreach { r =>
        val (n, tr, va, te) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(tr + va + te === n)
        assert(tr >= (n / 10) * 8 && tr <= (n / 10) * 8 + 8, s"train=$tr of n=$n")
        assert(va <= n / 10 + 1 && te <= n / 10 + 1)
      }
      // rerun is byte-identical (no rand(), no partition-order dependence)
      val again = TextOps.stratifiedSplit(spark, Sf0001)
      assert(s.exceptAll(again).isEmpty && again.exceptAll(s).isEmpty)
    } finally s.unpersist()
  }

  test("time-embargo split: ordered bands partition the day domain; cut at the 8th decile") {
    val s = TextOps.splitTimeEmbargo(spark, Sf0001).collect()
    val ev = graft.io.Tables.events(spark, Sf0001)
    // per-day rows cover every event exactly once
    assert(s.map(_.getAs[Long]("n_events")).sum === ev.count())
    val byDay = s.map(r => r.getAs[Long]("day") -> r.getAs[String]("split"))
    assert(byDay.map(_._1).distinct.length === byDay.length) // one split per day
    def days(k: String) = byDay.filter(_._2 == k).map(_._1)
    val (tr, em, te) = (days("train"), days("embargo"), days("test"))
    assert(tr.nonEmpty && te.nonEmpty)
    // strict temporal order train < embargo < test — the leak-free property
    assert((em ++ te).forall(_ > tr.max))
    assert(em.forall(_ < te.min))
    // the cut is the 8th-decile distinct day: train day count re-derives
    // as cutIdx + 1 over the sorted distinct-day list
    val allDays = byDay.map(_._1).sorted
    val cutIdx = ((allDays.length - 1) * 8) / 10
    assert(tr.length === cutIdx + 1)
    assert(tr.max === allDays(cutIdx))
    // the embargo band is at most embargoDays wide and hugs the cut
    assert(em.forall(d => d > tr.max && d <= tr.max + 2))
  }

  test("mix_sample: deterministic per-source rates; corpus_mix fractions sum to 1") {
    val docs = (1L to 900L).map(i =>
      (i, s"w$i", "en", Seq("a", "b", "c")((i % 3).toInt))).toDF("doc_id", "text", "lang", "source")
    val kept = TextOps.mixSampleOf(
      docs.select(col("doc_id"), col("lang"), col("source")),
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5).cache()
    try {
      // rate 1.0 keeps everything, rate 0.0 keeps nothing
      assert(kept.filter(col("source") === "a").count() === 300)
      assert(kept.filter(col("source") === "b").count() === 0)
      // the default rate lands near 0.5 (hash-uniform, not exact)
      val c = kept.filter(col("source") === "c").count()
      assert(c > 100 && c < 200, s"c=$c")
      // rerun is byte-identical — retries cannot change the corpus
      val again = TextOps.mixSampleOf(
        docs.select(col("doc_id"), col("lang"), col("source")),
        Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
      assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    } finally kept.unpersist()
    val mix = TextOps.corpusMixOf(docs.select(col("lang"), col("source"), col("text")))
      .agg(sum(col("token_frac"))).head().getDouble(0)
    assert(math.abs(mix - 1.0) < 1e-9)
  }

  test("pack_assign: contiguous greedy packing, chunk-decomposition-invariant") {
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (5L, "f g h i"), (9L, "j"), (12L, "k l m n o"))
      .toDF("doc_id", "text")
    // prefix token sums before each doc: 0, 3, 5, 9, 10 → packs 0, 0, 1, 1, 2
    val exp = Seq((1L, 3L, 0L), (2L, 2L, 0L), (5L, 4L, 1L), (9L, 1L, 1L), (12L, 5L, 2L))
    val small = TextOps.packAssignOf(docs, budget = 5L, chunk = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(small === exp)
    // one chunk holding everything must give the identical assignment
    val one = TextOps.packAssignOf(docs, budget = 5L, chunk = 1L << 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(one === exp)
  }

  test("mix_rates: binding source keeps everything; realized mixture follows the weights") {
    val docs = Seq(
      ("a", (1 to 10).map(i => s"w$i").mkString(" ")),  // 10 tokens
      ("b", (1 to 40).map(i => s"x$i").mkString(" "))   // 40 tokens
    ).toDF("source", "text")
    val r = TextOps.mixRatesOf(docs, Map.empty, defaultWeight = 1.0).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(3)))).toMap
    // equal weights: c = min(10, 40) = 10 → a keeps all, b keeps a quarter
    assert(r("a") === ((10L, 1.0)))
    assert(r("b") === ((40L, 0.25)))
    // weight a 3x: realized token proportions must be 3:1
    val r2 = TextOps.mixRatesOf(docs, Map("a" -> 3.0), defaultWeight = 1.0).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r2("a") === 1.0)
    assert(math.abs((r2("a") * 10) / (r2("b") * 40) - 3.0) < 1e-12)
    assert(r2.values.forall(v => v > 0.0 && v <= 1.0))
    // a zero-token source (all-NULL text) takes rate 0 and must not zero
    // the binding min for everyone else
    val withEmpty = docs.union(Seq(("z", Option.empty[String])).toDF("source", "text"))
    val r3 = TextOps.mixRatesOf(withEmpty, Map.empty, defaultWeight = 1.0).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r3("z") === 0.0)
    assert(r3("a") === 1.0 && r3("b") === 0.25)
  }

  test("temperature mix: α=1/2 damps the head, boosts the tail, and the most-boosted keeps all") {
    // 16:4:1 token skew — sqrt flattens to 4:2:1
    val docs = Seq(
      ("en", (1 to 16).map(i => s"a$i").mkString(" ")),
      ("de", (1 to 4).map(i => s"b$i").mkString(" ")),
      ("fr", "c1")).toDF("lang", "text")
    val r = TextOps.corpusMixTemperatureOf(docs).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    val den = math.sqrt(16.0) + math.sqrt(4.0) + math.sqrt(1.0) // 7
    for ((lang, n) <- Seq("en" -> 16L, "de" -> 4L, "fr" -> 1L)) {
      val (nt, share, tw, boost, _) = r(lang)
      assert(nt == n)
      assert(math.abs(share - n / 21.0) < 1e-15)
      assert(math.abs(tw - math.sqrt(n.toDouble) / den) < 1e-15)
      assert(math.abs(boost - tw / share) < 1e-15)
    }
    // flattened weights still sum to one; head damped, tail boosted
    assert(math.abs(r.values.map(_._3).sum - 1.0) < 1e-12)
    assert(r("en")._4 < 1.0 && r("fr")._4 > 1.0)
    // the most-boosted language keeps everything; rates follow q/p up to
    // that normalization, so realized token mass is proportional to q
    assert(r("fr")._5 === 1.0)
    val mass = r.map { case (_, (nt, _, tw, _, rate)) => (nt * rate, tw) }
    val ratio = mass.map { case (m, tw) => m / tw }.toSeq
    assert(ratio.forall(x => math.abs(x - ratio.head) < 1e-9),
      "kept tokens must realize the temperature-flattened mixture")
  }

  test("temperature mix: a zero-token language takes rate 0 and cannot NaN-poison the rest") {
    val docs = Seq(
      ("en", Option((1 to 9).map(i => s"a$i").mkString(" "))),
      ("de", Option((1 to 4).map(i => s"b$i").mkString(" "))),
      ("xx", Option.empty[String])).toDF("lang", "text")
    val r = TextOps.corpusMixTemperatureOf(docs).collect()
      .map(x => x.getString(0) -> ((x.getDouble(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    // the empty stratum is zeroed, not NaN (0/0 → NaN would propagate
    // through max(boost) and zero EVERY language's rate)
    assert(r("xx") === ((0.0, 0.0, 0.0)))
    for ((lang, (tw, boost, rate)) <- r) {
      assert(!tw.isNaN && !boost.isNaN && !rate.isNaN, s"$lang must not be NaN")
    }
    // the real languages keep the usual temperature shape
    assert(r("de")._3 === 1.0, "most-boosted real language keeps everything")
    assert(r("en")._3 > 0.0 && r("en")._3 < 1.0)
  }

  test("temperature sample keeps exactly the below-threshold hashes of the derived rates") {
    val dir = Sf0001
    val P = graft.functions.TextFunctions.HashMod
    val rates = TextOps.corpusMixTemperature(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    val kept = TextOps.mixSampleTemperature(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val all = graft.io.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // membership is exactly the hash-threshold predicate of the DATA-derived rate
    for ((id, lang) <- all) {
      val h = ((id % P) * TextOps.MixMultiplier) % P
      val thr = math.floor(rates(lang) * P).toLong
      assert(kept.contains(id) == (h < thr), s"doc $id ($lang)")
    }
    // the most-boosted language is kept whole; some other language shrinks
    val maxLang = rates.maxBy(_._2)._1
    val byLang = all.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang(maxLang).forall(kept.contains))
    assert(all.size > kept.size, "temperature flattening must drop something")
  }

  test("pack_assign and corpus_mix count NULL text as zero tokens (oracle parity)") {
    // a NULL text is pinned to ZERO tokens on both engines (the oracle
    // coalesces identically) — without the pin, the emitted n_tokens value
    // is whatever each engine's null propagation produces
    val docs = Seq((1L, Option("a b c")), (2L, Option.empty[String]), (3L, Option("d e")))
      .toDF("doc_id", "text")
    val p = TextOps.packAssignOf(docs, budget = 3L, chunk = 16L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // token counts 3, 0, 2; prefix sums 0, 3, 3 → packs 0, 1, 1
    assert(p === Seq((1L, 3L, 0L), (2L, 0L, 1L), (3L, 2L, 1L)))
    val mix = TextOps.corpusMixOf(
      Seq(("en", "a", Option("x y")), ("en", "a", Option.empty[String]),
          ("en", "b", Option("z"))).toDF("lang", "source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(mix === Seq(("en", "a", 2L, 2L, 2.0 / 3.0), ("en", "b", 1L, 1L, 1.0 / 3.0)))
  }

  test("pack_assign on the corpus: packs are contiguous, ordered, near-budget") {
    val p = TextOps.packAssign(spark, Sf0001, budget = 2048L).cache()
    try {
      assert(p.count() === graft.io.Tables.documents(spark, Sf0001).count())
      // pack ids are monotone in doc_id (contiguity) and start at 0
      val rows = p.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.head._3 === 0L)
      assert(rows.sliding(2).forall { case Array(a, b) => b._3 >= a._3; case _ => true })
      // every pack except possibly the last holds < budget + max_doc_tokens
      val maxDoc = rows.map(_._2).max
      val perPack = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
      perPack.toSeq.sortBy(_._1).dropRight(1).foreach { case (_, tot) =>
        assert(tot < 2048L + maxDoc)
      }
    } finally p.unpersist()
  }

  test("tfidf top terms: k rows per doc, scores consistent with tf and df") {
    val t = TextOps.tfidfTopTerms(spark, Sf0001, k = 3).cache()
    try {
      assert(t.count() > 0)
      // rank runs 1..k per doc with strictly descending (score, th) order
      val bad = t.withColumn("prev",
          lag(col("score"), 1).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("rk"))))
        .filter(col("prev").isNotNull && col("prev") < col("score"))
      assert(bad.count() === 0)
      // score = tf * N / df exactly
      val n = graft.io.Tables.documents(spark, Sf0001).count().toDouble
      val off = t.filter(
        abs(col("score") - col("tf") * lit(n) / col("df")) > lit(1e-12)).count()
      assert(off === 0)
      // a token appearing in every document is never a top term of any
      // multi-token doc unless its tf dominates: df == N gives score == tf
      assert(t.filter(col("df") > n).count() === 0)
    } finally t.unpersist()
  }

  test("curation manifest agrees with its three ingredient operators") {
    val m = Pipeline.curationManifest(spark, Sf0001).cache()
    try {
      val nDocs = graft.io.Tables.documents(spark, Sf0001).count()
      assert(m.count() === nDocs)
      // manifest keep = near-dup keeper (dedup_decisions) AND exact-dup
      // representative (min doc_id per content fingerprint)
      val dec = Dedup.dedupDecisions(spark, Sf0001)
        .select(col("doc_id"), col("keep").as("k2"))
      val fps = graft.io.Tables.documents(spark, Sf0001)
        .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      val exRep = fps.join(fps.groupBy("fp").agg(min("doc_id").as("exk")), "fp")
        .select(col("doc_id"), (col("doc_id") === col("exk")).as("isx"))
      assert(m.join(dec, "doc_id").join(exRep, "doc_id")
        .filter(col("keep") =!= (col("k2") === 1L && col("isx")).cast("long"))
        .count() === 0)
      val sp = TextOps.stratifiedSplit(spark, Sf0001)
        .select(col("doc_id"), col("split").as("s2"))
      assert(m.join(sp, "doc_id").filter(col("split") =!= col("s2")).count() === 0)
      assert(m.filter(col("selected") === 1L &&
        !(col("keep") === 1L && col("lang_guess") === "en" &&
          col("quality_score") >= 0.5 && col("split") === "train")).count() === 0)
      val nSel = m.filter(col("selected") === 1L).count()
      assert(nSel > 0 && nSel < nDocs) // the gates actually gate
    } finally m.unpersist()
  }

  test("contamination: planted passage overlap detected; self and unrelated excluded") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq(
      (1L, "prefix words come first here " + passage + " then suffix words trail"),
      (2L, "totally unrelated content about graph algorithms and catalyst plans"),
      (100L, passage)).toDF("doc_id", "text")
    val ev = Seq((100L, passage)).toDF("doc_id", "text")
    val got = TextOps.contaminationOf(corpus, ev, minShared = 1L).collect()
    // doc 1 embeds the whole eval passage -> must share fingerprints
    // (any shared run of >= w+n-1 tokens yields a shared fingerprint);
    // doc 2 shares nothing; doc 100 IS the eval doc (excluded as self)
    assert(got.map(_.getLong(0)).toSet === Set(1L))
    val r = got.head
    assert(r.getLong(1) === 100L)
    assert(r.getLong(2) >= 1L)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("pack_segments: segments tile every doc, packs fill to exactly the budget") {
    val budget = 50L
    val docs = TextOps.textStats(spark, Sf0001).select(col("doc_id"), col("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val segs = TextOps.packSegmentsOf(
      graft.io.Tables.documents(spark, Sf0001).select(col("doc_id"), col("text")),
      budget = budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every non-empty doc's segments tile [0, n_tokens-1] contiguously
    segs.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._3 === 0L, s"doc $id starts at ${sorted.head._3}")
      assert(sorted.last._4 === docs(id) - 1, s"doc $id ends early")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 === a._2 + 1 && b._3 === a._4 + 1, s"doc $id gap at pack ${b._2}")
        case _ =>
      }
    }
    assert(segs.map(_._1).toSet === docs.filter(_._2 > 0).keySet)
    // every pack except the last holds exactly `budget` tokens
    val perPack = segs.groupBy(_._2).view
      .mapValues(_.map(s => s._4 - s._3 + 1).sum).toMap
    val lastPack = perPack.keys.max
    perPack.foreach { case (p, tot) =>
      if (p != lastPack) assert(tot === budget, s"pack $p holds $tot")
      else assert(tot <= budget)
    }
    // the first segment's pack is pack_assign's whole-doc pack
    val assign = TextOps.packAssignOf(
      graft.io.Tables.documents(spark, Sf0001).select(col("doc_id"), col("text")),
      budget = budget).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    segs.groupBy(_._1).foreach { case (id, ss) =>
      assert(ss.minBy(_._2)._2 === assign(id), s"doc $id first segment pack")
    }
  }

  test("contamination_bloom ≡ contamination_external (no false negatives, FPs die in the join)") {
    val want = TextOps.contaminationExternal(spark, Sf0001).collect()
    val got = TextOps.contaminationBloom(spark, Sf0001).collect()
    assert(want.nonEmpty) // the head-truncated eval docs guarantee hits
    assert(got.toSeq === want.toSeq)
  }

  test("contamination_bloom: the prefilter actually prunes the train stream") {
    // a tiny bloom (256 bits) over ONE eval doc must reject most of a
    // 3-doc corpus's fingerprints yet still find the planted passage
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq(
      (1L, "prefix words come first here " + passage + " then suffix words trail"),
      (2L, "totally unrelated content about graph algorithms and catalyst plans"),
      (3L, "more filler text with nothing shared across any of the documents")
    ).toDF("doc_id", "text")
    val ev = Seq((100L, passage)).toDF("doc_id", "text")
    val got = TextOps.contaminationBloomOf(corpus, ev, minShared = 1L, mBits = 256)
      .collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))
    val want = TextOps.contaminationOf(corpus, ev, minShared = 1L).collect()
    assert(got.toSeq === want.toSeq)
  }

  test("dedup_decisions_pref: preferred source beats min doc_id inside a component") {
    val docs = Seq(
      (1L, "cc"), (2L, "wiki"), (3L, "cc"),   // one component {1,2,3}
      (7L, "cc"), (8L, "cc"),                 // one component {7,8}, no preferred member
      (9L, "wiki")                            // singleton
    ).toDF("doc_id", "source")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "component")
    val got = Dedup.dedupDecisionsPreferringOf(docs, comps, Seq("wiki")).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // wiki member 2 wins over min-id 1; {7,8} falls back to min doc_id;
    // the singleton keeps itself
    assert(got(1L) === (2L, 0L) && got(2L) === (2L, 1L) && got(3L) === (2L, 0L))
    assert(got(7L) === (7L, 1L) && got(8L) === (7L, 0L))
    assert(got(9L) === (9L, 1L))
  }

  test("dedup_decisions: one keeper per component, singletons keep themselves") {
    val d = Dedup.dedupDecisions(spark, Sf0001).cache()
    try {
      val nDocs = graft.io.Tables.documents(spark, Sf0001).count()
      assert(d.count() === nDocs) // every doc gets a decision
      // keep_id is the group representative: kept exactly once per distinct keep_id
      val keepers = d.filter(col("keep") === 1L)
      assert(keepers.count() === d.select("keep_id").distinct().count())
      // representatives are group minima
      assert(d.filter(col("keep_id") > col("doc_id")).count() === 0)
      // dropped docs are exactly the non-representative component members
      val comps = Dedup.lshComponents(spark, Sf0001)
      val dropped = comps.filter(col("doc_id") =!= col("component")).count()
      assert(d.filter(col("keep") === 0L).count() === dropped)
    } finally d.unpersist()
  }
}
