package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Similarity}

class TextDedupSpec extends SparkSpec {

  import spark.implicits._

  test("dedup_incremental_snapshot: the second increment dedups against the first's STORED fingerprints") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-dedup-snap-spec-").toString
    try {
      // increment 0: "alpha" twice (intra-increment collapse keeps 10) + "beta"
      val inc0 = Seq((10L, "alpha"), (11L, "beta"), (12L, "alpha"))
        .toDF("doc_id", "text")
      Dedup.applyDedupIncrement(spark, out, inc0, 0L)
      // increment 1 offers "alpha" again with a SMALLER doc_id (1) plus a
      // genuinely new "gamma": the stored fingerprint must win — history
      // beats id order, the property global min-id dedup cannot have
      val inc1 = Seq((1L, "alpha"), (2L, "gamma")).toDF("doc_id", "text")
      Dedup.applyDedupIncrement(spark, out, inc1, 1L)
      def state(): Set[(Long, Long)] =
        Dedup.snapshotVersionsBefore(spark, out, Long.MaxValue).get
          .collect().map(r =>
            (r.getAs[Long]("keep_id"), r.getAs[Long]("increment"))).toSet
      assert(state() === Set((10L, 0L), (11L, 0L), (2L, 1L)))
      // the anti-join really dropped the re-offered fp: v=1 is gamma alone
      val v1 = spark.read.parquet(s"$out/v=1").collect()
      assert(v1.length === 1 && v1.head.getAs[Long]("keep_id") === 2L)
      // idempotence: replaying increment 1 (the foreachBatch retry case)
      // converges to the same store instead of double-appending
      Dedup.applyDedupIncrement(spark, out, inc1, 1L)
      assert(state() === Set((10L, 0L), (11L, 0L), (2L, 1L)))
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  test("journal compaction: one base dir, identical rows, increments keep dedup-ing") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-compact-spec-").toString
    try {
      Dedup.applyDedupIncrement(spark, out,
        Seq((10L, "alpha"), (11L, "beta")).toDF("doc_id", "text"), 0L)
      Dedup.applyDedupIncrement(spark, out,
        Seq((2L, "gamma")).toDF("doc_id", "text"), 1L)
      def rows(): Set[(String, Long, Long)] =
        Dedup.snapshotVersionsBefore(spark, out, Long.MaxValue).get
          .collect().map(r => (r.getAs[String]("fp_md5"),
            r.getAs[Long]("keep_id"), r.getAs[Long]("increment"))).toSet
      val pre = rows()
      Dedup.compactJournal(spark, out)
      val dirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
      // one base, under the HIGHEST prior id so future increments see it
      assert(dirs.map(_.getName).toSeq === Seq("v=1"), dirs.toSeq)
      assert(rows() === pre)
      // the compacted base still dedups: a re-offered fp is anti-joined
      // away, a new fp lands with the new increment id
      Dedup.applyDedupIncrement(spark, out,
        Seq((3L, "alpha"), (4L, "delta")).toDF("doc_id", "text"), 5L)
      val post = rows()
      assert(post.size === pre.size + 1)
      assert(post.exists { case (_, k, i) => k == 4L && i == 5L }, post)
      assert(!post.exists { case (_, k, _) => k == 3L }, post)
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  test("dedup_lsh_incremental: stored-index probe finds cross-batch pairs; full buckets FREEZE") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-lsh-inc-spec-idx-").toString
    val prs = java.nio.file.Files
      .createTempDirectory("graft-lsh-inc-spec-prs-").toString
    try {
      val T = "alpha beta gamma delta epsilon"
      val V = "omega psi chi phi upsilon"
      // batch 0: two copies of T (fills every T-bucket to cap=2) + one V
      Dedup.applyLshIncrement(spark, idx, prs,
        Seq((10L, T), (11L, T), (22L, V)).toDF("doc_id", "text"),
        0L, 3, 0.5, cap = 2)
      // batch 1: another T copy (must be FROZEN OUT — its buckets are
      // full), an unrelated U, and a V copy (bucket has room: 1 stored)
      Dedup.applyLshIncrement(spark, idx, prs,
        Seq((20L, T), (21L, "one two three four five"), (23L, V))
          .toDF("doc_id", "text"),
        1L, 3, 0.5, cap = 2)
      def pairs(): Set[(Long, Long)] =
        Dedup.snapshotVersionsBefore(spark, prs, Long.MaxValue).get
          .select("doc_a", "doc_b").distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      // within-batch pair from batch 0; CROSS-BATCH pair (22, 23) found by
      // probing the stored index; NO pair involving the frozen-out 20
      assert(pairs() === Set((10L, 11L), (22L, 23L)))
      val stored = Dedup.snapshotVersionsBefore(spark, idx, Long.MaxValue).get
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(!stored.contains(20L), stored) // frozen bucket admitted nothing
      assert(stored.contains(21L) && stored.contains(23L), stored)
      // idempotence: replaying batch 1 converges to the same journals
      Dedup.applyLshIncrement(spark, idx, prs,
        Seq((20L, T), (21L, "one two three four five"), (23L, V))
          .toDF("doc_id", "text"),
        1L, 3, 0.5, cap = 2)
      assert(pairs() === Set((10L, 11L), (22L, 23L)))
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(idx))
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(prs))
    }
  }

  test("charHash matches the cross-engine polynomial (abc -> 96354)") {
    // ((0*31+97)*31+98)*31+99 = 96354 — same value DuckDB's list_reduce yields
    val got = Seq("abc").toDF("s").select(charHash(col("s"))).head().getLong(0)
    assert(got === 96354L)
  }

  test("shingleHashes: n-2 word-3-grams, empty for short docs") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(size(shingleHashes(col("text"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 0))
  }

  test("minhash signature components are bounded and deterministic") {
    val sigs = Dedup.minhashSignatures(spark, Sf0001)
    val row = sigs.orderBy(col("doc_id")).head()
    (1 to 12).foreach { i =>
      val v = row.getLong(i)
      assert(v >= 0L && v <= HashMod)
    }
    val again = Dedup.minhashSignatures(spark, Sf0001).orderBy(col("doc_id")).head()
    assert(row === again)
  }

  test("source similarity: per-source sig is the min-reduce of per-doc sigs (union property)") {
    // MinHash's defining property: min over a union of shingle sets equals
    // the min of per-set minima — re-derive each source's 12 components in
    // plain Scala from the gated per-doc signature frame and the raw
    // (doc_id -> source) map, then check the pairwise report arithmetic
    val docSrc = graft.io.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = Dedup.minhashSignatures(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toVector)
    val expect = perDoc.groupBy { case (id, _) => docSrc(id) }.view
      .mapValues(rows => (0 until 12).map(j => rows.map(_._2(j)).min).toVector)
      .toMap
    val got = Dedup.sourceSimilarityMinhash(spark, Sf0001).collect()
    val s = expect.keys.toSeq.sorted
    assert(got.length === s.size * (s.size - 1) / 2) // every unordered pair
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val nEq = (0 until 12).count(j => expect(a)(j) == expect(b)(j)).toLong
      assert(r.getLong(2) === nEq, s"pair ($a,$b)")
      assert(r.getDouble(3) === nEq / 12.0)
    }
  }

  test("minhash LSH finds the planted near-duplicates that exact dedup misses") {
    val exactGroups = Dedup.exact(spark, Sf0001).filter(col("n_dups") > 1).count()
    val lshPairs = Dedup.minhashLsh(spark, Sf0001).count()
    assert(exactGroups === 0) // corpus has no byte-identical dups
    assert(lshPairs > 0)      // but it does have planted near-dups
  }

  test("ngram Jaccard agrees with LSH on the high-similarity pairs") {
    val jac = Dedup.ngramJaccard(spark, Sf0001, minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, Sf0001, minEstJaccard = 0.8)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty)
    // est_jaccard >= 0.8 implies high true similarity on this corpus
    assert(lsh.subsetOf(jac))
  }

  test("minhash LSH recall floor: banding catches the true jaccard >= 0.8 pairs") {
    // the reverse gate of the precision test above: with 4 bands x 3 rows,
    // P(candidate | s = 0.8) = 1 - (1 - 0.8^3)^4 ~ 0.94 in expectation —
    // a regression in the banding (wrong band boundaries, an over-eager
    // cap, a signature bug) shows up as recall collapse long before the
    // oracle's reproducibility hash would notice. Gate, not report: the
    // ann_recall-floor discipline applied to the dedup family.
    val truth = Dedup.ngramJaccard(spark, Sf0001, minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    // minEstJaccard = 0 surfaces every banded CANDIDATE pair
    val candidates = Dedup.minhashLsh(spark, Sf0001, minEstJaccard = 0.0)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(candidates.contains).toDouble / truth.size
    assert(recall >= 0.8, s"minhash banding recall $recall over ${truth.size} true pairs")
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val sims = Dedup.simhash(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.ngramJaccard(spark, Sf0001, minJaccard = 0.8)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dups = pairs.map { case (a, b) => hamming(sims(a), sims(b)) }
    val all = sims.values.toSeq
    val randomPairs = all.take(50).zip(all.takeRight(50)).map { case (a, b) => hamming(a, b) }
    assert(dups.sum.toDouble / dups.length < randomPairs.sum.toDouble / randomPairs.length)
  }

  test("cosine is exact on constructed vectors; top-k is complete") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 2.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(cs(0) === 0.0)
    assert(math.abs(cs(1) - 1.0) < 1e-12)
    val topk = Similarity.bruteForceTopK(spark, Sf0001, k = 5, queryMod = 100)
    val perQuery = topk.groupBy(col("q_id")).count().collect().map(_.getLong(1))
    assert(perQuery.nonEmpty && perQuery.forall(_ === 5L))
  }

  test("LSH components: every matched pair shares a component, labeled by its minimum") {
    val pairs = Dedup.minhashLsh(spark, Sf0001)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = Dedup.lshComponents(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(comp(a) === comp(b), s"pair ($a,$b)") }
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(label === members.keys.min)
    }
  }

  test("star-contraction components match min-label propagation exactly") {
    val star = Dedup.lshComponentsStar(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prop = Dedup.lshComponents(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star.nonEmpty)
    assert(star === prop)
  }

  test("star contraction handles chain, clique, and giant-star graphs") {
    // a 400-node path (diameter 399), a 30-clique, and a 500-leaf star —
    // the giant-component shapes the contraction variant exists for
    val chain  = (0L until 399L).map(i => (i, i + 1))
    val clique = for (a <- 1000L until 1030L; b <- (a + 1) until 1030L) yield (a, b)
    val bigStar = (2001L to 2500L).map(i => (2000L, i))
    val pairs = (chain ++ clique ++ bigStar).toSeq.toDF("doc_a", "doc_b")
    val got = Dedup.lshComponentsStarOf(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want =
      (0L to 399L).map(i => (i, 0L)) ++
      (1000L until 1030L).map(i => (i, 1000L)) ++
      (2000L to 2500L).map(i => (i, 2000L))
    assert(got === want.toSet)
    // and the propagation twin agrees
    val prop = Dedup.lshComponentsOf(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prop === got)
  }

  test("star contraction raises at the iteration cap instead of returning partial labels") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException] {
      Dedup.lshComponentsStarOf(pairs, maxIterations = 0)
    }
  }

  test("star contraction on an empty edge list yields no components") {
    assert(Dedup.lshComponentsStarOf(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).isEmpty)
  }

  test("LSH bucket cap drops degenerate buckets without building giant rows") {
    // 300 near-identical docs (a boilerplate cluster: every band bucket has
    // all 300 members) + 2 genuine near-dups that stay under any sane cap
    val boiler = (0L until 300L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again and again"))
    val near = Seq(
      (1000L, "completely different text about distributed query engines running analytic workloads on very large clusters of machines"),
      (1001L, "completely different text about distributed query engines running analytic workloads on very large clusters of nodes"))
    val docs = (boiler ++ near).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesOf(docs)
    val pairs = Dedup.minhashLshOf(sigs, maxBucketSize = 50)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // the boilerplate cluster's buckets are over the cap → all dropped;
    // the small pair's buckets survive
    assert(pairs.toSet === Set((1000L, 1001L)))
    // with the cap above the cluster size, its pairs reappear: the cap is
    // the ONLY thing that was excluding them
    val uncapped = Dedup.minhashLshOf(sigs, maxBucketSize = 1000).count()
    assert(uncapped === 300L * 299L / 2L + 1L)
  }

  test("simhash pairs: 4-band bucketing finds every pair within hamming <= 3 (pigeonhole)") {
    // plant signatures directly: same text => same simhash; variants flip
    // whole tokens which perturbs few bits on short docs. Verify against a
    // brute-force hamming scan of the real signatures.
    val sigs = Dedup.simhash(spark, Sf0001).collect().map(r => r.getLong(0) -> r.getLong(1))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      if ida < idb && hamming(sa, sb) <= 3
    } yield (ida, idb)).toSet
    val got = Dedup.simhashPairs(spark, Sf0001, maxHamming = 3, maxBucketSize = 1000000)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("cosineNearDup banding is a subset of the exact per-label scan with high recall") {
    val exact = Similarity.cosineNearDup(spark, Sf0001, threshold = 0.4, planesPerBand = 0)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.cosineNearDup(spark, Sf0001, threshold = 0.4)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(exact))
    assert(exact.nonEmpty)
    // 4 bands x 2 planes keeps ~87% of cos>=0.4 pairs in expectation
    assert(banded.size.toDouble >= 0.5 * exact.size)
  }

  test("text_stats quality score stays in [0,1]") {
    val st = graft.operators.TextOps.textStats(spark, Sf0001)
      .agg(min(col("quality_score")), max(col("quality_score"))).head()
    assert(st.getDouble(0) >= 0.0 && st.getDouble(1) <= 1.0)
  }

  test("lsh bucket stats: an over-cap cluster is visible as dropped, per band") {
    import graft.operators.Dedup
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val docs = ((1 to 250).map(i => (i.toLong, boiler)) :+
      ((999L, "another unique and entirely different document body here")))
      .toDF("doc_id", "text")
    val stats = Dedup.lshBucketStatsOf(Dedup.minhashSignaturesOf(docs)).collect()
    // the 250-copy cluster is one over-cap bucket in EVERY band; the unique
    // doc collides with nothing, so it's also the only 2+-member bucket
    assert(stats.length === 4)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_buckets") === 1L)
      assert(r.getAs[Long]("n_dropped_buckets") === 1L)
      assert(r.getAs[Long]("n_dropped_docs") === 250L)
      assert(r.getAs[Long]("max_bucket") === 250L)
    }
  }

  test("paragraph dedup: shared aligned chunks counted, unique docs at zero") {
    import graft.operators.Dedup
    // chunk size 3: doc 1 = [abc][def], doc 2 = [abc][xyq], doc 3 unique,
    // doc 4 = 4 tokens -> [abc][trailing single token, shared with doc 5]
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y q"),
      (3L, "totally different words here now"),
      (4L, "a b c t"),
      (5L, "u v w t")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedupOf(docs, chunkTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))       // [abc] shared with docs 2 and 4
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((2L, 0L, 0.0)))
    assert(got(4L) === ((2L, 2L, 1.0)))       // [abc] + trailing [t] (shared with 5)
    assert(got(5L) === ((2L, 1L, 0.5)))       // trailing [t] only
  }

  test("containment: a doc stitched from earlier docs is dropped; originals kept") {
    import graft.operators.Dedup
    // doc 10 is assembled from doc 1's and doc 2's chunks (chunk size 3);
    // docs 1 and 2 are the first owners, so they keep
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "p q r s t u"),
      (3L, "fully original content lives in here"),
      (10L, "a b c p q r d e f")).toDF("doc_id", "text")
    val got = Dedup.containmentOf(docs, chunkTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got(1L) === ((2L, 0L, 1L)))
    assert(got(2L) === ((2L, 0L, 1L)))
    assert(got(3L) === ((2L, 0L, 1L)))
    assert(got(10L) === ((3L, 3L, 0L))) // all 3 chunks first-owned earlier -> dropped
  }

  test("winnow containment catches a 1-token-shifted copy the chunk anchor provably misses") {
    import graft.operators.Dedup
    // doc 20 is doc 1 shifted by ONE prepended token: every fixed-offset
    // chunk boundary moves, so chunk containment sees nothing shared —
    // while the 30-token shared run (>= w+n-1 = 6) must yield shared
    // winnowing fingerprints
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (5L, "fully original content lives in here today"),
      (20L, "shift " + base)).toDF("doc_id", "text")
    val chunk = Dedup.containmentOf(docs, chunkTokens = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val winnow = Dedup.containmentWinnowOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3), r.getLong(4)))).toMap
    // the blind spot, pinned: the chunk form KEEPS the shifted copy
    assert(chunk(20L) === 1L)
    // the winnow form drops it — most of its fingerprints are first-owned
    // by doc 1 — and keeps the originals
    assert(winnow(20L)._1 > 0L && winnow(20L)._2 >= 0.5 && winnow(20L)._3 === 0L)
    assert(winnow(1L)._3 === 1L)
    assert(winnow(5L)._3 === 1L)
  }

  test("winnow containment guarantee boundary: >= w+n-1 shared tokens always detected, w+n-2 may escape") {
    import graft.operators.Dedup
    // The detection CONTRACT of containmentWinnowOf's defaults (n=3, w=4):
    // a shared token run of length L yields L-n+1 identical consecutive
    // shingles, and winnowing selects the min of every w-shingle window —
    // so only L >= w+n-1 = 6 guarantees a window that lies FULLY inside
    // the run in BOTH docs (same w hashes, same min, shared fingerprint).
    // At L = 5 the run spans only 3 shared shingles — no full window — and
    // whether any of them is selected depends on the neighboring context
    // hashes. A tuner shortening w or n moves this bound; a 5-token shared
    // run legitimately escaping is NOT a bug.
    def detected(runLen: Int, seed: Int): Boolean = {
      // the run namespace varies with the seed too: detection below the
      // bound hinges on the run shingles' own hash values, so a fixed run
      // would make all seeds stand or fall together
      val run = (0 until runLen).map(i => s"run${seed}v$i").mkString(" ")
      // disjoint context namespaces: the only shareable shingles are the
      // run's own
      val ctxA = (0 until 8).map(i => s"a${seed}x$i").mkString(" ")
      val ctxB = (0 until 8).map(i => s"b${seed}x$i").mkString(" ")
      val docs = Seq((1L, s"$ctxA $run"), (2L, s"$ctxB $run")).toDF("doc_id", "text")
      Dedup.containmentWinnowOf(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap.apply(2L) > 0L
    }
    // the guarantee side: every context at the bound detects
    (0 until 16).foreach(s => assert(detected(6, s), s"6-token run escaped at seed $s"))
    // the non-guarantee side: some context below the bound escapes
    assert((0 until 16).exists(s => !detected(5, s)),
      "every 5-token run was detected — the w+n-1 bound would be slack, not a contract")
  }

  test("winnow containment reports short (unfingerprintable) docs with zeros, kept") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, (0 until 30).map(i => s"tok$i").mkString(" ")),
      (2L, "tiny doc")).toDF("doc_id", "text")
    val got = Dedup.containmentWinnowOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got(2L) === ((0L, 0L, 0.0, 1L)))
    assert(got.size === 2)
  }

  test("boilerplate strip: repeated chunks dropped, kept fold matches the hand fold") {
    import graft.operators.Dedup
    // chunk size 3: the [a b c] chunk repeats across docs 1 and 2 (freq 2 >
    // maxFreq 1) so it is stripped from both; each doc keeps its unique tail
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y q"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val got = Dedup.boilerplateStripOf(docs, chunkTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val P = graft.functions.TextFunctions.HashMod
    def tokHash(t: String): Long = t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
    def chunkHash(ts: Seq[String]): Long =
      ts.foldLeft(0L)((a, t) => (a * 31 + tokHash(t)) % P)
    def fold(chunks: Seq[Long]): Long = chunks.foldLeft(0L)((a, x) => (a * 31 + x) % P)
    // docs 1/2 keep only their second chunk; doc 3 keeps both of its chunks
    assert(got(1L) === ((2L, 1L, fold(Seq(chunkHash(Seq("d", "e", "f")))))))
    assert(got(2L) === ((2L, 1L, fold(Seq(chunkHash(Seq("x", "y", "q")))))))
    assert(got(3L) === ((2L, 2L, fold(Seq(
      chunkHash(Seq("totally", "different", "words")),
      chunkHash(Seq("here", "now")))))))
  }

  test("cluster sizes: distribution is consistent with the component table") {
    import graft.operators.Dedup
    val sizes = Dedup.clusterSizes(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.nonEmpty)
    assert(sizes.forall(_._1 >= 2)) // a matched component has >= 2 members
    val docsInClusters = sizes.map { case (sz, n) => sz * n }.sum
    assert(docsInClusters === Dedup.lshComponents(spark, Sf0001).count())
  }

  // --- compaction crash-safety: kill the protocol between every pair of
  // steps and prove a re-run restores the store (the r18 hole) ---

  private def freshJournal(): (String, Set[(String, Long, Long)]) = {
    val out = java.nio.file.Files
      .createTempDirectory("graft-crash-spec-").toString
    Dedup.applyDedupIncrement(spark, out,
      Seq((10L, "alpha"), (11L, "beta")).toDF("doc_id", "text"), 0L)
    Dedup.applyDedupIncrement(spark, out,
      Seq((2L, "gamma")).toDF("doc_id", "text"), 1L)
    (out, journalRows(out))
  }

  private def journalRows(out: String): Set[(String, Long, Long)] =
    Dedup.snapshotVersionsBefore(spark, out, Long.MaxValue).get
      .collect().map(r => (r.getAs[String]("fp_md5"),
        r.getAs[Long]("keep_id"), r.getAs[Long]("increment"))).toSet

  private def versionNames(out: String): Seq[String] =
    Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName).sorted

  /** Replicate compactJournal's stage step (fold write + marker) WITHOUT
    * the swap — the state a crash right after the commit point leaves. */
  private def stageFold(out: String): java.nio.file.Path = {
    val staged = java.nio.file.Paths.get(out, s"${Dedup.StagedCompactPrefix}1")
    spark.read.parquet(s"$out/v=0", s"$out/v=1")
      .write.mode("overwrite").parquet(staged.toString)
    java.nio.file.Files.createFile(staged.resolve(Dedup.CompactCompleteMarker))
    staged
  }

  test("compaction crash after commit point, before any delete: re-run recovers") {
    val (out, pre) = freshJournal()
    try {
      stageFold(out)
      Dedup.compactJournal(spark, out)
      assert(versionNames(out) === Seq("v=1"))
      assert(journalRows(out) === pre)
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  test("compaction crash after ALL deletes (zero v= dirs — the r18-fatal window): re-run recovers") {
    val (out, pre) = freshJournal()
    try {
      stageFold(out)
      versionNames(out).foreach(v => graft.operators.StatefulQueries
        .deleteRecursively(java.nio.file.Paths.get(out, v)))
      assert(versionNames(out).isEmpty) // the window the r18 code could not leave
      Dedup.compactJournal(spark, out)
      assert(versionNames(out) === Seq("v=1"))
      assert(journalRows(out) === pre)
      // the recovered base still dedups: re-offered fp anti-joined away
      Dedup.applyDedupIncrement(spark, out,
        Seq((3L, "alpha"), (4L, "delta")).toDF("doc_id", "text"), 5L)
      val post = journalRows(out)
      assert(post.size === pre.size + 1)
      assert(!post.exists { case (_, k, _) => k == 3L }, post)
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  test("compaction crash after a PARTIAL delete: re-run recovers without duplicating rows") {
    val (out, pre) = freshJournal()
    try {
      stageFold(out)
      graft.operators.StatefulQueries
        .deleteRecursively(java.nio.file.Paths.get(out, "v=0"))
      Dedup.compactJournal(spark, out)
      assert(versionNames(out) === Seq("v=1"))
      assert(journalRows(out) === pre) // v=1 (subsumed) was dropped, not unioned twice
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  test("compaction crash BEFORE the commit point (no marker): partial fold discarded, old versions intact") {
    val (out, pre) = freshJournal()
    try {
      val staged = java.nio.file.Paths.get(out, s"${Dedup.StagedCompactPrefix}1")
      // a torn fold: only one version's rows made it, and no marker
      spark.read.parquet(s"$out/v=0").write.mode("overwrite").parquet(staged.toString)
      Dedup.compactJournal(spark, out) // discards the orphan, compacts normally
      assert(versionNames(out) === Seq("v=1"))
      assert(journalRows(out) === pre)
      val leftover = Option(new java.io.File(out).listFiles()).toSeq.flatten
        .filter(_.getName.startsWith(Dedup.StagedCompactPrefix))
      assert(leftover.isEmpty, leftover)
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  test("compaction recovery keeps increments LATER than the staged fold") {
    val (out, pre) = freshJournal()
    try {
      stageFold(out) // fold of v=0..1 staged, marker down
      // an increment with a HIGHER id lands before recovery runs
      Dedup.applyDedupIncrement(spark, out,
        Seq((4L, "delta")).toDF("doc_id", "text"), 5L)
      Dedup.compactJournal(spark, out) // entry recovery, then folds 1 and 5
      assert(versionNames(out) === Seq("v=5"))
      val post = journalRows(out)
      assert(post.size === pre.size + 1, post)
      assert(post.exists { case (_, k, i) => k == 4L && i == 5L }, post)
    } finally {
      graft.operators.StatefulQueries.deleteRecursively(java.nio.file.Paths.get(out))
    }
  }

  // --- ngram shingle stats: independent plain-Scala re-derivation over the
  // engine's own distinct (doc, shingle) sets ---

  test("ngram_shingle_stats: counts and pair bounds re-derive from the shingle sets") {
    import graft.functions.TextFunctions.shingleHashes
    val docs = Seq(
      (1L, "a b c d e"),          // shares shingle(a b c) with 2 and 3
      (2L, "a b c x y"),
      (3L, "a b c p q"),
      (4L, "unrelated words entirely here"),
      (5L, "a b c d e")           // exact dup of 1: same shingles
    ).toDF("doc_id", "text")
    val cap = 3
    val got = Dedup.ngramShingleStatsOf(docs, 3, cap).collect().head
    // independent derivation: collect each doc's DISTINCT shingle set and
    // fold the stats in plain Scala
    val sets = docs.select(col("doc_id"), shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getSeq[Long](1).distinct).toSeq
    val freq = sets.flatten.groupBy(identity).map { case (_, v) => v.size.toLong }
    def pairs(p: Long => Boolean): Long =
      freq.filter(p).map(f => f * (f - 1) / 2).sum
    assert(got.getAs[Long]("n_shingles") === freq.size.toLong)
    assert(got.getAs[Long]("max_freq") === freq.max)
    assert(got.getAs[Long]("n_shingles_freq1") === freq.count(_ == 1L).toLong)
    assert(got.getAs[Long]("n_shingles_indexed")
      === freq.count(f => f >= 2 && f <= cap).toLong)
    assert(got.getAs[Long]("n_dropped_shingles") === freq.count(_ > cap).toLong)
    assert(got.getAs[Long]("candidate_pairs") === pairs(f => f >= 2 && f <= cap))
    assert(got.getAs[Long]("dropped_pairs") === pairs(_ > cap))
    // the cap really bites on this fixture: "a b c" is shared by 4 docs > cap
    assert(got.getAs[Long]("n_dropped_shingles") >= 1L)
    // candidate_pairs IS the pair-generator's pre-groupBy row count: every
    // kept shingle of freq f yields exactly C(f,2) ordered pairs
    val ds = docs.select(col("doc_id"),
      explode(array_distinct(shingleHashes(col("text"), 3))).as("sh"))
    val genRows = ds.groupBy(col("sh")).count()
      .filter(col("count").between(2, cap))
      .select((col("count") * (col("count") - 1) / 2).cast("long").as("p"))
      .agg(coalesce(sum(col("p")), lit(0L))).collect().head.getLong(0)
    assert(got.getAs[Long]("candidate_pairs") === genRows)
  }

  test("ngram_shingle_stats: empty corpus yields the all-zero row") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Dedup.ngramShingleStatsOf(empty).collect()
    assert(got.length === 1)
    assert((0 until 7).map(got.head.getLong) === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  // --- compacted LSH band index: future increments admit IDENTICALLY ---

  test("lsh index compaction preserves freeze-at-cap admissions for the next increment") {
    val T = "alpha beta gamma delta epsilon"
    val V = "omega psi chi phi upsilon"
    def build(): (String, String) = {
      val idx = java.nio.file.Files
        .createTempDirectory("graft-lsh-compact-idx-").toString
      val prs = java.nio.file.Files
        .createTempDirectory("graft-lsh-compact-prs-").toString
      Dedup.applyLshIncrement(spark, idx, prs,
        Seq((10L, T), (11L, T), (22L, V)).toDF("doc_id", "text"),
        0L, 3, 0.5, cap = 2)
      Dedup.applyLshIncrement(spark, idx, prs,
        Seq((21L, "one two three four five")).toDF("doc_id", "text"),
        1L, 3, 0.5, cap = 2)
      (idx, prs)
    }
    val (idxA, prsA) = build() // stays uncompacted
    val (idxB, prsB) = build()
    try {
      Dedup.compactJournal(spark, idxB)
      assert(versionNames(idxB) === Seq("v=1"))
      def idxRows(d: String): Set[(Long, Long, Long)] =
        Dedup.snapshotVersionsBefore(spark, d, Long.MaxValue).get
          .select(col("band_idx").cast("long"), col("band_hash"), col("doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(idxRows(idxB) === idxRows(idxA)) // membership preserved exactly
      // the decisive increment: a T copy must freeze out of the full
      // buckets, a V copy must land — on BOTH indexes identically
      val inc = Seq((30L, T), (31L, V)).toDF("doc_id", "text")
      Dedup.applyLshIncrement(spark, idxA, prsA, inc, 7L, 3, 0.5, cap = 2)
      Dedup.applyLshIncrement(spark, idxB, prsB, inc, 7L, 3, 0.5, cap = 2)
      assert(idxRows(idxA) === idxRows(idxB))
      def pairRows(d: String): Set[(Long, Long)] =
        Dedup.snapshotVersionsBefore(spark, d, Long.MaxValue).get
          .select("doc_a", "doc_b").distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairRows(prsA) === pairRows(prsB))
      assert(pairRows(prsA).contains((22L, 31L))) // the stored-probe pair
      assert(!pairRows(prsA).exists(p => p._1 == 30L || p._2 == 30L)) // frozen
    } finally {
      Seq(idxA, prsA, idxB, prsB).foreach(d => graft.operators.StatefulQueries
        .deleteRecursively(java.nio.file.Paths.get(d)))
    }
  }
}
