package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** Empty-corpus hardening: every frame-in/frame-out operator must return an
  * empty frame (never throw) when its input has zero rows — partitions of a
  * 100 TB input routinely contain no rows after a selective filter. */
class EmptyInputSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyVecs =
    Seq.empty[(Long, Long, Array[Float])].toDF("vec_id", "label", "embedding")

  test("text operators: empty in, empty out") {
    assert(TextOps.textStatsOf(emptyDocs).count() === 0)
    assert(TextOps.langIdOf(emptyDocs).count() === 0)
    assert(TextOps.fingerprintsOf(emptyDocs).count() === 0)
    assert(TextOps.qualityFilterOf(emptyDocs).count() === 0)
    assert(TextOps.winnowFingerprintsOf(emptyDocs).count() === 0)
    assert(TextOps.tfidfTopTermsOf(emptyDocs).count() === 0)
    assert(TextOps.contaminationOf(emptyDocs, emptyDocs).count() === 0)
    assert(TextOps.stratifiedSplitOf(
      Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "source")).count() === 0)
    // empty eval set against a real corpus: no hits, no crash
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    assert(TextOps.contaminationOf(docs, emptyDocs).count() === 0)
  }


  test("doc_sim_df_stats: empty corpus yields the all-zero report row") {
    // the observable is an aggregate: empty in means ONE row of zeros (the
    // dashboard reads "nothing indexed"), never a crash or a NULL max
    val r = TextOps.docSimDfStatsOf(emptyDocs).collect()
    assert(r.length === 1)
    val row = r.head
    for (c <- Seq("n_terms", "max_df", "n_terms_df1", "n_terms_indexed",
                  "n_dropped_terms", "candidate_pairs", "dropped_pairs"))
      assert(row.getAs[Long](c) === 0L, c)
  }

  test("fuzzy join: empty in, empty out; null names never crash the banding") {
    import graft.operators.Analytics
    val emptyNames = Seq.empty[(Long, String)].toDF("s_suppkey", "s_name")
    assert(Analytics.fuzzyJoinEditDist1Of(emptyNames).count() === 0)
    // a null name produces no signatures (explode of null array) and so
    // no candidate pairs — reported absent, never a crash
    val nulls = Seq((1L, null: String), (2L, "abc"), (3L, "abd")).toDF("s_suppkey", "s_name")
    val pairs = Analytics.fuzzyJoinEditDist1Of(nulls)
      .select(col("a_key"), col("b_key")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((2L, 3L)))
  }

  test("round-15 operators: empty in, empty out; null text drops from postings") {
    assert(TextOps.invertedIndexPostingsOf(emptyDocs).count() === 0)
    assert(Similarity.sq8StatsOf(emptyVecs).count() === 0)
    // null text tokenizes to nothing: no postings, no crash
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(TextOps.invertedIndexPostingsOf(nulls).count() === 0)
  }

  test("round-8 operators: empty in, empty out") {
    assert(Dedup.containmentWinnowOf(emptyDocs).count() === 0)
    // a null-text doc cannot be fingerprinted: reported with zeros, kept
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = Dedup.containmentWinnowOf(nulls).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(4))).toSeq === Seq((1L, 0L, 1L)))
  }

  test("round-7 operators: empty in, empty out") {
    assert(Dedup.paragraphDedupOf(emptyDocs).count() === 0)
    assert(Dedup.containmentOf(emptyDocs).count() === 0)
    assert(TextOps.mixRatesOf(
      Seq.empty[(String, String)].toDF("source", "text"),
      Map("a" -> 2.0), defaultWeight = 1.0).count() === 0)
    // bloom decontamination: an empty EVAL set folds to an all-zero bloom
    // that rejects every train fingerprint — no hits, no crash
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    assert(TextOps.contaminationBloomOf(docs, emptyDocs).count() === 0)
    assert(TextOps.contaminationBloomOf(emptyDocs, emptyDocs).count() === 0)
    // PQ on an empty corpus: empty codebooks, null-code projection, no search
    val base = Similarity.baseOf(emptyVecs)
    val books = Similarity.pqCodebooks(base)
    assert(books.forall(_.isEmpty))
    assert(Similarity.pqCodesOf(base, books).count() === 0)
    // packing and stripping over zero rows
    assert(TextOps.packAssignOf(emptyDocs).count() === 0)
    assert(TextOps.packSegmentsOf(emptyDocs).count() === 0)
    assert(Dedup.boilerplateStripOf(emptyDocs).count() === 0)
    // null text: zero tokens -> no pack span; the strip keeps the doc row
    // with zero chunks (transforms must not drop documents silently)
    val nulls = Seq((1L, "alpha beta gamma"), (2L, null)).toDF("doc_id", "text")
    assert(TextOps.packSegmentsOf(nulls).select("doc_id").distinct().count() === 1)
    val strip = Dedup.boilerplateStripOf(nulls).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(strip(2L) === ((0L, 0L, 0L)))
  }

  test("dedup operators: empty in, empty out (including the component loop)") {
    assert(Dedup.exactOf(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccardOf(emptyDocs).count() === 0)
    val sigs = Dedup.minhashSignaturesOf(emptyDocs)
    assert(sigs.count() === 0)
    assert(Dedup.minhashLshOf(sigs).count() === 0)
    assert(Dedup.simhashOf(emptyDocs).count() === 0)
    assert(Dedup.simhashPairsOf(
      Seq.empty[(Long, Long)].toDF("doc_id", "simhash")).count() === 0)
    assert(Dedup.lshComponentsOf(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() === 0)
    assert(Dedup.dedupDecisionsOf(
      emptyDocs.select(col("doc_id")),
      Seq.empty[(Long, Long)].toDF("doc_id", "component")).count() === 0)
    assert(Dedup.lshBucketStatsOf(Dedup.minhashSignaturesOf(emptyDocs)).count() === 0)
    assert(Dedup.componentsOf(emptyDocs).count() === 0)
  }

  test("curation manifest: empty corpus yields an empty manifest, not a crash") {
    // exercises the full composed plan — exact-fp window, LSH components
    // (empty candidate graph), quality gate, split — over zero rows
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.operators.Pipeline.curationManifestOf(empty).count() === 0)
  }

  test("null text rows flow through text/dedup operators without crashing") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    // projections propagate null (never throw); generators drop null arrays
    assert(TextOps.textStatsOf(docs).count() === 3)
    assert(TextOps.fingerprintsOf(docs).filter(col("doc_id") === 2L)
      .head().isNullAt(1))
    assert(TextOps.winnowFingerprintsOf(docs).select("doc_id")
      .distinct().as[Long].collect().toSet === Set(1L))
    // 8 tokens from doc 1 + the empty-token hash (0) from doc 3; null contributes nothing
    assert(TextOps.vocabTopKOf(docs).count() === 9)
    assert(Dedup.simhashOf(docs).count() === 3)
    assert(Dedup.ngramJaccardOf(docs).count() === 0) // nothing shared; no crash
  }

  test("round-12 operators: empty in, empty out") {
    // the CM fold over zero pairs yields the zero sketch (one aggregate
    // row), and the scoring pass then has nothing to score
    assert(TextOps.lmBigramScoreSketchOf(emptyDocs).count() === 0)
    assert(Similarity.embeddingOutliersOf(Similarity.baseOf(emptyVecs), 0.0).count() === 0)
    // a single-token doc has no bigrams: dropped, not crashed
    val oneTok = Seq((1L, "alpha")).toDF("doc_id", "text")
    assert(TextOps.lmBigramScoreSketchOf(oneTok).count() === 0)
  }

  test("kmeans: empty corpus trains no centroids and assigns nothing") {
    val base = Similarity.baseOf(emptyVecs)
    assert(Similarity.kmeansCentroids(base, k = 4, rounds = 2).isEmpty)
    assert(Similarity.withCluster(base, Nil).count() === 0)
    // impossible threshold: the empty-result path through the pair pipeline
    assert(Similarity.cosineNearDup(spark, Sf0001, threshold = 2.0).count() === 0)
  }
}
