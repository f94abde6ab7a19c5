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
  }

  test("kmeans: empty corpus trains no centroids and assigns nothing") {
    val base = Similarity.baseOf(emptyVecs)
    assert(Similarity.kmeansCentroids(base, k = 4, rounds = 2).isEmpty)
    assert(Similarity.withCluster(base, Nil).count() === 0)
    // impossible threshold: the empty-result path through the pair pipeline
    assert(Similarity.cosineNearDup(spark, Sf0001, threshold = 2.0).count() === 0)
  }
}
