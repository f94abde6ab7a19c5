package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Similarity}

/** Structural invariants of the Z-order layout key and the embedding
  * outlier gate (values are oracle-gated via zorder_zonemap /
  * embedding_outliers). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder zonemap: every bucket is tight in BOTH dimensions and the buckets partition the corpus") {
    val zm = Layout.zorderZonemap(spark, Sf0001).cache()
    try {
      val rows = zm.collect()
      assert(rows.nonEmpty)
      // bucket = top 8 interleaved bits = top 4 bits of EACH dimension, so
      // within any bucket each normalized dimension spans < 2^12 of its
      // 2^16 global range — the two-dimensional pruning witness a
      // single-column sort cannot give (it pins one dimension, not both)
      rows.foreach { r =>
        val b = r.getAs[Long]("bucket")
        assert(r.getAs[Long]("max_uq") - r.getAs[Long]("min_uq") <= 4095L,
          s"bucket $b user-range exceeds the 4-bit cell")
        assert(r.getAs[Long]("max_hq") - r.getAs[Long]("min_hq") <= 4095L,
          s"bucket $b hour-range exceeds the 4-bit cell")
        assert(b >= 0L && b < 256L, s"bucket $b outside the 8-bit id space")
      }
      // the zonemap is a partition of the events table, not a sample
      val total = zm.agg(sum(col("n_rows"))).head().getLong(0)
      assert(total === graft.io.Tables.events(spark, Sf0001).count())
    } finally zm.unpersist()
  }

  test("embedding outliers: one row per vector, flag consistent, centroids attract their own label") {
    val out = Similarity.embeddingOutliers(spark, Sf0001).cache()
    try {
      val n = graft.io.Tables.embeddings(spark, Sf0001).count()
      assert(out.count() === n)
      // the flag is exactly the threshold predicate
      assert(out.filter((col("cos_c") < 0.0).cast("long") =!= col("is_outlier")).count() === 0L)
      // centroids mean-pool their own label, so the average own-centroid
      // cosine must be positive and outliers a strict minority — a corpus
      // where either fails has no usable label structure
      val frac = out.agg(avg(col("is_outlier"))).head().getDouble(0)
      val meanCos = out.agg(avg(col("cos_c"))).head().getDouble(0)
      assert(meanCos > 0.0)
      assert(frac > 0.0 && frac < 0.5, s"outlier fraction $frac")
    } finally out.unpersist()
  }
}
