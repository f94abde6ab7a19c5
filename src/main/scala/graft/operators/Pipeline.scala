package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** The end-to-end corpus-curation pipeline as ONE declarative plan.
  *
  * A training-data pipeline's final artifact is a manifest: one row per
  * document recording every gate's verdict and the resulting selection.
  * [[curationManifest]] composes the engine's own operators —
  * near-duplicate keep/drop ([[Dedup.dedupDecisionsOf]] semantics over the
  * LSH component table), the language/quality gate
  * ([[TextOps.qualityScoredOf]]), and the stratified split assignment
  * ([[TextOps.splitAssignOf]]) — into a single Catalyst plan, joined on
  * doc_id. `selected` marks the rows a training run would actually read:
  * dedup keeper AND quality pass AND train split.
  *
  * Composition stays efficient because every ingredient is its UNSORTED
  * core: presentation sorts belong to the leaves of the API, not to frames
  * about to be joined (the joins would destroy the order after a wasted
  * range exchange). The corpus is scanned by three column-pruned branches
  * (dedup needs text-derived signatures, quality needs text, split needs
  * (lang, source)) — at 100 TB each branch reads only its columns and the
  * three doc_id-keyed joins shuffle manifest-width rows, not text.
  */
object Pipeline {

  def curationManifest(spark: SparkSession, sfDir: String,
                       minQuality: Double = 0.5, lang: String = "en",
                       trainPer10: Int = 8, valPer10: Int = 1): DataFrame = {
    val narrow = Tables.documentsNarrow(spark, sfDir)
    val keep = narrow.select(col("doc_id"))
      .join(Dedup.componentsFor(spark, sfDir), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("doc_id") === coalesce(col("component"), col("doc_id")))
          .cast("long").as("keep"))
    val quality = TextOps.qualityScoredOf(narrow)
      .select(col("doc_id"), col("quality_score"), col("lang_guess"))
    val split = TextOps.splitAssignOf(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"), col("source")),
        trainPer10, valPer10)
      .select(col("doc_id"), col("split"))
    keep.join(quality, "doc_id").join(split, "doc_id")
      .withColumn("selected",
        (col("keep") === 1L && col("lang_guess") === lang &&
         col("quality_score") >= minQuality && col("split") === "train")
          .cast("long"))
      .select(col("doc_id"), col("keep"), col("quality_score"),
              col("lang_guess"), col("split"), col("selected"))
      .orderBy(col("doc_id"))
  }
}
