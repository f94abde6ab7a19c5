package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the r19 OPTIMIZATION round: doc_sim_sparse_topk's tf
  * table (shingle explode + (doc, th) groupBy) feeds the df table, both
  * self-join sides, and the norms — does materializing it once (eager
  * localCheckpoint) beat re-evaluation under AQE stage reuse? Times both
  * variants INTERLEAVED in one JVM so host drift hits both equally.
  * Usage: Test/runMain graft.operators.ProbeDocSim [sfDir] [reps] */
object ProbeDocSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.io.Tables.documentsNarrow(spark, sfDir)
    d.count() // warm

    def pipeline(tf: DataFrame, k: Int = 20): DataFrame = {
      val docs = d.select(col("doc_id"), col("text"))
      val dfreq = tf.groupBy(col("th")).agg(count(lit(1)).cast("long").as("df"))
        .filter(col("df") >= 2 && col("df") <= 100L)
      val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
      val tfw = tf.join(dfreq, "th").crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("th"),
          (col("tf") * expr("(n_docs * 1000L) div df")).as("w"))
      def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      val norms = tfw
        .select(col("doc_id"), (d19(col("w")) * d19(col("w"))).as("w2"))
        .groupBy(col("doc_id")).agg(sum(col("w2")).as("n2"))
        .select(col("doc_id"), sqrt(col("n2").cast("double")).as("norm"))
      val dots = tfw.as("a").join(tfw.as("b"),
          col("a.th") === col("b.th") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (d19(col("a.w")) * d19(col("b.w"))).as("p"))
        .groupBy(col("doc_a"), col("doc_b")).agg(sum(col("p")).as("dotx"))
        .select(col("doc_a"), col("doc_b"), col("dotx").cast("double").as("dot"))
      dots
        .join(norms.select(col("doc_id").as("doc_a"), col("norm").as("norm_a")), "doc_a")
        .join(norms.select(col("doc_id").as("doc_b"), col("norm").as("norm_b")), "doc_b")
        .withColumn("cosine", col("dot") / (col("norm_a") * col("norm_b")))
        .select(col("doc_a"), col("doc_b"), col("dot"), col("cosine"))
        .orderBy(col("cosine").desc, col("doc_a"), col("doc_b")).limit(k)
    }
    def tfOf: DataFrame = TextOps.docTermTf(d)
    def lazyVariant(): Unit =
      pipeline(tfOf).write.format("noop").mode("overwrite").save()
    def ckptVariant(): Unit = {
      val tf = tfOf.localCheckpoint(true)
      try pipeline(tf).write.format("noop").mode("overwrite").save()
      finally org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(tf)
        .foreach(_.unpersist(blocking = false))
    }
    val lz = scala.collection.mutable.ListBuffer.empty[Double]
    val ck = scala.collection.mutable.ListBuffer.empty[Double]
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime(); lazyVariant(); lz += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); ckptVariant(); ck += (System.nanoTime() - t1) / 1e9
    }
    println(f"lazy tf       : min=${lz.min}%.3f s (all: " + lz.map(t => f"$t%.3f").mkString(", ") + ")")
    println(f"checkpoint tf : min=${ck.min}%.3f s (all: " + ck.map(t => f"$t%.3f").mkString(", ") + ")")
    spark.stop()
  }
}
