package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Similarity search over the `embeddings` table (embedding: array<float>).
  *
  * Numeric policy: the embedding is cast to array<double>, the dot product is
  * a sequential left fold (`aggregate(zip_with(...))`), and cosine =
  * dot / (sqrt(norm_a) * sqrt(norm_b)). All three steps are bit-reproducible
  * and match DuckDB's `list_dot_product` on DOUBLE[] exactly (verified), so
  * the oracle hash-matches with NO rounding and ranking ties are impossible
  * to get wrong across engines.
  *
  * Scale notes (100 TB): brute force is the correctness baseline — a
  * broadcast of the query set against a full scan, O(Q×N) but perfectly
  * parallel and shuffle-free until the final per-query top-k. The bucketed
  * variant (`ivfTopK`) is the scale path: probe only the query's bucket
  * (here the `label` column plays the IVF coarse quantizer), cutting the
  * scanned fraction to 1/nlist like a real IVF index.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns — a native
    * codegen'd expression (HashExpressions.DotProduct); bit-identical to the
    * higher-order `aggregate(zip_with(...))` formulation it replaces. */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashExpressions.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Normalize an embeddings frame (vec_id, label, embedding) into the
    * joinable base: double vectors + the norm precomputed ONCE per row (vs
    * once per pair — the oracle's per-pair sqrt(dot(v,v)) yields the same
    * double, so parity holds while the engine does a third of the flops). */
  def baseOf(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm_v", sqrt(dot(col("vec"), col("vec"))))

  private def baseDf(spark: SparkSession, sfDir: String): DataFrame =
    baseOf(Tables.spreadIfNarrow(Tables.embeddings(spark, sfDir), col("vec_id")))

  private def queriesDf(spark: SparkSession, sfDir: String, queryMod: Int): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"),
              col("embedding").cast("array<double>").as("q_vec"),
              col("label").as("q_label"))
      .withColumn("norm_q", sqrt(dot(col("q_vec"), col("q_vec"))))

  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    pairs
      .withColumn("cos", dot(col("q_vec"), col("vec")) / (col("norm_q") * col("norm_v")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Brute-force cosine top-k: every (query % queryMod == 0) vector against
    * the whole table. Broadcast the small query side; rank per query by
    * (cosine desc, vec_id asc). */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
                     k: Int = 5, queryMod: Int = 100): DataFrame =
    rankTopK(
      baseDf(spark, sfDir).join(broadcast(queriesDf(spark, sfDir, queryMod)),
        col("vec_id") =!= col("q_id")), k)

  /** IVF-style bucketed ANN: probe only vectors sharing the query's `label`
    * (coarse-quantizer cell). Same ranking semantics within the bucket. */
  def ivfTopK(spark: SparkSession, sfDir: String,
              k: Int = 5, queryMod: Int = 100): DataFrame =
    rankTopK(
      baseDf(spark, sfDir).join(broadcast(queriesDf(spark, sfDir, queryMod)),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id")), k)

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component (j,i) =
    * (((j*1000003 + i) * 2654435761) mod 1000000007 mod 2001 - 1000)/1000 ∈
    * [-1,1]. Pure integer arithmetic + a 3-decimal rational, so the EXACT
    * same plane constants are embeddable in oracle SQL. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until numPlanes).map { j =>
      Array.tabulate(dim) { i =>
        val h = ((j.toLong * 1000003L + i) * 2654435761L) % 1000000007L
        ((h % 2001L) - 1000L) / 1000.0
      }
    }

  /** Sign-LSH bucket id: bit j set iff dot(vec, plane_j) > 0. */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vec, lit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: random-hyperplane signatures partition the space into
    * 2^numPlanes buckets; each query probes only its own bucket. The
    * open-domain scale path when no IVF coarse quantizer exists — candidates
    * shrink ~2^numPlanes-fold; recall is traded via numPlanes (multi-probe
    * extends it). Ranking semantics identical to the other top-k ops. */
  def lshTopK(spark: SparkSession, sfDir: String,
              k: Int = 5, queryMod: Int = 100, numPlanes: Int = 6): DataFrame = {
    val planes = hyperplanes(numPlanes, 64)
    val base = baseDf(spark, sfDir)
      .withColumn("bucket", hyperplaneBucket(col("vec"), planes))
    val q = queriesDf(spark, sfDir, queryMod)
      .withColumn("q_bucket", hyperplaneBucket(col("q_vec"), planes))
    rankTopK(
      base.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id")), k)
  }

  /** Multi-probe LSH ANN: each query probes its own bucket PLUS every bucket
    * at hamming distance 1 in plane-sign space (flip one plane bit), the
    * standard recall-recovery move for sign-LSH — vectors near a hyperplane
    * land on either side, and the 1-bit probes retrieve them without
    * shrinking numPlanes. Candidates grow by ~(numPlanes+1)×bucket-size per
    * query, still 2^numPlanes-fold below brute force. A base vector lives in
    * exactly ONE bucket, so it matches at most one probe per query — the
    * probe expansion cannot duplicate pairs. */
  def lshMultiProbeTopK(spark: SparkSession, sfDir: String,
                        k: Int = 5, queryMod: Int = 100, numPlanes: Int = 6): DataFrame = {
    val planes = hyperplanes(numPlanes, 64)
    val base = baseDf(spark, sfDir)
      .withColumn("bucket", hyperplaneBucket(col("vec"), planes))
    val q = queriesDf(spark, sfDir, queryMod)
      .withColumn("q_bucket", hyperplaneBucket(col("q_vec"), planes))
      .withColumn("probe", explode(array(
        col("q_bucket") +:
          (0 until numPlanes).map(j => col("q_bucket").bitwiseXOR(lit(1L << j))): _*)))
    rankTopK(
      base.join(broadcast(q),
        col("bucket") === col("probe") && col("vec_id") =!= col("q_id")), k)
  }

  /** Fixed-point quantum for order-independent centroid means: component
    * sums are accumulated as `floor(v * 2^30)` BIGINTs, so the distributed
    * sum is exact integer arithmetic — the reduction-tree shape (which on a
    * 1000-executor cluster is nondeterministic) cannot perturb the mean, and
    * the oracle reproduces it bit-for-bit. The 2^-30 quantization (~1e-9,
    * far below float32 input precision) is part of the operator's contract. */
  val KMeansQuantum = 1073741824.0 // 2^30

  /** Sequential self-dot (same association as [[dot]] / DuckDB's
    * list_dot_product) for driver-held centroid vectors. */
  private def selfDot(c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Add the argmin-cluster column for a fixed centroid set: per centroid j,
    * score_j = dot(c_j,c_j) - 2*dot(vec,c_j) (the rank-equivalent of squared
    * L2 distance — dot(vec,vec) is constant per row), tie-broken by centroid
    * id. A pure projection: the centroid set rides into every task as plan
    * literals, so assignment costs ZERO shuffles at any scale — exactly how
    * a trained coarse quantizer must behave on 100 TB. */
  def withCluster(base: DataFrame,
                  centroids: Seq[(Long, Array[Double])]): DataFrame =
    base.withColumn("cluster", argminCid(centroids, col("vec")))

  /** [[withCluster]] for nlist BEYOND the plan-literal limit (see
    * [[argminCid]]): the centroids become a broadcast TABLE instead of
    * plan literals. Each vector is scored against the broadcast set — an
    * equi-key-free join, so Spark plans the assignment as ONE
    * BroadcastNestedLoopJoin (the broadcast is the point; a hash join
    * needs an equi key an argmin doesn't have) — and the N×k scored rows
    * stream straight into the map-side partial of a min-aggregation
    * (struct(score, cid) min = argmin with the same (score, cid)
    * tie-break as the literal form), so they never materialize or
    * shuffle. Cost vs the literal projection: ONE hash shuffle of the
    * corpus (the aggregation's final round) — the price of an nlist too
    * wide to ride in the plan, paid once per index build. Output schema
    * and values are IDENTICAL to [[withCluster]] by construction (same
    * score, same tie-break, same dot association); the gate pins
    * bcast-form ≡ literal-form under ann_ivf_trained_topk's oracle. */
  def withClusterBroadcast(base: DataFrame,
                           centroids: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    if (centroids.isEmpty)
      return base.withColumn("cluster", lit(null).cast("long"))
    val carried = base.columns.toSeq
    val cents = centroids.map { case (cid, c) => (cid, selfDot(c), c.toSeq) }
      .toDF("cid", "cdot", "cvec")
    base.join(broadcast(cents))
      .withColumn("score", col("cdot") - lit(2.0) * dot(col("vec"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("score"), col("cid"))).getField("cid").as("__cluster_raw"),
           (carried.filter(_ != "vec_id").map(c => min(col(c)).as(c)) :+
             count(lit(1)).as("__n")): _*)
      // the min()-recovered carried columns are only sound when base rows
      // are UNIQUE per vec_id (every consumer's contract); a duplicate
      // would silently merge rows with arbitrarily-mixed carried values, so
      // it must be an ERROR. Each unique row contributes exactly
      // |centroids| scored rows to its group — any other count is a
      // duplicate. The check lives inside the output column so pruning
      // can never drop it.
      .select(carried.map(col) :+
        when(col("__n") === lit(centroids.size.toLong), col("__cluster_raw"))
          .otherwise(raise_error(concat(
            lit("withClusterBroadcast: duplicate vec_id "), col("vec_id"))))
          .as("cluster"): _*)
  }

  /** The argmin-centroid column shared by the coarse quantizer
    * ([[withCluster]]) and the PQ encoder: per candidate, score =
    * dot(c,c) - 2·dot(vec, c) (the rank-equivalent of squared L2 —
    * dot(vec,vec) is constant per row), tie-broken by candidate id; a pure
    * projection over plan literals. No candidates (empty training corpus):
    * unassigned — the zero-arg array() would otherwise fail analysis.
    *
    * PLAN-SIZE LIMIT: the candidate set is embedded as k×dim double
    * literals, which is the zero-shuffle ideal for the gate's nlist (8) and
    * fine into the low hundreds, but a production IVF with nlist in the
    * thousands would blow the generated code and plan size (a
    * thousands-wide array-of-struct literal). Past that, assignment must
    * become data — [[withClusterBroadcast]] is that path. */
  private def argminCid(cands: Seq[(Long, Array[Double])], vec: Column): Column =
    if (cands.isEmpty) lit(null).cast("long")
    else array_min(array(cands.map { case (cid, c) =>
      struct((lit(selfDot(c)) - lit(2.0) * dot(vec, typedLit(c))).as("score"),
             lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Lloyd k-means over (vec_id, vec): init from the first k vec_ids, then
    * `rounds` iterations of assign + recompute. Per round: assignment is a
    * shuffle-free projection (see [[withCluster]]); the mean recompute is ONE
    * hash shuffle of (cluster, dim, quantized-component) partial sums; only
    * the k×dim centroid table ever reaches the driver (control plane, like
    * the Pregel loop in Dedup.lshComponentsOf — the corpus never does).
    * Empty clusters drop out (both engines agree on the surviving set).
    * Returns the trained centroids ordered by centroid id. */
  def kmeansCentroids(base: DataFrame, k: Int = 8, rounds: Int = 2,
                      initBelow: Long = -1L): Seq[(Long, Array[Double])] = {
    // default init: the first k vec_ids. A sampled train set passes a wider
    // bound (k * sampleMod) so the seed still collects k sampled vectors.
    val seedBound = if (initBelow >= 0L) initBelow else k.toLong
    var cents: Seq[(Long, Array[Double])] = base
      .filter(col("vec_id") < seedBound)
      .select(col("vec_id"), col("vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    for (_ <- 1 to rounds if cents.nonEmpty) {
      val dim = cents.head._2.length
      val stats = withCluster(base, cents)
        .select(col("cluster"), posexplode(col("vec")).as(Seq("dim", "comp")))
        .select(col("cluster"), col("dim"),
                floor(col("comp") * KMeansQuantum).cast("long").as("qv"))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("dim"),
                (col("s").cast("double") / col("n") / KMeansQuantum).as("mean"))
        .collect()
      cents = stats.groupBy(_.getLong(0)).map { case (cid, rows) =>
        val arr = new Array[Double](dim)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        (cid, arr)
      }.toSeq.sortBy(_._1)
    }
    cents
  }

  private def trainInput(spark: SparkSession, sfDir: String): DataFrame =
    baseDf(spark, sfDir).select(col("vec_id"), col("label"), col("vec"), col("norm_v"))

  /** Run `body` with `df` cached for the duration (the training loop reads
    * the input once per round — evaluating the scan+projection repeatedly is
    * waste at any scale, and at 100 TB the train input would be a cached /
    * checkpointed sample). Respects a cache the caller already placed. */
  private def withCached[T](df: DataFrame)(body: DataFrame => T): T = {
    val callerCached = df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) df else df.cache()
    try body(cached)
    finally if (!callerCached) cached.unpersist()
  }

  /** Per-JVM cache of TRAINED MODELS keyed by (corpus dir, trainer,
    * hyperparameters) — the index-build amortization a production vector
    * store does: training is fully deterministic (same input, same seed,
    * same fixed-point sums ⇒ bit-identical model), so every consumer of
    * the same (corpus, params) model shares ONE build and searches measure
    * search. Correctness is unaffected and cannot be masked: the DuckDB
    * oracle replays every variant's full training chain independently, so
    * a wrong or stale cache entry hash-mismatches immediately. Entries are
    * k×dim doubles — driver-trivial. Keys assume the gate's immutable
    * corpus dirs (a mutated file under the same path would need a restart,
    * like any external index). */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  /** NOT `computeIfAbsent`: a composite artifact (e.g. the recall rank
    * table) trains its component models through nested `memoModel` calls,
    * and `computeIfAbsent` holds the bin lock across `train` — nesting
    * throws `IllegalStateException: Recursive update`. get/putIfAbsent is
    * reentrant; two concurrent first-builders may both train, but every
    * build is deterministic (fixed-point sums) so first-put wins with an
    * identical value and repeats always hit the cache. */
  private def memoModel[T <: AnyRef](key: String)(train: => T): T = {
    val hit = modelCache.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val built = train
      modelBuilds.computeIfAbsent(key,
        _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
      val prior = modelCache.putIfAbsent(key, built)
      (if (prior != null) prior else built).asInstanceOf[T]
    }
  }
  /** Per-key TRAIN count — distinct from key-set presence: a cache-scope
    * regression that re-runs `train` under an existing key (or races one
    * key through two builders sequentially) leaves the key set unchanged
    * but shows up here. KMeansSpec pins warm repeats to zero new builds. */
  private val modelBuilds =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  /** How many times `train` actually ran for `key` this session. */
  private[graft] def modelBuildCount(key: String): Long = {
    val c = modelBuilds.get(key)
    if (c == null) 0L else c.get()
  }
  /** Total train executions across all keys this session. */
  private[graft] def modelBuildTotal: Long = {
    import scala.jdk.CollectionConverters._
    modelBuilds.values.asScala.map(_.get()).sum
  }
  /** Number of cached trained models — lets tests pin that repeat
    * searches share a build instead of silently retraining. */
  private[graft] def cachedModelCount: Int = modelCache.size
  /** The cache's current KEY SET — specs assert on the presence/absence of
    * specific keys (via [[coarseModelKey]]) rather than on global counts,
    * which would break under any concurrent training in the same JVM. */
  private[graft] def cachedModelKeys: Set[String] = {
    import scala.jdk.CollectionConverters._
    modelCache.keySet.asScala.toSet
  }
  /** Drop every cached model. The cache keys assume immutable corpus dirs;
    * a long-lived driver that regenerates data under the SAME path (or a
    * test reusing a temp path) must call this, exactly like rebuilding any
    * external index after its source moved underneath it. */
  private[graft] def clearModelCache(): Unit = {
    modelCache.clear()
    modelBuilds.clear() // keep the build ledger coherent with the cache
  }
  /** The coarse quantizer's cache key for (corpus, k, rounds) — exposed so
    * specs pin the exact entry a search shares, not a count. */
  private[graft] def coarseModelKey(sfDir: String, k: Int, rounds: Int = 2): String =
    s"coarse|$sfDir|$k|$rounds"

  /** The shared coarse-quantizer build for a corpus dir (see
    * [[modelCache]]). */
  private def coarseFor(sfDir: String, base: DataFrame,
                        k: Int, rounds: Int): Seq[(Long, Array[Double])] =
    memoModel(coarseModelKey(sfDir, k, rounds))(kmeansCentroids(base, k, rounds))

  /** The shared raw-vector PQ-book build for a corpus dir. [[pqCodebooks]]
    * reads only (vec_id, vec), so books trained on the plain corpus and on
    * its cell-annotated view are the same model — one key serves both. */
  private def booksFor(sfDir: String, base: DataFrame,
                       m: Int, ksub: Int, rounds: Int): Seq[Seq[(Long, Array[Double])]] =
    memoModel(s"books|$sfDir|$m|$ksub|$rounds")(pqCodebooks(base, m, ksub, rounds))

  /** The shared SAMPLED coarse-quantizer build (every consumer of one
    * cache key constructs it through one helper — key-format drift would
    * silently double-train). */
  private def sampledCoarseFor(sfDir: String, base: DataFrame, k: Int,
                               rounds: Int, sampleMod: Int): Seq[(Long, Array[Double])] =
    memoModel(s"coarse-sampled|$sfDir|$k|$rounds|$sampleMod") {
      kmeansCentroids(base.filter(col("vec_id") % sampleMod === 0), k, rounds,
        initBelow = k.toLong * sampleMod)
    }

  /** The shared RESIDUAL PQ-book build: residual books depend on the
    * coarse model too, so the key carries both hyperparameter sets.
    * `resid` must be [[residualViewOf]] under the same (nClusters,
    * coarseRounds). */
  private def residBooksFor(sfDir: String, resid: DataFrame,
                            m: Int, ksub: Int, rounds: Int,
                            nClusters: Int, coarseRounds: Int): Seq[Seq[(Long, Array[Double])]] =
    memoModel(s"books-resid|$sfDir|$m|$ksub|$rounds|$nClusters|$coarseRounds") {
      pqCodebooks(resid, m, ksub, rounds)
    }

  /** Final cluster assignment after [[kmeansCentroids]] training — the
    * oracle-checked face of the trainer (integer output: float-hash-proof). */
  def kmeansAssignments(spark: SparkSession, sfDir: String,
                        k: Int = 8, rounds: Int = 2): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      // the returned plan holds the centroids as LITERALS — it no longer
      // needs the cache, which only served the training rounds' actions
      withCluster(base, coarseFor(sfDir, base, k, rounds))
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }

  /** [[kmeansAssignments]] with the trainer run over a deterministic SAMPLE
    * (`vec_id % sampleMod == 0`) while the assignment covers the full
    * corpus — how a coarse quantizer is actually built at 100 TB: Lloyd
    * rounds touch 1/sampleMod of the data (per-round cost shrinks
    * sampleMod-fold), and the full corpus is only ever read by the final
    * zero-shuffle assignment projection. The seed takes the first k
    * sampled vectors (`vec_id < k*sampleMod`), so the init is as
    * deterministic as the unsampled trainer's. The oracle replays the
    * identical sampled loop. */
  def kmeansAssignmentsSampled(spark: SparkSession, sfDir: String,
                               k: Int = 8, rounds: Int = 2,
                               sampleMod: Int = 4): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      withCluster(base, sampledCoarseFor(sfDir, base, k, rounds, sampleMod))
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }

  /** Increment count for [[ivfAppendStreaming]] — interpolated into its
    * oracle (the `vec_id % N` replay split must be stated identically on
    * both sides). */
  private[graft] val AppendIncrements = 3

  /** STREAMING IVF INDEX MAINTENANCE — the gap between "the ANN family is
    * batch-built" and a real pipeline that appends vectors continuously:
    * new vectors arrive in micro-batches and are assigned to the FROZEN
    * trained centroids (the session's shared coarse model — appends train
    * NOTHING, spec-pinned via [[modelBuildCount]]), each batch's
    * (vec_id, cluster) rows appended to a versioned cell-index journal
    * (`v=<batchId>`, mode=overwrite — the idempotent-replay recipe shared
    * with [[Dedup.dedupIncrementalSnapshot]]). Because assignment is a
    * deterministic integer argmin over plan literals ([[withCluster]] —
    * ZERO shuffles per batch at any scale), per-batch assignment is
    * definitionally equal to batch assignment over the union: the oracle
    * states exactly that (the full k-means chain's final assignment plus
    * the replay's `vec_id % N` increment rule).
    *
    * The journal builds once per (JVM, sfDir) and is shared by repeats —
    * the scd2Journal lifecycle. */
  def ivfAppendStreaming(spark: SparkSession, sfDir: String,
                         nClusters: Int = 8, rounds: Int = 2): DataFrame = {
    // journal keyed by (corpus, hyperparameters) like every trained
    // artifact (r18 review: an sfDir-only key would hand a k=16 caller
    // the k=8 journal or vice versa)
    val outDir = appendIndexCache.computeIfAbsent(
      s"$sfDir|$nClusters|$rounds", { _ =>
        val d = java.nio.file.Files
          .createTempDirectory("graft-ivf-append-").toString
        buildAppendIndex(spark, sfDir, d, nClusters, rounds)
        d
      })
    Dedup.snapshotVersionsBefore(spark, outDir, Long.MaxValue)
      .getOrElse(sys.error("no IVF append version written"))
      .orderBy(col("vec_id"))
  }

  private val appendIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def buildAppendIndex(spark: SparkSession, sfDir: String,
                               outDir: String, nClusters: Int,
                               rounds: Int): Unit = {
    val n = AppendIncrements
    withCached(trainInput(spark, sfDir)) { base =>
      val cents = coarseFor(sfDir, base, nClusters, rounds) // FROZEN model
      // the replay copy is hyperparameter-free (raw vectors) — shared
      // across models of the same corpus
      StatefulQueries.versionedReplayJournal(spark, s"ivfappend:$sfDir",
        (0 until n).map(i => s"a$i.parquet"),
        (0 until n).map(i =>
          base.select(col("vec_id"), col("vec")).filter(col("vec_id") % n === i)),
        n) { (batch, id) =>
        withCluster(batch, cents)
          .select(col("vec_id"), col("cluster"), lit(id).as("increment"))
          .write.mode("overwrite").parquet(s"$outDir/v=$id")
      }
    }
  }

  /** IVF ANN over TRAINED cells: identical to [[ivfTopK]] but the coarse
    * quantizer is the k-means model rather than the pre-existing `label`
    * column — each query probes only its own trained cell (1/k of the data
    * in expectation). The assignment being a projection means building the
    * "index" adds no shuffle beyond training itself. */
  def ivfTrainedTopK(spark: SparkSession, sfDir: String,
                     k: Int = 5, queryMod: Int = 100,
                     nClusters: Int = 8, rounds: Int = 2): DataFrame =
    withCached(trainInput(spark, sfDir)) { base0 =>
      ivfTrainedTopKFrom(base0, coarseFor(sfDir, base0, nClusters, rounds), k, queryMod)
    }

  /** [[ivfTrainedTopK]]'s search over an ALREADY-TRAINED coarse quantizer —
    * shared with [[annRecall]], which trains each distinct model once. */
  private def ivfTrainedTopKFrom(base0: DataFrame, cents: Seq[(Long, Array[Double])],
                                 k: Int, queryMod: Int): DataFrame = {
    val base = withCluster(base0, cents)
    val q = base
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
              col("norm_v").as("norm_q"), col("cluster").as("q_cluster"))
    rankTopK(
      base.join(broadcast(q),
        col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id")), k)
  }

  /** [[ivfTrainedTopK]] with the coarse assignment running through
    * [[withClusterBroadcast]] — the nlist-in-the-thousands form of the
    * trained IVF search, registered under the SAME oracle as
    * ann_ivf_trained_topk: the two assignment paths must agree bit-for-bit
    * (same score, same tie-break), so the gate hash-checks the broadcast
    * path against the literal path's independently-replayed SQL. */
  def ivfBcastTopK(spark: SparkSession, sfDir: String,
                   k: Int = 5, queryMod: Int = 100,
                   nClusters: Int = 8, rounds: Int = 2): DataFrame =
    withCached(trainInput(spark, sfDir)) { base0 =>
      val cents = coarseFor(sfDir, base0, nClusters, rounds)
      if (cents.isEmpty) emptyCosFrame(base0)
      else {
        val base = withClusterBroadcast(base0, cents)
        val q = base
          .filter(col("vec_id") % queryMod === 0)
          .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
                  col("norm_v").as("norm_q"), col("cluster").as("q_cluster"))
        rankTopK(
          base.join(broadcast(q),
            col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id")), k)
      }
    }

  /** Trained IVF with multi-probe: each query searches its `nProbe` NEAREST
    * trained cells instead of only the closest — the standard IVF recall
    * knob (vectors near a cell boundary live in a neighbor cell; probing it
    * retrieves them without retraining). Candidates grow linearly in
    * nProbe, still ~k-fold below brute force; a base vector lives in
    * exactly ONE cell, so probes cannot duplicate pairs. The probe list is
    * the first nProbe entries of the per-centroid score array sorted by
    * (score, cid) — the same ordering the single-probe argmin uses. */
  def ivfTrainedMultiProbeTopK(spark: SparkSession, sfDir: String,
                               k: Int = 5, queryMod: Int = 100,
                               nClusters: Int = 8, rounds: Int = 2,
                               nProbe: Int = 2): DataFrame =
    withCached(trainInput(spark, sfDir)) { base0 =>
      ivfTrainedMultiProbeTopKFrom(base0, coarseFor(sfDir, base0, nClusters, rounds),
        k, queryMod, nProbe)
    }

  /** [[ivfTrainedMultiProbeTopK]]'s search over an already-trained coarse
    * quantizer (see [[ivfTrainedTopKFrom]]). */
  private def ivfTrainedMultiProbeTopKFrom(base0: DataFrame,
                                           cents: Seq[(Long, Array[Double])],
                                           k: Int, queryMod: Int,
                                           nProbe: Int): DataFrame = {
    val base = withCluster(base0, cents)
    val scored = cents.map { case (cid, c) =>
      struct((lit(selfDot(c)) - lit(2.0) * dot(col("vec"), typedLit(c))).as("score"),
             lit(cid).as("cid"))
    }
    val q = base0
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
              col("norm_v").as("norm_q"),
              explode(slice(array_sort(array(scored: _*)), 1, nProbe)).as("p"))
      .select(col("q_id"), col("q_vec"), col("norm_q"),
              col("p.cid").as("q_cluster"))
    rankTopK(
      base.join(broadcast(q),
        col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id")), k)
  }

  /** Near-duplicate detection by embedding cosine >= threshold. Pairs are
    * generated per (label, sign-LSH band) cell — `numBands` bands of
    * `planesPerBand` hyperplanes each, a pair is a candidate when ANY band
    * matches (the MinHash-LSH OR-construction applied to hyperplane signs) —
    * so the quadratic term is bounded by cell size, not label cardinality.
    * With 4 bands of 2 planes a cos>=0.4 pair survives with p~0.87 and the
    * per-label cell shrinks 4x per band; planesPerBand=0 degenerates to
    * exact per-label all-pairs (single all-zero bucket) when labels are
    * known-small. The oracle SQL applies the identical banding. */
  def cosineNearDup(spark: SparkSession, sfDir: String,
                    threshold: Double = 0.95,
                    numBands: Int = 4, planesPerBand: Int = 2): DataFrame =
    bandedNearDupOf(baseDf(spark, sfDir), "label", threshold, numBands, planesPerBand)

  /** The banded near-dup pair core shared by [[cosineNearDup]] (cell =
    * `label`) and [[semanticNearDup]] (cell = trained cluster): explode each
    * vector into its `numBands` (band_idx, bucket) rows, self-join on
    * (cell, band, bucket), keep cos >= threshold, dedup multi-band hits. `e`
    * must carry (vec_id, `cellCol`, vec, norm_v). */
  private def bandedNearDupOf(e: DataFrame, cellCol: String, threshold: Double,
                              numBands: Int, planesPerBand: Int): DataFrame = {
    val planes = hyperplanes(numBands * planesPerBand, 64)
    val bandCols = (0 until numBands).map { b =>
      if (planesPerBand == 0) lit(0L)
      else hyperplaneBucket(col("vec"), planes.slice(b * planesPerBand, (b + 1) * planesPerBand))
    }
    val banded = e
      .select(col("vec_id"), col(cellCol), col("vec"), col("norm_v"),
        posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "bkt")
    val a = banded.select(col("vec_id").as("id_a"), col(cellCol), col("band_idx"), col("bkt"),
      col("vec").as("vec_a"), col("norm_v").as("norm_a"))
    val b = banded.select(col("vec_id").as("id_b"), col(cellCol), col("band_idx"), col("bkt"),
      col("vec").as("vec_b"), col("norm_v").as("norm_b"))
    a.join(b, Seq(cellCol, "band_idx", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cos") >= threshold)
      // a pair matching in k bands appears k times with the same cosine;
      // min() dedups them order-deterministically
      .groupBy(col("id_a"), col("id_b")).agg(min(col("cos")).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SEMANTIC near-duplicate detection: [[cosineNearDup]] with the coarse
    * cell being a TRAINED k-means cluster instead of the pre-existing
    * `label` column — the embedding-space dedup a corpus without labels
    * needs. The quantizer is trained on the deterministic 1/sampleMod
    * sample (the 100 TB recipe of [[kmeansAssignmentsSampled]]: Lloyd
    * rounds never touch the full corpus), assignment is the zero-shuffle
    * centroid-literal projection, and within each cluster the sign-LSH
    * banding bounds the quadratic exactly as in [[cosineNearDup]] — so the
    * pair search is quadratic only in (cluster ∩ band-bucket) cells, while
    * near-identical vectors land in the same cluster by construction. */
  def semanticNearDup(spark: SparkSession, sfDir: String,
                      threshold: Double = 0.4,
                      numBands: Int = 4, planesPerBand: Int = 2,
                      nClusters: Int = 8, rounds: Int = 2,
                      sampleMod: Int = 4): DataFrame =
    withCached(trainInput(spark, sfDir)) { base0 =>
      val cents = sampledCoarseFor(sfDir, base0, nClusters, rounds, sampleMod)
      bandedNearDupOf(withCluster(base0, cents), "cluster",
        threshold, numBands, planesPerBand)
    }

  // ---- Product quantization (the IVF-PQ memory layout at 100 TB) ----

  /** Embedding dimensionality of the driver tables (also pinned by the
    * oracle's KMeansDim); PQ slices it into [[PqM]] subspaces. */
  val EmbeddingDim = 64
  /** PQ geometry: M subspaces × K codewords, trained [[PqRounds]] Lloyd
    * rounds each — 64 dims → 4 × 16-dim sub-quantizers of 8 codewords. */
  val PqM = 4
  val PqK = 8
  val PqRounds = 2

  /** Per-subspace PQ codebooks: subspace j is `vec[j·sub+1 .. (j+1)·sub]`
    * and trains its own k-means (quantized sums, driver holds only k×sub
    * doubles per book). Codebook ids are the surviving seed vec_ids,
    * exactly like the coarse quantizer's.
    *
    * All M books train JOINTLY: per Lloyd round, ONE projection computes
    * every book's assignment (M argmins over plan literals) and ONE
    * posexplode + groupBy (subspace, cluster, component) shuffle carries
    * every book's quantized sums — M independent trainers would pay M
    * scans and M shuffles per round for the identical result (each
    * component contributes to exactly one book, so the joint grouping
    * computes the same per-book sums; the oracle replays the books as
    * independent chains, which pins joint ≡ independent). */
  def pqCodebooks(base: DataFrame, m: Int = PqM, k: Int = PqK,
                  rounds: Int = PqRounds,
                  dim: Int = EmbeddingDim): Seq[Seq[(Long, Array[Double])]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    // seeds: the first k vec_ids' subvectors, one collect for all books
    var books: Seq[Seq[(Long, Array[Double])]] = {
      val seeds = base.filter(col("vec_id") < k)
        .select(col("vec_id"), col("vec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      (0 until m).map(j => seeds.map { case (id, v) =>
        (id, v.slice(j * sub, (j + 1) * sub))
      })
    }
    for (_ <- 1 to rounds if books.forall(_.nonEmpty)) {
      val codeCols = (0 until m).map { j =>
        argminCid(books(j), slice(col("vec"), j * sub + 1, sub)).as(s"code$j")
      }
      // a component at flat index `dim` belongs to book dim/sub — route it
      // to that book's cluster for this row
      val subspace = expr(s"dim div $sub")
      val cluster = coalesce((0 until m).map(j =>
        when(subspace === j, col(s"code$j"))): _*)
      val stats = base
        .select(col("vec_id") +: codeCols :+
          posexplode(col("vec")).as(Seq("dim", "comp")): _*)
        .select(subspace.as("subspace"), cluster.as("cluster"),
                pmod(col("dim"), lit(sub)).as("subdim"),
                floor(col("comp") * KMeansQuantum).cast("long").as("qv"))
        .groupBy(col("subspace"), col("cluster"), col("subdim"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
        .select(col("subspace"), col("cluster"), col("subdim"),
                (col("s").cast("double") / col("n") / KMeansQuantum).as("mean"))
        .collect() // m×k×sub rows — the control plane, never the corpus
      books = (0 until m).map { j =>
        stats.filter(_.getLong(0) == j).groupBy(_.getLong(1)).map { case (cid, rows) =>
          val arr = new Array[Double](sub)
          rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
          (cid, arr)
        }.toSeq.sortBy(_._1)
      }
    }
    books
  }


  /** PQ ENCODING: each vector compresses to M codeword ids — the memory
    * layout a 100 TB vector index actually stores (M small ints per vector
    * instead of `dim` floats; here 4 ids for 64 floats). Training is M
    * independent sub-quantizer Lloyd runs (each the [[kmeansCentroids]]
    * control-plane loop); encoding is ONE zero-shuffle projection with all
    * M codebooks riding as plan literals. */
  def pqCodes(spark: SparkSession, sfDir: String,
              m: Int = PqM, k: Int = PqK, rounds: Int = PqRounds): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val books = booksFor(sfDir, base, m, k, rounds)
      pqCodesOf(base, books, m)
        .orderBy(col("vec_id"))
    }

  def pqCodesOf(base: DataFrame, books: Seq[Seq[(Long, Array[Double])]],
                m: Int = PqM, dim: Int = EmbeddingDim): DataFrame = {
    val sub = dim / m
    base.select(col("vec_id") +: (0 until m).map { j =>
      argminCid(books(j), slice(col("vec"), j * sub + 1, sub)).as(s"code$j")
    }: _*)
  }

  /** [[pqCodes]] for codebooks BEYOND the plan-literal limit (see
    * [[argminCid]]) — the [[withClusterBroadcast]] escape hatch applied to
    * the PQ encoder: a production k=256 × M codebook embedded as literals
    * is the same plan/codegen blowup the coarse path escaped. The m×k
    * codewords become a broadcast TABLE (subspace, cid, dot(c,c), c); each
    * vector joins it ONCE (BroadcastNestedLoopJoin — an argmin has no equi
    * key), every scored row slices the vector to the codeword's OWN
    * subspace, and one hash aggregation folds the M per-subspace argmins
    * per vector, streaming through the map-side partial min. Score,
    * tie-break, slice geometry, and dot association are IDENTICAL to the
    * literal encoder by construction — the gate pins bcast-form ≡
    * literal-form under pq_codes' oracle. Cost vs the literal projection:
    * ONE hash shuffle of (vec_id, M codes) — paid once per index build. */
  def pqCodesBcast(spark: SparkSession, sfDir: String,
                   m: Int = PqM, k: Int = PqK, rounds: Int = PqRounds): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val books = booksFor(sfDir, base, m, k, rounds)
      // an empty training corpus trains no codebooks: the literal encoder
      // already degenerates to NULL codes at zero cost — reuse it
      if (books.exists(_.isEmpty)) pqCodesOf(base, books, m).orderBy(col("vec_id"))
      else pqCodesBcastOf(base, books, m).orderBy(col("vec_id"))
    }

  def pqCodesBcastOf(base: DataFrame, books: Seq[Seq[(Long, Array[Double])]],
                     m: Int = PqM, dim: Int = EmbeddingDim): DataFrame = {
    val sub = dim / m
    val spark = base.sparkSession
    import spark.implicits._
    val words = books.zipWithIndex.flatMap { case (book, j) =>
      book.map { case (cid, c) => (j, cid, selfDot(c), c.toSeq) }
    }.toDF("j", "cid", "cdot", "cvec")
    val nWords = books.map(_.size.toLong).sum
    val codeCols = (0 until m).map { j =>
      min(when(col("j") === j, struct(col("score"), col("cid"))))
        .getField("cid").as(s"__code$j")
    }
    base.select(col("vec_id"), col("vec"))
      .join(broadcast(words))
      .withColumn("score", col("cdot") - lit(2.0) *
        dot(slice(col("vec"), col("j") * sub + 1, lit(sub)), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(codeCols.head, codeCols.tail :+ count(lit(1)).as("__n"): _*)
      // base rows must be UNIQUE per vec_id (each contributes exactly
      // nWords scored rows) — a duplicate would silently merge two vectors'
      // argmins; the check lives inside an output column so pruning can
      // never drop it (same contract as withClusterBroadcast)
      .select(col("vec_id") +: (0 until m).map { j =>
        when(col("__n") === lit(nWords), col(s"__code$j"))
          .otherwise(raise_error(concat(
            lit("pqCodesBcast: duplicate vec_id "), col("vec_id"))))
          .as(s"code$j")
      }: _*)
  }

  /** ANN top-k by ASYMMETRIC DISTANCE (ADC) over PQ codes — how a PQ index
    * is actually searched: per QUERY, a distance table of M×K sub-dot
    * products is computed ONCE (columns `ip0..ip{M-1}`, one array per
    * subspace, riding the broadcast query row); per (query, vector) pair the
    * score is M table LOOKUPS and adds — no per-pair dot products at all,
    * which is the entire point (brute force pays `dim` multiplies per pair;
    * ADC pays M lookups). Score = Σ_j (dot(c,c) - 2·dot(q_sub_j, c)) for
    * the pair's codewords — the PQ approximation of squared L2 (minus the
    * per-query constant |q|²), ascending; ties by vec_id.
    *
    * The sum is associated LEFT-TO-RIGHT over subspaces and the oracle adds
    * the same four terms in the same order — float addition isn't
    * associative, so the association is part of the operator contract, like
    * the sequential-fold dot.
    *
    * Scale warning: this is a CORRECTNESS BASELINE, not a scale path — the
    * `vec_id =!= q_id` broadcast nested-loop join scores ALL (query, code)
    * pairs, sharing brute force's O(Q×N) candidate growth; only the
    * per-pair cost is cheaper (M lookups vs dim multiplies). The composed
    * [[ivfPqTopK]]/[[ivfPqMultiProbeTopK]] variants, whose ADC scoring this
    * baseline pins, prune candidates to 1/nlist and are the 100 TB shape. */
  def pqAdcTopK(spark: SparkSession, sfDir: String,
                k: Int = 5, queryMod: Int = 100,
                m: Int = PqM, ksub: Int = PqK, rounds: Int = PqRounds): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val dim = EmbeddingDim
      val sub = dim / m
      val books = booksFor(sfDir, base, m, ksub, rounds)
      // an empty training corpus trains no codebooks — nothing to search
      // (and the zero-arg array()/coalesce() below would fail analysis)
      if (books.exists(_.isEmpty)) emptyAdcFrame(base)
      else pqAdcTopKWith(base, books, k, queryMod, m, sub)
    }

  private def emptyAdcFrame(base: DataFrame): DataFrame =
    base.sparkSession.range(0)
      .select(col("id").as("q_id"), col("id").as("rk"),
              col("id").as("vec_id"), col("id").cast("double").as("score"))

  private def pqAdcTopKWith(base: DataFrame, books: Seq[Seq[(Long, Array[Double])]],
                            k: Int, queryMod: Int, m: Int, sub: Int): DataFrame = {
    val codes = pqCodesOf(base, books, m)
    val q = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id") +: adcLookupTables(books, m, sub): _*)
    adcRankTopK(codes.join(broadcast(q), col("vec_id") =!= col("q_id")), books, m, k)
  }

  /** The per-QUERY distance tables: one `ip_j` array per subspace holding
    * dot(q_sub_j, codeword) for every codeword — computed once per query
    * row, riding the broadcast. */
  private def adcLookupTables(books: Seq[Seq[(Long, Array[Double])]],
                              m: Int, sub: Int): Seq[Column] =
    (0 until m).map { j =>
      val qSub = slice(col("vec"), j * sub + 1, sub)
      array(books(j).map { case (_, c) => dot(qSub, typedLit(c)) }: _*).as(s"ip$j")
    }

  /** ADC scoring + per-query top-k over a (codes × query) pair frame that
    * carries `code0..` and `ip0..`: per pair, M table lookups added
    * LEFT-TO-RIGHT (the association is the contract), ranked ascending. */
  private def adcRankTopK(pairs: DataFrame, books: Seq[Seq[(Long, Array[Double])]],
                          m: Int, k: Int): DataFrame = {
    val scoreJ = (j: Int) => coalesce(books(j).zipWithIndex.map { case ((cid, c), idx) =>
      when(col(s"code$j") === cid,
        lit(selfDot(c)) - lit(2.0) * element_at(col(s"ip$j"), idx + 1))
    }: _*)
    val score = (0 until m).map(scoreJ).reduce(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").asc, col("vec_id").asc)
    pairs
      .withColumn("score", score)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** IVF-PQ: the COMPOSED index shape a 100 TB vector store actually runs —
    * the trained coarse quantizer prunes each query's candidates to its own
    * cell (1/nlist of the corpus, [[ivfTrainedTopK]]'s pruning), and the
    * survivors are scored by ADC over PQ codes ([[pqAdcTopK]]'s lookup
    * tables) — so the scan side touches only (cell, M codeword ids) per
    * vector: never raw vectors, never per-pair dot products. Codes here
    * quantize the raw vectors (IVFADC without residual encoding;
    * [[ivfPqResidualTopK]] is the residual refinement — same plan shape).
    * Both quantizers ride the plan as literals, so index build adds zero
    * shuffles beyond their control-plane training. */
  def ivfPqTopK(spark: SparkSession, sfDir: String,
                k: Int = 5, queryMod: Int = 100,
                nClusters: Int = 8, coarseRounds: Int = 2,
                m: Int = PqM, ksub: Int = PqK, rounds: Int = PqRounds): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val coarse = coarseFor(sfDir, base, nClusters, coarseRounds)
      if (coarse.isEmpty) emptyAdcFrame(base)
      else {
        val withCell = withCluster(base, coarse)
        val books = booksFor(sfDir, base, m, ksub, rounds)
        if (books.exists(_.isEmpty)) emptyAdcFrame(base)
        else ivfPqSearchWithBooks(withCell, books, k, queryMod, m)
      }
    }

  /** RESIDUAL IVF-PQ — the full FAISS-style index: the PQ books quantize
    * the residual `v - centroid(cell(v))` instead of the raw vector, so
    * codeword precision concentrates on within-cell variation (the coarse
    * quantizer already explains the between-cell part — on clustered data
    * residuals are smaller and the same K codewords cover them finer).
    * Queries score their OWN residual against the candidate's codes; plan
    * shape, shuffle profile, and per-pair cost are identical to
    * [[ivfPqTopK]] — the residual subtraction is one more projection
    * stage with the centroid table as plan literals. */
  def ivfPqResidualTopK(spark: SparkSession, sfDir: String,
                        k: Int = 5, queryMod: Int = 100,
                        nClusters: Int = 8, coarseRounds: Int = 2,
                        m: Int = PqM, ksub: Int = PqK, rounds: Int = PqRounds): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val coarse = coarseFor(sfDir, base, nClusters, coarseRounds)
      if (coarse.isEmpty) emptyAdcFrame(base)
      else {
        val resid = residualViewOf(base, coarse)
        val books = residBooksFor(sfDir, resid, m, ksub, rounds, nClusters, coarseRounds)
        if (books.exists(_.isEmpty)) emptyAdcFrame(base)
        else ivfPqSearchWithBooks(resid, books, k, queryMod, m)
      }
    }

  /** The residual view: v := v - centroid(cluster), per-component subtract
    * against the row's own cell centroid (a literal lookup — zero shuffle).
    * norm_v is DROPPED: it was the raw vector's norm and no longer matches
    * vec — carrying it would hand a stale invariant to any future cosine
    * use of this frame. */
  private def residualViewOf(base: DataFrame,
                             coarse: Seq[(Long, Array[Double])]): DataFrame = {
    val cvec = coalesce(coarse.map { case (cid, c) =>
      when(col("cluster") === cid, typedLit(c))
    }: _*)
    withCluster(base, coarse)
      .withColumn("vec", zip_with(col("vec"), cvec, (a, b) => a - b))
      .drop("norm_v")
  }

  /** The code-only cell-pruned ADC search over already-trained books —
    * shared with [[annRecall]]'s one-training-per-model composition. */
  private def ivfPqSearchWithBooks(withCell: DataFrame,
                                   books: Seq[Seq[(Long, Array[Double])]],
                                   k: Int, queryMod: Int, m: Int): DataFrame = {
    val sub = EmbeddingDim / m
    val codes = pqCellCodes(withCell, books, m, sub)
    val q = withCell.filter(col("vec_id") % queryMod === 0)
      .select(Seq(col("vec_id").as("q_id"), col("cluster").as("q_cluster")) ++
        adcLookupTables(books, m, sub): _*)
    adcRankTopK(
      codes.join(broadcast(q),
        col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id")),
      books, m, k)
  }

  /** (vec_id, cluster, code0..code{M-1}) — the stored face of an IVF-PQ
    * index row. */
  private def pqCellCodes(withCell: DataFrame, books: Seq[Seq[(Long, Array[Double])]],
                          m: Int, sub: Int): DataFrame =
    withCell.select(
      Seq(col("vec_id"), col("cluster")) ++ (0 until m).map { j =>
        argminCid(books(j), slice(col("vec"), j * sub + 1, sub)).as(s"code$j")
      }: _*)

  /** ADC-shortlist size of [[ivfPqRerankTopK]] — interpolated into the
    * oracle SQL (SparkEntry) so the two sides cannot drift. */
  val RerankShortlist = 20

  /** IVF-PQ with EXACT RE-RANKING — the production refine step (FAISS's
    * `IndexRefineFlat` shape): the composed index prunes to the query's
    * coarse cell and ranks by ADC as in [[ivfPqTopK]], but instead of
    * trusting approximate code distances for the final order, the top
    * `shortlist` ADC candidates are re-scored by TRUE cosine against their
    * raw vectors and the top-k of that exact order is returned.
    *
    * Why it matters at 100 TB: the scan side still touches only (cell, M
    * codeword ids) per vector — raw vectors are fetched for just
    * shortlist×Q rows (one co-keyed join), so the expensive exact math is
    * bounded by the shortlist, not the corpus. Recall provably dominates
    * [[ivfPqTopK]] under the same trained models: the ADC top-k is a
    * subset of the shortlist, and any true top-k member in it survives
    * exact re-scoring by definition (at most k-1 vectors can beat it) —
    * pinned as a hard count in KMeansSpec via [[annRecall]]. */
  def ivfPqRerankTopK(spark: SparkSession, sfDir: String,
                      k: Int = 5, queryMod: Int = 100,
                      nClusters: Int = 8, coarseRounds: Int = 2,
                      m: Int = PqM, ksub: Int = PqK, rounds: Int = PqRounds,
                      shortlist: Int = RerankShortlist): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val coarse = coarseFor(sfDir, base, nClusters, coarseRounds)
      if (coarse.isEmpty) emptyCosFrame(base)
      else {
        val withCell = withCluster(base, coarse)
        val books = booksFor(sfDir, base, m, ksub, rounds)
        if (books.exists(_.isEmpty)) emptyCosFrame(base)
        else ivfPqRerankFrom(base, withCell, books, k, queryMod, m, shortlist)
      }
    }

  /** [[ivfPqRerankTopK]]'s search over already-trained quantizers (see
    * [[ivfPqSearchWithBooks]]): ADC shortlist → raw-vector join → exact
    * cosine top-k. */
  private def ivfPqRerankFrom(base: DataFrame, withCell: DataFrame,
                              books: Seq[Seq[(Long, Array[Double])]],
                              k: Int, queryMod: Int, m: Int,
                              shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val short = ivfPqSearchWithBooks(withCell, books, shortlist, queryMod, m)
      .select(col("q_id"), col("vec_id"))
    val q = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
              col("norm_v").as("norm_q"))
    rankTopK(
      short.join(base.select(col("vec_id"), col("vec"), col("norm_v")), "vec_id")
        .join(broadcast(q), "q_id"), k)
  }

  /** Empty (q_id, rk, vec_id, cos) frame — [[emptyAdcFrame]]'s twin for
    * the exact-cosine output shape. */
  private def emptyCosFrame(base: DataFrame): DataFrame =
    base.sparkSession.range(0)
      .select(col("id").as("q_id"), col("id").as("rk"),
              col("id").as("vec_id"), col("id").cast("double").as("cos"))

  /** The pruned-index family measured by [[annRecall]], keyed by REGISTERED
    * query name (sorted — the report's output order). The oracle composes
    * these same names' SQL, so the two sides enumerate one list. */
  val RecallVariants: Seq[String] = Seq(
    "ann_ivf_topk", "ann_ivf_trained_probe2", "ann_ivf_trained_probe4",
    "ann_ivf_trained_topk", "ann_ivfpq_probe2", "ann_ivfpq_probe4",
    "ann_ivfpq_rerank", "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk", "ann_lsh_multiprobe_topk", "ann_lsh_topk")

  /** The trained variants' frames — every model comes from the shared
    * [[modelCache]] (coarse quantizer, raw PQ books, residual PQ books
    * under the standalone variants' own default keys), so the report
    * measures the exact models the standalone queries search, by
    * construction. Bit-identical to independent training (the same
    * deterministic Lloyd over the same input), which the oracle pins by
    * replaying every variant's chain independently. */
  private def recallTrainedFrames(spark: SparkSession, sfDir: String,
                                  k: Int, queryMod: Int): Map[String, DataFrame] =
    withCached(trainInput(spark, sfDir)) { base =>
      val coarse = coarseFor(sfDir, base, 8, 2)
      val (pq1, pq2, pq4, pqr, pqrr) =
        if (coarse.isEmpty)
          (emptyAdcFrame(base), emptyAdcFrame(base), emptyAdcFrame(base),
           emptyAdcFrame(base), emptyCosFrame(base))
        else {
          val withCell = withCluster(base, coarse)
          val books = booksFor(sfDir, base, PqM, PqK, PqRounds)
          val rawEmpty = books.exists(_.isEmpty)
          val resid = residualViewOf(base, coarse)
          val rBooks = residBooksFor(sfDir, resid, PqM, PqK, PqRounds, 8, 2)
          (if (rawEmpty) emptyAdcFrame(base)
           else ivfPqSearchWithBooks(withCell, books, k, queryMod, PqM),
           if (rawEmpty) emptyAdcFrame(base)
           else ivfPqMultiProbeWithBooks(withCell, coarse, books, k, queryMod, PqM, 2),
           if (rawEmpty) emptyAdcFrame(base)
           else ivfPqMultiProbeWithBooks(withCell, coarse, books, k, queryMod, PqM, 4),
           if (rBooks.exists(_.isEmpty)) emptyAdcFrame(base)
           else ivfPqSearchWithBooks(resid, rBooks, k, queryMod, PqM),
           if (rawEmpty) emptyCosFrame(base)
           else ivfPqRerankFrom(base, withCell, books, k, queryMod, PqM, RerankShortlist))
        }
      Map(
        "ann_ivf_trained_topk"    -> ivfTrainedTopKFrom(base, coarse, k, queryMod),
        "ann_ivf_trained_probe2"  -> ivfTrainedMultiProbeTopKFrom(base, coarse, k, queryMod, 2),
        "ann_ivf_trained_probe4"  -> ivfTrainedMultiProbeTopKFrom(base, coarse, k, queryMod, 4),
        "ann_ivfpq_topk"          -> pq1,
        "ann_ivfpq_probe2"        -> pq2,
        "ann_ivfpq_probe4"        -> pq4,
        "ann_ivfpq_residual_topk" -> pqr,
        "ann_ivfpq_rerank"        -> pqrr)
    }

  /** In-gate RECALL REPORT for the whole pruned-index family: per variant,
    * how many of [[bruteForceTopK]]'s true top-k pairs the variant's top-k
    * recovered — hits = |variant ∩ brute| on (q_id, vec_id), n_relevant =
    * brute's row count, recall = hits / n_relevant (recall@k averaged over
    * queries). This is THE number an index consumer tunes nProbe / bands /
    * M against; without it every recall-for-pruning trade in this file is a
    * claim the gate never sees. Integer hit counts make it float-hash-proof;
    * the one division divides the same two BIGINTs on both sides.
    *
    * Scale note: the report itself joins k×Q-row rank frames — trivially
    * small at any corpus scale. The expensive parts are the variants' own
    * searches (each already bounded by its index's pruning); production
    * would measure recall on a SAMPLED query set, exactly what queryMod
    * does. */
  /** The brute-force truth table's (q_id, vec_id) pairs for a (corpus, k,
    * queryMod), held in the model cache like any trained artifact: the
    * exact top-k under a fixed scoring rule is fully deterministic, k×Q
    * rows are driver-trivial, and a production recall harness computes its
    * ground truth ONCE per corpus snapshot — not once per report. A stale
    * or wrong entry cannot hide: the oracle replays the full brute chain
    * independently and would hash-mismatch. */
  private def bruteTruthFor(spark: SparkSession, sfDir: String,
                            k: Int, queryMod: Int): DataFrame = {
    import spark.implicits._
    val pairs = memoModel(s"brute|$sfDir|$k|$queryMod") {
      bruteForceTopK(spark, sfDir, k, queryMod)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    pairs.toDF("q_id", "vec_id")
  }

  /** Every recall variant's (q_id, vec_id) rank pairs for a (corpus, k,
    * queryMod) — cached like the brute truth, and for the same reason:
    * under the (already-cached) deterministic models, each variant's top-k
    * is a pure function of the corpus, and a production recall harness
    * evaluates each index variant ONCE per corpus snapshot, then tunes on
    * the stored rank tables. 11 × k×Q rows — driver-trivial. The first
    * build pays every search inside ONE cached-train-input scope (each
    * collect is eager, so no lazy plan ever escapes the cache and
    * re-scans); the STANDALONE ann_* queries keep measuring live search —
    * only the report consumer amortizes. A stale or wrong entry cannot
    * hide: the oracle replays every variant's full chain independently. */
  private def recallRanksFor(spark: SparkSession, sfDir: String,
                             k: Int, queryMod: Int): Seq[(String, Long, Long)] =
    memoModel(s"recallranks|$sfDir|$k|$queryMod") {
      withCached(trainInput(spark, sfDir)) { _ =>
        val trained = recallTrainedFrames(spark, sfDir, k, queryMod)
        def frame(name: String): DataFrame = name match {
          case "ann_ivf_topk"            => ivfTopK(spark, sfDir, k, queryMod)
          case "ann_lsh_topk"            => lshTopK(spark, sfDir, k, queryMod)
          case "ann_lsh_multiprobe_topk" => lshMultiProbeTopK(spark, sfDir, k, queryMod)
          case other                     => trained(other)
        }
        RecallVariants.flatMap { name =>
          frame(name).select(col("q_id"), col("vec_id")).collect()
            .map(r => (name, r.getLong(0), r.getLong(1))).toSeq
        }
      }
    }

  def annRecall(spark: SparkSession, sfDir: String,
                k: Int = 5, queryMod: Int = 100): DataFrame = {
    import spark.implicits._
    // both sides of the report come from the model cache as LOCAL rows —
    // the ground truth and the variants' rank tables are index artifacts
    // built once per (corpus, k, queryMod); the report itself joins
    // sink-sized tables and never touches the corpus
    val brute = bruteTruthFor(spark, sfDir, k, queryMod)
    val unioned = recallRanksFor(spark, sfDir, k, queryMod)
      .toDF("variant", "q_id", "vec_id")
    val hits = unioned.join(brute, Seq("q_id", "vec_id"))
      .groupBy(col("variant")).agg(count(lit(1)).as("hits"))
    // left join from the static name list: a variant with ZERO hits must
    // still report its zero, not vanish from the gate artifact
    RecallVariants.toDF("variant")
      .join(hits, Seq("variant"), "left")
      .crossJoin(brute.agg(count(lit(1)).as("n_relevant")))
      .select(col("variant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("n_relevant"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_relevant")).as("recall"))
      .orderBy(col("variant"))
  }

  /** IVF-PQ with MULTI-PROBE — the recall knob on the composed index: each
    * query searches its `nProbe` nearest coarse cells
    * ([[ivfTrainedMultiProbeTopK]]'s probe list) but still scores the
    * survivors by ADC lookups over PQ codes. Candidates grow linearly in
    * nProbe and stay code-only; a base vector lives in exactly ONE cell, so
    * probes cannot duplicate pairs. */
  def ivfPqMultiProbeTopK(spark: SparkSession, sfDir: String,
                          k: Int = 5, queryMod: Int = 100,
                          nClusters: Int = 8, coarseRounds: Int = 2,
                          m: Int = PqM, ksub: Int = PqK, rounds: Int = PqRounds,
                          nProbe: Int = 2): DataFrame =
    withCached(trainInput(spark, sfDir)) { base =>
      val coarse = coarseFor(sfDir, base, nClusters, coarseRounds)
      if (coarse.isEmpty) emptyAdcFrame(base)
      else {
        val withCell = withCluster(base, coarse)
        val books = booksFor(sfDir, base, m, ksub, rounds)
        if (books.exists(_.isEmpty)) emptyAdcFrame(base)
        else ivfPqMultiProbeWithBooks(withCell, coarse, books, k, queryMod, m, nProbe)
      }
    }

  /** [[ivfPqMultiProbeTopK]]'s search over already-trained quantizers
    * (see [[ivfPqSearchWithBooks]]). */
  private def ivfPqMultiProbeWithBooks(withCell: DataFrame,
                                       coarse: Seq[(Long, Array[Double])],
                                       books: Seq[Seq[(Long, Array[Double])]],
                                       k: Int, queryMod: Int, m: Int,
                                       nProbe: Int): DataFrame = {
    val sub = EmbeddingDim / m
    val codes = pqCellCodes(withCell, books, m, sub)
    val scored = coarse.map { case (cid, c) =>
      struct((lit(selfDot(c)) - lit(2.0) * dot(col("vec"), typedLit(c))).as("score"),
             lit(cid).as("cid"))
    }
    val q = withCell.filter(col("vec_id") % queryMod === 0)
      .select(Seq(col("vec_id").as("q_id"),
        explode(slice(array_sort(array(scored: _*)), 1, nProbe)).as("p")) ++
        adcLookupTables(books, m, sub): _*)
      .withColumn("q_cluster", col("p.cid")).drop("p")
    adcRankTopK(
      codes.join(broadcast(q),
        col("cluster") === col("q_cluster") && col("vec_id") =!= col("q_id")),
      books, m, k)
  }

  /** Contrastive-training triplet mining: for each query vector, its
    * nearest SAME-label neighbor (the positive) and the highest-cosine
    * DIFFERENT-label vector among its sign-LSH bucket collisions (the HARD
    * negative — random negatives are trivially easy; the informative ones
    * are the near-misses, and bucket collisions are exactly the
    * near-misses). This is the (anchor, positive, negative) generator a
    * contrastive finetuning pipeline feeds on.
    *
    * Scale shape: both candidate sets are pruned BEFORE scoring — the
    * positive side by the label cell (the IVF argument: 1/nlist of the
    * corpus), the negative side by LSH bucket collision (candidates ∝
    * collisions, never all-pairs) — and each side is one broadcast of the
    * query set against a pruned scan, per-query top-1 via the k-row heap
    * window. Queries that lack a same-label neighbor or a cross-label
    * collision drop (inner join): a triplet miner must not invent easy
    * negatives when no hard one exists. */
  def contrastiveTriplets(spark: SparkSession, sfDir: String,
                          queryMod: Int = 100, numPlanes: Int = 6): DataFrame = {
    val planes = hyperplanes(numPlanes, EmbeddingDim)
    val base = baseDf(spark, sfDir)
      .withColumn("bucket", hyperplaneBucket(col("vec"), planes))
    val q = queriesDf(spark, sfDir, queryMod)
      .withColumn("q_bucket", hyperplaneBucket(col("q_vec"), planes))
    val pos = rankTopK(
        base.join(broadcast(q),
          col("label") === col("q_label") && col("vec_id") =!= col("q_id")), 1)
      .select(col("q_id"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = rankTopK(
        base.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("label") =!= col("q_label")), 1)
      .select(col("q_id"), col("vec_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, "q_id")
      .select(col("q_id"), col("pos_id"), col("pos_cos"),
              col("neg_id"), col("neg_cos"))
      .orderBy(col("q_id"))
  }

  /** Embedding-quality gate: cosine of every vector to its OWN label's
    * centroid, low-cosine rows flagged as outliers — the embedding-space
    * analogue of the text quality gate (mislabeled / off-distribution /
    * corrupted vectors score far from their group's center; the same shape
    * drives drift monitoring when `label` is a batch or source id).
    *
    * Scale shape: the centroid build is ONE (label, dim) hash shuffle of
    * fixed-point BIGINT partial sums (map-side combined; order-independent
    * by the same [[KMeansQuantum]] contract as the k-means trainer, so a
    * 1000-executor reduction tree cannot perturb a mean), the assembled
    * centroid table is labels × dim — broadcast back onto the corpus — and
    * scoring is a map-side projection. The corpus is never collected,
    * never self-joined, and shuffles once.
    *
    * Numeric policy: centroid components are exact integer sums divided
    * once at the end; the score reuses [[cosine]]'s sequential-fold dot and
    * association, so the DuckDB oracle hash-matches bit-for-bit, making the
    * `is_outlier` double comparison safe cross-engine. */
  def embeddingOutliers(spark: SparkSession, sfDir: String,
                        threshold: Double = 0.0): DataFrame =
    embeddingOutliersOf(baseDf(spark, sfDir), threshold)

  def embeddingOutliersOf(base: DataFrame, threshold: Double): DataFrame = {
    val cents = base
      .select(col("label"), posexplode(col("vec")).as(Seq("dim", "comp")))
      .select(col("label"), col("dim"),
              floor(col("comp") * KMeansQuantum).cast("long").as("qv"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
              (col("s").cast("double") / col("n") / KMeansQuantum).as("mean"))
      // dim-ordered reassembly: array_sort on (dim, mean) structs orders by
      // dim first, so the transform projects components in index order
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
                     x => x.getField("mean")).as("cvec"))
      .withColumn("norm_c", sqrt(dot(col("cvec"), col("cvec"))))
    base.join(broadcast(cents), "label")
      .withColumn("cos_c", dot(col("vec"), col("cvec")) / (col("norm_v") * col("norm_c")))
      .select(col("vec_id"), col("label").cast("long").as("label"), col("cos_c"),
              (col("cos_c") < lit(threshold)).cast("long").as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** Component quantum for the feature-scaling moments: 2²⁰. Components
    * land in (−1, 1), so a quantized value is < 2²¹ and its square < 2⁴²
    * — exact BIGINT sums to ~2 × 10⁶ rows per dimension; past that the
    * sums widen to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) unchanged. */
  val ScaleQuantum = 1048576.0

  /** Per-DIMENSION distribution of the embedding corpus — the
    * feature-scaling statistics (the sklearn StandardScaler fit): n,
    * mean, population std, min, max per component index. The float → IEEE
    * double cast is exact, so `round(x·2²⁰)` is the benford-established
    * double→integer parity and both row moments are EXACT integer sums;
    * the variance NUMERATOR n·Σq² − (Σq)² stays exact too (DECIMAL(38,0)
    * here, HUGEINT in the oracle — the bollinger discipline), which is
    * what makes it provably ≥ 0: the double-rounded (ss − s²/n)/n tree
    * can land a constant dimension at −ε, where DuckDB's sqrt ERRORS and
    * Spark emits NaN (probed). Doubles appear only in the final
    * correctly-rounded divide/sqrt with the association stated in the
    * oracle. One posexplode + one map-side-combinable groupBy(dim): at
    * 100 TB the shuffle carries dims × partials, never the corpus. */
  def dimStats(spark: SparkSession, sfDir: String): DataFrame =
    dimStatsOf(Tables.embeddings(spark, sfDir))

  def dimStatsOf(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .select(col("dim"),
              round(col("x") * lit(ScaleQuantum)).cast("long").as("q"), col("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
           sum(col("q") * col("q")).as("ss"),
           min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      .withColumn("num",
        col("n").cast("decimal(19,0)") * col("ss").cast("decimal(19,0)") -
        col("s").cast("decimal(19,0)") * col("s").cast("decimal(19,0)"))
      .select(col("dim"), col("n"),
        (col("s").cast("double") / (col("n") * lit(ScaleQuantum).cast("long"))
          .cast("double")).as("mean"),
        (sqrt(col("num").cast("double") /
              (col("n") * col("n")).cast("double")) /
          lit(ScaleQuantum)).as("std"),
        col("min_x"), col("max_x"))
      .orderBy(col("dim"))

  /** FEATURE COVARIANCE + CORRELATION MATRIX over the embedding corpus —
    * the whitening / PCA-prep statistic completing the StandardScaler
    * family ([[dimStats]] owns the diagonal's marginals; this adds the
    * cross-moments). Upper triangle only (i ≤ j — the matrix is
    * symmetric). Numerics are the [[dimStats]] discipline extended to
    * pairs: components quantize once to integer 2²⁰ units, every moment
    * (Σqᵢ, Σqⱼ, Σqᵢqⱼ) is an EXACT integer sum, and the covariance
    * NUMERATOR n·Σqᵢqⱼ − Σqᵢ·Σqⱼ stays exact in decimal — doubles appear
    * only in the final correctly-rounded ops with the association stated
    * in the oracle (cov = num/((n·2²⁰)·(n·2²⁰)), corr = num/√(dᵢ·dⱼ);
    * constant dimensions emit NULL corr explicitly on both engines).
    * Scale: the per-row pair fan-out (dims²/2 = 2080 at 64 dims) feeds a
    * map-side-combinable groupBy, so the shuffle carries 2080 partial
    * tuples per partition — never the corpus; the Σqᵢqⱼ long sums widen
    * to DECIMAL(38,0)/HUGEINT past ~2×10⁶ rows unchanged (the dimStats
    * widening path), and the diagonal joins back as a 64-row broadcast. */
  def covMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val d19 = "decimal(19,0)"
    val q = Tables.embeddings(spark, sfDir)
      .select(transform(col("embedding").cast("array<double>"),
        x => round(x * lit(ScaleQuantum)).cast("long")).as("qv"))
    val pairs = q
      .select(posexplode(col("qv")).as(Seq("dim_i", "qi")), col("qv"))
      .select(col("dim_i"), col("qi"),
              posexplode(col("qv")).as(Seq("dim_j", "qj")))
      .filter(col("dim_j") >= col("dim_i"))
    val m = pairs.groupBy(col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n"), sum(col("qi")).as("si"),
           sum(col("qj")).as("sj"), sum(col("qi") * col("qj")).as("sij"))
      .withColumn("num",
        col("n").cast(d19) * col("sij").cast(d19) -
        col("si").cast(d19) * col("sj").cast(d19))
    val diag = m.filter(col("dim_i") === col("dim_j"))
      .select(col("dim_i").as("dim"), col("num").as("dnum"))
    // n·2²⁰ is an exact long (and < 2⁵³, so its double is exact); the
    // denominator is ONE double multiply of that pinned factor — n²·2⁴⁰
    // as a long would overflow past n ≈ 8×10³
    val nq = (col("n") * lit(ScaleQuantum).cast("long")).cast("double")
    m.join(broadcast(diag.select(col("dim").as("di_dim"), col("dnum").as("dnum_i"))),
           col("dim_i") === col("di_dim"))
      .join(broadcast(diag.select(col("dim").as("dj_dim"), col("dnum").as("dnum_j"))),
            col("dim_j") === col("dj_dim"))
      .select(col("dim_i"), col("dim_j"), col("n"),
        (col("num").cast("double") / (nq * nq)).as("cov"),
        when(col("dnum_i") > 0 && col("dnum_j") > 0,
          col("num").cast("double") /
            sqrt(col("dnum_i").cast("double") * col("dnum_j").cast("double")))
          .as("corr"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  /** Z-SCORE STANDARDIZATION of a deterministic query sample against the
    * corpus [[dimStats]] — the StandardScaler TRANSFORM: the dim-count-
    * sized stats table broadcasts back over the (exploded) sample, so the
    * corpus contributes one aggregate pass and the standardized rows are
    * scan + broadcast-join, zero corpus shuffle. z = (x − mean)/std is a
    * two-op double tree over already-pinned inputs; σ = 0 dimensions
    * (none in the fixture, possible in production) emit z = 0 rather
    * than ±inf. Output stays FLAT (vec_id, dim, z): a reassembled array
    * would hash per-row, this hashes per-component — and downstream
    * consumers (the ANN family) take either shape. */
  /** JOHNSON–LINDENSTRAUSS RANDOM PROJECTION (sign/Achlioptas variant) —
    * the NO-TRAINING dimension reducer completing the embedding family:
    * PQ and IVF need a codebook fit; a ±1 sign projection needs only a
    * hash, making it the first-resort 100 TB sketch (project once on
    * ingest, keep 16 of 64 dims, distances survive to ~1/√k). Everything
    * is DETERMINISTIC and exact: the matrix entry for cell (i,j) is the
    * parity of bit 16 of Knuth's multiplicative hash
    * ((i·16+j)·2654435761 mod 2³²) — stated as the same integer
    * arithmetic in the oracle; inputs quantize to the [[ScaleQuantum]]
    * integer grid so each output coordinate is an ORDER-FREE exact
    * integer sum (the dimStats discipline), floated only by the final
    * constant divide. Plan: ONE codegen'd kernel call per row
    * ([[graft.functions.HashExpressions.JlSignProject]] — the HOF
    * transform-of-aggregates formulation evaluated its nested lambdas
    * interpreted, measured 74 s for 5 k vectors at sf0.1; the kernel does
    * the identical d×k integer loop in ~0.3 s) — no explode, no shuffle
    * beyond the output sort; fan-out is the fixed 16-coordinate array. */
  def jlRandomProjection(spark: SparkSession, sfDir: String,
                         outDims: Int = 16): DataFrame = {
    val q = s"transform(cast(embedding as array<double>), x -> cast(round(x * ${ScaleQuantum.toLong}) as bigint))"
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(q).as("qv"))
      .select(col("vec_id"),
        graft.functions.HashExpressions.jl_sign_project(col("qv"), outDims).as("y"))
      .select(col("vec_id"), posexplode(col("y")).as(Seq("dim", "yq")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("yq"),
              (col("yq").cast("double") / lit(ScaleQuantum)).as("y"))
      .orderBy(col("vec_id"), col("dim"))
  }

  def standardizeSample(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = dimStats(spark, sfDir).select(col("dim"), col("mean"), col("std"))
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"),
              posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("std") === 0.0, lit(0.0))
          .otherwise((col("x") - col("mean")) / col("std")).as("z"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** HYBRID RETRIEVAL via RECIPROCAL RANK FUSION — the RAG-stack reranker
    * that merges a LEXICAL ranking (BM25 over document 0's text as the
    * query, [[TextOps.bm25TopDocsOf]]) with a DENSE ranking (brute cosine
    * against vec 0 — doc_id and vec_id are the same identity space in
    * this corpus) into one list: RRF(d) = Σ_lists 1/(60 + rank_list(d)),
    * the rank-only fusion that needs NO score calibration between the two
    * retrievers (the reason RRF beats score interpolation in practice —
    * BM25 scores and cosines live on incomparable scales). Candidates
    * missing from a list contribute 0 and carry rank sentinel 0 — the cap
    * is oracle-stated, never silent.
    *
    * Numerics: each term is ONE correctly-rounded double division of
    * exact integers and the fusion is a two-term fixed tree — bit-stable
    * cross-engine; ties (e.g. lex-only rank r vs dense-only rank r) break
    * on doc_id. Scale shape: both input rankings are top-`depth` lists
    * (k-sized control plane regardless of corpus size), the fusion is a
    * full outer join of two 100-row frames, and the heavy lifting — BM25's
    * pruned-df aggregation, the dense scan — keeps each retriever's own
    * documented scale shape. */
  def hybridRrfTopK(spark: SparkSession, sfDir: String,
                    depth: Int = 100, k: Int = 20): DataFrame =
    hybridRrfWith(spark, sfDir, depth, k, ivfPruned = false)

  /** [[hybridRrfTopK]] with the dense list from the TRAINED-IVF MULTIPROBE
    * retriever (the query's `nProbe` nearest coarse cells of the shared
    * per-corpus k-means quantizer — [[ivfTrainedMultiProbeTopK]]'s shape,
    * the family's best recall-per-cost point) — the registered scale path
    * for the fusion's dense side (perf-weak #8): RRF consumes ranks, so
    * swapping the retriever changes no fusion arithmetic; probe recall is
    * the stated trade, and the swap is oracle-gated end to end (the oracle
    * replays the full Lloyd chain). Round 16 upgraded this path from the
    * label-cell prune: the label partition has no distance structure, and
    * its fused top-20 Jaccard vs brute measured 0.05 at sf0.01 —
    * chance-level, an unshippable quality trade; the trained probe-4 path
    * is floor-gated in KMeansSpec instead of merely different. */
  def hybridRrfIvfTopK(spark: SparkSession, sfDir: String,
                       depth: Int = 100, k: Int = 20): DataFrame =
    hybridRrfWith(spark, sfDir, depth, k, ivfPruned = true)

  private def hybridRrfWith(spark: SparkSession, sfDir: String,
                            depth: Int, k: Int, ivfPruned: Boolean,
                            nProbe: Int = 4, nClusters: Int = 8,
                            trainRounds: Int = 2): DataFrame = {
    // lexical: BM25 vs doc 0's tokens; doc 0 itself (the query) excluded
    // AFTER scoring so remaining ranks are 1..depth
    val lex = TextOps.bm25TopDocsOf(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        depth + 1)
      .filter(col("doc_id") =!= 0L)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("lex_rank") <= depth)
      .select(col("doc_id"), col("lex_rank"))
    // dense: cosine of candidates against vec 0 — the whole corpus
    // (brute, the exact baseline) or vec 0's nProbe nearest TRAINED
    // coarse cells (the ivfTrainedMultiProbe shape, shared model cache)
    val q0v = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>").as("q_vec"))
      .withColumn("norm_q", sqrt(dot(col("q_vec"), col("q_vec"))))
    val pruned = if (ivfPruned) {
      // training is eager (centroids collect inside withCached), so the
      // returned plan references only the k×dim literals, never the cache
      val cents = withCached(trainInput(spark, sfDir))(b =>
        coarseFor(sfDir, b, nClusters, trainRounds))
      val scored = cents.map { case (cid, c) =>
        struct((lit(selfDot(c)) - lit(2.0) * dot(col("q_vec"), typedLit(c))).as("score"),
               lit(cid).as("cid"))
      }
      val qp = q0v.select(col("q_vec"), col("norm_q"),
          explode(slice(array_sort(array(scored: _*)), 1, nProbe)).as("p"))
        .select(col("q_vec"), col("norm_q"), col("p.cid").as("q_cluster"))
      // a base vector lives in exactly ONE cell: nProbe probes cannot
      // duplicate candidates
      withCluster(baseDf(spark, sfDir), cents)
        .filter(col("vec_id") =!= 0L)
        .join(broadcast(qp), col("cluster") === col("q_cluster"))
    } else {
      baseDf(spark, sfDir).filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q0v))
    }
    // orderBy+limit plans as TakeOrderedAndProject (per-partition k-heaps,
    // no global sort); the rank window then runs on the depth-sized result
    val denseTop = pruned
      .withColumn("cos", dot(col("q_vec"), col("vec")) /
                         (col("norm_q") * col("norm_v")))
      .orderBy(col("cos").desc, col("vec_id")).limit(depth)
    val dense = denseTop
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0L)).as("dense_rank"),
        (when(col("lex_rank").isNull, lit(0.0))
           .otherwise(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double"))) +
         when(col("dense_rank").isNull, lit(0.0))
           .otherwise(lit(1.0) / (lit(60.0) + col("dense_rank").cast("double"))))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** INT8 SCALAR-QUANTIZATION AUDIT per dimension — the storage-shrink
    * decision input for an embedding store (SQ8 cuts a float corpus 4×;
    * this measures what that costs BEFORE committing): per dim, the
    * min/max calibration range, and the reconstruction error of the
    * 255-level affine code round(255·(x−min)/(max−min)), as the exact sum
    * and max of squared errors quantized to integer PICO units — so the
    * per-dim MSE aggregate is an order-free integer fold (the idf-ppm
    * precedent; a double Σ err² would be partition-order-dependent).
    * Constant dimensions (max = min) code to 0 with zero error, stated on
    * both engines.
    *
    * Scale shape: pass 1 is the [[dimStats]] min/max groupBy (64-row
    * result, broadcast back); pass 2 re-scans the corpus, codes, and
    * folds map-side into the 64-row report — two scans total, the
    * calibrate-then-apply shape every quantizer has (production caches
    * the calibration table; here it is a 64-row broadcast either way). */
  def sq8Stats(spark: SparkSession, sfDir: String): DataFrame =
    sq8StatsOf(Tables.embeddings(spark, sfDir))

  def sq8StatsOf(embeddings: DataFrame): DataFrame = {
    val x = embeddings
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
    val mm = x.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val recon = col("mn") +
      col("code").cast("double") * (col("mx") - col("mn")) / lit(255.0)
    x.join(broadcast(mm), "dim")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(round(lit(255.0) * (col("x") - col("mn")) /
                           (col("mx") - col("mn"))).cast("long")))
      .withColumn("e2p",
        round((col("x") - recon) * (col("x") - recon) * lit(1.0e12))
          .cast("long"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).cast("long").as("n"),
           min(col("mn")).as("mn"), min(col("mx")).as("mx"),
           sum(col("e2p")).cast("long").as("sum_e2_pico"),
           max(col("e2p")).as("max_e2_pico"))
      .orderBy(col("dim"))
  }
}
