package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline, over `documents`.
  *
  * All formulas are pure integer/rational arithmetic (see
  * [[graft.functions.TextFunctions]]) so the DuckDB oracle hash-matches
  * bit-for-bit. Each op is a single narrow projection over the scan —
  * column-pruned, no shuffle, embarrassingly parallel at 100 TB.
  */
object TextOps {

  private def documentsFor(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsNarrow(spark, sfDir)

  /** Stopword lists used by quality scoring and language ID. Tiny on purpose:
    * deterministic, embeddable in oracle SQL verbatim. */
  val EnStops: Seq[String] = Seq("the", "a")
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"))

  /** Per-document statistics: token count, BPE-ish token count, average token
    * length, stopword ratio, and a rational quality score in [0,1]:
    * min(n_tokens,100)/100 * (1 - stop_ratio). */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    textStatsOf(documentsFor(spark, sfDir))

  def textStatsOf(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    d.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        stopwordCount(col("text"), EnStops).as("n_stop"))
      .withColumn("avg_token_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(col("n_tokens"), lit(100)).cast("double") / 100.0 * (lit(1.0) - col("stop_ratio")))
      .orderBy(col("doc_id"))
  }

  /** Heuristic language ID from function-word markers: per language, count
    * marker-token occurrences; guess the language with the highest count
    * (ties broken by the fixed language order above), or 'und' when no marker
    * appears at all. */
  def langId(spark: SparkSession, sfDir: String): DataFrame =
    langIdOf(documentsFor(spark, sfDir))

  /** Appends one `score_<lang>` marker-count column per [[LangMarkers]]
    * entry — the ONE copy of the scoring fold shared by [[langIdOf]],
    * [[langMixedFlagOf]], and [[corpusGatesOf]] (a marker-list change must
    * not have to land three times). */
  private def withLangScores(d: DataFrame): DataFrame =
    LangMarkers.foldLeft(d) {
      case (df, (l, words)) =>
        df.withColumn(s"score_$l", stopwordCount(col("text"), words))
    }

  def langIdOf(d: DataFrame): DataFrame = {
    val scored = withLangScores(d.select(col("doc_id"), col("text")))
    val best = LangMarkers.map { case (l, _) => col(s"score_$l") }.reduce((a, b) => greatest(a, b))
    val guess = LangMarkers.reverse.foldLeft(lit("und")) {
      case (acc, (lang, _)) =>
        when(col(s"score_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    scored
      .withColumn("lang_guess", guess)
      .select(col("doc_id") +: LangMarkers.map { case (l, _) => col(s"score_$l") } :+ col("lang_guess"): _*)
      .orderBy(col("doc_id"))
  }

  /** MIXED-LANGUAGE detection on top of [[langIdOf]]'s marker scores: a
    * document whose runner-up language scores at least half the winner is
    * flagged — code-switched or concatenated-source text that a single
    * lang label mislabels either way, which multilingual curation drops or
    * routes separately. The test is integer (top2·2 ≥ top1), so the flag
    * is exact; top1/top2 come from one sorted array over the per-language
    * marker counts. Single projection over the scan — no shuffle beyond
    * the presentation sort. */
  def langMixedFlag(spark: SparkSession, sfDir: String): DataFrame =
    langMixedFlagOf(documentsFor(spark, sfDir))

  def langMixedFlagOf(d: DataFrame): DataFrame = {
    val scored = withLangScores(d.select(col("doc_id"), col("text")))
    val sorted = sort_array(
      array(LangMarkers.map { case (l, _) => col(s"score_$l") }: _*), asc = false)
    scored
      .withColumn("top1", sorted.getItem(0))
      .withColumn("top2", sorted.getItem(1))
      .select(col("doc_id"), col("top1"), col("top2"),
        (col("top2") * 2 >= col("top1") && col("top2") > 0).cast("long").as("is_mixed"))
      .orderBy(col("doc_id"))
  }

  /** Per-source document-LENGTH distribution — the first dashboard any
    * corpus curation effort stands up: a source whose p95 collapses (or
    * whose mean runs away from its median) is truncating or concatenating
    * upstream. One map-side-combinable aggregate; the `percentile` buffer
    * is bounded by distinct lengths per source (the q33 bounded-domain
    * argument — document lengths are small integers), and the
    * interpolation parity with `quantile_cont` is already pinned by q33's
    * gate. */
  def docLengthStats(spark: SparkSession, sfDir: String): DataFrame =
    docLengthStatsOf(Tables.documents(spark, sfDir).select(col("source"), col("text")))

  def docLengthStatsOf(d: DataFrame): DataFrame =
    d.select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
           sum(col("nt")).cast("long").as("n_tokens_total"),
           expr("percentile(nt, array(0.5D, 0.95D))").as("ps"))
      .select(col("source"), col("n_docs"), col("n_tokens_total"),
        col("ps").getItem(0).as("p50_tokens"),
        col("ps").getItem(1).as("p95_tokens"),
        (col("n_tokens_total").cast("double") / col("n_docs")).as("mean_tokens"))
      .orderBy(col("source"))

  /** Document fingerprints: canonical md5 + order-sensitive rolling polynomial
    * hash over token hashes. */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    fingerprintsOf(documentsFor(spark, sfDir))

  def fingerprintsOf(d: DataFrame): DataFrame =
    d.select(
        col("doc_id"),
        fingerprintMd5(col("text")).as("fp_md5"),
        fingerprintPoly(col("text")).as("fp_poly"))
      .orderBy(col("doc_id"))

  /** The composite training-data quality gate: keep documents whose guessed
    * language matches `lang` AND whose quality score clears `minQuality`.
    * Stats and language scores are computed in ONE narrow projection (no
    * join between the two analysis passes), so the whole filter is a single
    * scan — the shape a 100 TB corpus sweep needs. */
  def qualityFilter(spark: SparkSession, sfDir: String,
                    minQuality: Double = 0.5, lang: String = "en"): DataFrame =
    qualityFilterOf(documentsFor(spark, sfDir), minQuality, lang)

  def qualityFilterOf(d: DataFrame,
                      minQuality: Double = 0.5, lang: String = "en"): DataFrame =
    qualityScoredOf(d)
      .filter(col("lang_guess") === lang && col("quality_score") >= minQuality)
      .orderBy(col("doc_id"))

  /** Email pattern in the Java-regex ∩ RE2 common subset (character
    * classes + bounded quantifiers only — no lookaround, no backrefs), so
    * Spark's codegen'd regexp and the DuckDB oracle match the SAME spans. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NNN-NNN-NNNN / NNN.NNN.NNNN phone pattern, same dialect subset. */
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** PII scrub — the redaction stage of a training-data pipeline: per
    * document, count email/phone matches and emit the md5 of the text with
    * every match replaced by a placeholder token. A pure per-row projection
    * (zero shuffle, streams unchanged); the md5 keeps a full redacted
    * corpus out of the gate artifact while still pinning the REPLACEMENT
    * byte-for-byte cross-engine, not just the counts. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    piiScrubOf(documentsFor(spark, sfDir))

  def piiScrubOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhonePattern), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>")).as("clean_md5"))
      .orderBy(col("doc_id"))

  /** [[qualityFilter]] through the REAL micro-batch engine: readStream file
    * source over the documents parquet → the SAME [[qualityScoredOf]]
    * projection + filter → append-mode memory sink, drained synchronously.
    * The gate is stateless (a pure projection), so this needs no state
    * store at all — it is the in-gate proof that the corpus-quality surface
    * lifts to `readStream` unchanged, registered under quality_filter's
    * oracle. */
  def qualityFilterStream(spark: SparkSession, sfDir: String,
                          minQuality: Double = 0.5, lang: String = "en"): DataFrame = {
    StatefulQueries.drainDocuments(spark, sfDir) { stream =>
      qualityScoredOf(stream.select(col("doc_id"), col("text")))
        .filter(col("lang_guess") === lang && col("quality_score") >= minQuality)
    }.orderBy(col("doc_id"))
  }

  /** The unfiltered (doc_id, n_tokens, quality_score, lang_guess) scoring
    * projection [[qualityFilterOf]] gates on — a pruned view of
    * [[corpusGatesOf]] (Catalyst's column pruning drops the repetition
    * expressions this view never references), so the two scorings cannot
    * drift. Still one narrow pass, no shuffle, no ORDER BY. */
  def qualityScoredOf(d: DataFrame): DataFrame =
    corpusGatesOf(d)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("lang_guess"))

  /** EVERY per-document corpus gate in one narrow projection: the
    * language/quality scoring of [[qualityScoredOf]] plus the Gopher-style
    * repetition signals of [[repetitionStats]] — so a pipeline that gates on
    * all of them ([[Pipeline.curationManifest]]) pays ONE column-pruned text
    * scan and zero joins between analysis passes. Unsorted composable core;
    * a pure projection, so it lifts to Structured Streaming unchanged. */
  def corpusGatesOf(d: DataFrame,
                    minDistinctRatio: Double = 0.35,
                    maxTopTokenFrac: Double = 0.15,
                    maxDupBigramFrac: Double = 0.10,
                    extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val toks = tokens(col("text"))
    val scored = withLangScores(
      d.select(col("doc_id"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        tokenHashes(col("text")).as("ths")))
    val best = LangMarkers.map { case (l, _) => col(s"score_$l") }.reduce((a, b) => greatest(a, b))
    val guess = LangMarkers.reverse.foldLeft(lit("und")) {
      case (acc, (l, _)) =>
        when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // EnStops IS the 'en' marker list, so the quality-score stopword count
    // reuses score_en — one expression, and the two scores cannot drift
    scored
      .withColumn("stop_ratio", col("score_en").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(col("n_tokens"), lit(100)).cast("double") / 100.0 * (lit(1.0) - col("stop_ratio")))
      .withColumn("lang_guess", guess)
      .withColumn("bgs", graft.functions.HashExpressions.shingle_hashes(col("ths"), 2))
      .withColumn("n_distinct", size(array_distinct(col("ths"))).cast("long"))
      // count of the modal token: for each distinct token, how often it
      // occurs; max over those (array_distinct is never empty — split("")
      // still yields one token — so array_max cannot see an empty array)
      .withColumn("top_cnt",
        array_max(transform(array_distinct(col("ths")),
          u => size(filter(col("ths"), x => x === u)))).cast("long"))
      .withColumn("n_bigrams", size(col("bgs")).cast("long"))
      .withColumn("n_distinct_bigrams", size(array_distinct(col("bgs"))).cast("long"))
      .withColumn("distinct_ratio", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("top_token_frac", col("top_cnt").cast("double") / col("n_tokens"))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise((col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams")))
      .withColumn("gopher_ok",
        (col("distinct_ratio") >= minDistinctRatio &&
          col("top_token_frac") <= maxTopTokenFrac &&
          col("dup_bigram_frac") <= maxDupBigramFrac).cast("long"))
      // `extra` rides the same projection (text is still in scope here) —
      // e.g. the content fingerprint for the streaming manifest, so one
      // quality formula serves every composition without a re-scan
      .select(Seq(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("quality_score"), col("lang_guess"),
        col("distinct_ratio"), col("top_token_frac"), col("dup_bigram_frac"),
        col("gopher_ok")) ++ extra: _*)
  }

  /** Repetition statistics — the Gopher-style repetition quality signals
    * (Rae et al. 2021 §A1.1-style filters) over token hashes: the distinct-
    * token ratio, the most-frequent-token fraction, and the duplicate-bigram
    * fraction, plus the composite `gopher_ok` gate (1 when all three clear
    * their thresholds). Repetitious documents (templated spam, stuck
    * generation loops) are exactly what these catch in a pretraining corpus.
    *
    * Shape: ONE narrow projection over the scan — the per-row HOFs are
    * O(tokens × distinct) worst-case, which for document-sized rows is noise
    * next to the scan, and NOTHING shuffles: the operator is embarrassingly
    * parallel at any corpus size (the alternative — explode + groupBy(doc,
    * token) — costs a full token-level shuffle for the same answer).
    * Thresholds sit inside the corpus's observed spread (distinct_ratio
    * 0.28..1.0, top_token_frac 0.05..0.30, dup_bigram_frac 0..0.13) so the
    * gate genuinely discriminates. */
  def repetitionStats(spark: SparkSession, sfDir: String,
                      minDistinctRatio: Double = 0.35,
                      maxTopTokenFrac: Double = 0.15,
                      maxDupBigramFrac: Double = 0.10): DataFrame =
    repetitionStatsOf(documentsFor(spark, sfDir),
      minDistinctRatio, maxTopTokenFrac, maxDupBigramFrac)

  def repetitionStatsOf(d: DataFrame,
                        minDistinctRatio: Double = 0.35,
                        maxTopTokenFrac: Double = 0.15,
                        maxDupBigramFrac: Double = 0.10): DataFrame =
    corpusGatesOf(d, minDistinctRatio, maxTopTokenFrac, maxDupBigramFrac)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("distinct_ratio"), col("top_token_frac"), col("dup_bigram_frac"),
        col("gopher_ok"))
      .orderBy(col("doc_id"))

  /** Corpus vocabulary by document frequency: the top-k token hashes by the
    * number of distinct documents containing them — the vocabulary-build /
    * stopword-discovery step of a corpus pipeline (the IDF denominator).
    * Per-row array_distinct dedups (doc, token) without a global distinct
    * shuffle; the global top-k plans as TakeOrdered (per-partition heaps +
    * one driver merge of k rows), never a full sort. */
  def vocabTopK(spark: SparkSession, sfDir: String, k: Int = 50): DataFrame =
    vocabTopKOf(documentsFor(spark, sfDir), k)

  def vocabTopKOf(d: DataFrame, k: Int = 50): DataFrame =
    d.select(explode(array_distinct(tokenHashes(col("text")))).as("th"))
      .groupBy(col("th")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("th").asc)
      .limit(k)

  /** Deterministic stratified train/val/test split — the dataset-assembly
    * step of a training pipeline. Within each (lang, source) stratum,
    * documents are ordered by an integer hash of doc_id (a Knuth
    * multiplicative mix — NOT `rand()`: task retries and speculative
    * execution must not move a document between splits) and dealt
    * round-robin into 10 slots: `trainPer10` → train, `valPer10` → val,
    * rest → test. Every stratum is split in EXACT proportion (±1 doc), which
    * hash-bucket splits only achieve in expectation.
    *
    * One window shuffle on the stratum key. At 100 TB the per-stratum
    * row_number is the cost to examine: strata here are (lang, source)
    * cells, which spread; when exact proportions aren't required, the
    * shuffle-free degenerate form is `(hash % 10)` as the slot — same
    * column contract, zero exchanges. */
  def stratifiedSplit(spark: SparkSession, sfDir: String,
                      trainPer10: Int = 8, valPer10: Int = 1): DataFrame =
    stratifiedSplitOf(
      Tables.spreadIfNarrow(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"), col("source")),
        col("doc_id")),
      trainPer10, valPer10)

  def stratifiedSplitOf(d: DataFrame,
                        trainPer10: Int = 8, valPer10: Int = 1): DataFrame =
    splitAssignOf(d, trainPer10, valPer10).orderBy(col("doc_id"))

  /** GROUP-AWARE leak-free train/val/test split over events — the
    * leakage-prevention complement of [[stratifiedSplit]]: when rows of
    * one entity (here a user) are correlated, a row-level split leaks
    * train information into eval, so the unit of assignment must be the
    * GROUP — every event of a user lands in the same split by
    * construction (the split is a pure function of user_id: the same
    * Knuth multiplicative mix, mod 10 → 8/1/1). The report aggregates
    * per split (event count, distinct users) and carries the AUDIT the
    * guarantee is about: `leaked_users` counts users observed in more
    * than one split — structurally zero, but computed from the assigned
    * rows, not assumed (a refactor that re-keys the hash on event_id
    * would flip it nonzero and fail the oracle hash).
    *
    * Scale shape: assignment is a stateless projection (zero shuffles —
    * the degenerate form [[stratifiedSplit]]'s doc names, correct here
    * because proportions hold only in expectation ACROSS users by
    * design); the report is one user-keyed aggregate and a splits-sized
    * rollup. NULL user ids form one sentinel pseudo-group (P-1) rather
    * than a per-engine null-bucketing hazard. */
  def groupedSplitLeakfree(spark: SparkSession, sfDir: String,
                           trainPer10: Int = 8, valPer10: Int = 1): DataFrame = {
    val P = 1000000007L
    val uid = coalesce(col("user_id"), lit(P - 1))
    val slot = (((uid % P) * lit(2654435761L)) % P) % 10
    val assigned = Tables.events(spark, sfDir)
      .select(col("user_id"),
        when(slot < trainPer10, lit("train"))
          .when(slot < trainPer10 + valPer10, lit("val"))
          .otherwise(lit("test")).as("split"))
    val perUser = assigned
      .groupBy(coalesce(col("user_id"), lit(P - 1)).as("u"))
      .agg(countDistinct(col("split")).as("n_splits"))
    val leaked = perUser.agg(
      sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("leaked_users"))
    assigned
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(coalesce(col("user_id"), lit(P - 1))).as("n_users"))
      .crossJoin(broadcast(leaked))
      .select(col("split"), col("n_events"), col("n_users"), col("leaked_users"))
      .orderBy(col("split"))
  }

  /** TEMPORAL HOLDOUT SPLIT WITH EMBARGO — the leak-free split for
    * time-dependent data (forecasting, next-event prediction): train is
    * everything up to a cut day, test starts `embargoDays` AFTER the cut,
    * and the embargo band between them is EXCLUDED — the guard against
    * boundary leakage (a session or label window straddling the cut would
    * otherwise put near-identical rows on both sides; the financial
    * purged/embargoed CV rule). The cut day is the `trainPer10`-decile
    * element of the SORTED DISTINCT day list — pure integer arithmetic
    * (index = (n_days−1)·trainPer10 div 10), no float quantile, stated
    * identically in the oracle.
    *
    * Scale shape: one map-side-combinable groupBy collapses events to the
    * day domain (control-plane sized — the survivalAtRisk convention);
    * the rank walk and the cut join run on day-cardinality rows with the
    * cut as a 1-row broadcast. Per-day output keeps it dashboard-shaped;
    * assigning raw rows is the same broadcast-join against cut_day. */
  def splitTimeEmbargo(spark: SparkSession, sfDir: String,
                       trainPer10: Int = 8, embargoDays: Long = 2L): DataFrame = {
    val DayUs = 86400000000L
    val days = Tables.events(spark, sfDir)
      .select(expr(s"(ts_ns div 1000) div $DayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val cut = days.select(col("day"),
        (row_number().over(w) - 1).cast("long").as("i"))
      .crossJoin(broadcast(days.agg(count(lit(1)).as("n"))))
      .filter(col("i") === expr(s"(n - 1) * $trainPer10 div 10"))
      .select(col("day").as("cut_day"))
    days.crossJoin(broadcast(cut))
      .select(col("day"), col("n_events"),
        when(col("day") <= col("cut_day"), lit("train"))
          .when(col("day") > col("cut_day") + lit(embargoDays), lit("test"))
          .otherwise(lit("embargo")).as("split"))
      .orderBy(col("day"))
  }

  /** [[stratifiedSplitOf]] without the presentation sort — the composable
    * form ([[Pipeline.curationManifest]] joins it on doc_id). */
  private[operators] def splitAssignOf(d: DataFrame,
                                       trainPer10: Int = 8, valPer10: Int = 1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), col("lang"), col("source"))
      // reduce doc_id mod P BEFORE the multiply: (P-1) * 2654435761 < 2^63,
      // so the product cannot overflow for ANY doc_id — DuckDB errors on
      // BIGINT overflow while Spark wraps, so an overflow would be a
      // cross-engine divergence, not just a wrong shuffle
      .withColumn("h",
        ((col("doc_id") % lit(1000000007L)) * lit(2654435761L)) % lit(1000000007L))
      .withColumn("slot", (row_number().over(w) - 1) % 10)
      .withColumn("split",
        when(col("slot") < trainPer10, lit("train"))
          .when(col("slot") < trainPer10 + valPer10, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("lang"), col("source"), col("split"))
  }

  /** NULL-safe token count: a NULL-text document counts as ZERO tokens,
    * explicitly, on BOTH engines (the oracle coalesces identically). Without
    * pinning, each engine's null propagation decides per expression — sums
    * skip the NULL so boundaries happen to agree, but the emitted n_tokens
    * value itself is engine-dependent; 0 is the semantics a packing/mixture
    * consumer actually wants and the one the gate can hash. */
  private def tokenCount0: org.apache.spark.sql.Column =
    when(col("text").isNull, lit(0L))
      .otherwise(size(tokens(col("text"))).cast("long"))

  /** Corpus composition report: per (lang, source) stratum, document count,
    * token total, and fraction of all tokens — the table a data-mixture
    * design starts from. One group-by shuffle; the global token total is a
    * window over the STRATA table (strata-count-sized — the same tiny-
    * single-partition argument as [[packAssignOf]]'s offsets), never over
    * the corpus. */
  def corpusMix(spark: SparkSession, sfDir: String): DataFrame =
    corpusMixOf(Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"), col("text")))

  def corpusMixOf(d: DataFrame): DataFrame = {
    val strata = d
      .select(col("lang"), col("source"), tokenCount0.as("nt"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    strata
      .withColumn("token_frac",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(wAll).cast("double"))
      .orderBy(col("lang"), col("source"))
  }

  /** Deterministic per-source downsampling — the corpus-MIXING primitive:
    * each source is kept at its rate (absent sources at `defaultRate`) by
    * comparing the document's multiplicative hash against rate×P, so the
    * same document samples the same way on every run, every retry, every
    * partitioning — `rand()` sampling violates exactly that. The hash uses
    * a DIFFERENT odd multiplier than the stratified split's
    * ([[splitAssignOf]]), so sampling and split assignment are
    * decorrelated; both reduce doc_id mod P before multiplying to stay
    * overflow-exact in int64 on both engines. Zero shuffle: a filter
    * projection. */
  def mixSample(spark: SparkSession, sfDir: String,
                rates: Map[String, Double], defaultRate: Double): DataFrame =
    mixSampleOf(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source")), rates, defaultRate)

  def mixSampleOf(d: DataFrame, rates: Map[String, Double],
                  defaultRate: Double): DataFrame = {
    val P = graft.functions.TextFunctions.HashMod
    def thr(r: Double): Long = (r * P).toLong
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(lit(thr(defaultRate)): org.apache.spark.sql.Column) {
        case ((src, r), acc) => when(col("source") === src, lit(thr(r))).otherwise(acc)
      }
    d.withColumn("h", ((col("doc_id") % P) * lit(MixMultiplier)) % P)
      .filter(col("h") < threshold)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Odd multiplier for [[mixSampleOf]]'s hash — 2^32·φ rounded to odd,
    * distinct from the split's 2654435761; (P-1)·MixMultiplier < 2^63. */
  val MixMultiplier = 2654435769L

  /** Mixture-rate design — the step between [[corpusMix]]'s report and
    * [[mixSample]]'s filter: given per-source WEIGHTS, compute the
    * deterministic sampling rates that realize token proportions ∝ weights
    * while keeping the maximum possible data: rate_s = c·w_s / tokens_s
    * with c = min_s(tokens_s / w_s), so the binding source keeps everything
    * (rate 1.0) and every other source downsamples just enough. Output
    * feeds [[mixSampleOf]] directly.
    *
    * One groupBy shuffle; the min is a window over the SOURCE table
    * (source-count-sized), never the corpus — the same tiny-single-
    * partition argument as [[corpusMixOf]]'s total. All arithmetic is one
    * double division per source and an order-free min, so the rates are
    * bit-identical cross-engine. */
  def mixRates(spark: SparkSession, sfDir: String,
               weights: Map[String, Double], defaultWeight: Double): DataFrame =
    mixRatesOf(Tables.documents(spark, sfDir).select(col("source"), col("text")),
      weights, defaultWeight)

  def mixRatesOf(d: DataFrame, weights: Map[String, Double],
                 defaultWeight: Double): DataFrame = {
    require(defaultWeight > 0 && weights.values.forall(_ > 0), "weights must be positive")
    val w = weights.toSeq.sortBy(_._1)
      .foldRight(lit(defaultWeight): org.apache.spark.sql.Column) {
        case ((src, x), acc) => when(col("source") === src, lit(x)).otherwise(acc)
      }
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // zero-token sources (all-NULL text) can't contribute: they take rate 0
    // and are excluded from the binding min — otherwise c would collapse to
    // 0 (zeroing EVERY source) and the empty source would divide 0/0
    d.select(col("source"), tokenCount0.as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("weight", w)
      .withColumn("c", min(when(col("n_tokens") > 0,
        col("n_tokens").cast("double") / col("weight"))).over(wAll))
      .select(col("source"), col("n_tokens"), col("weight"),
        when(col("n_tokens") > 0,
          col("c") * col("weight") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("rate"))
      .orderBy(col("source"))
  }

  /** TEMPERATURE-scaled language mixing (the multilingual-LLM sampling
    * design, e.g. mBERT/XLM-R's exponentiated-share sampling): per language,
    * the empirical token share p_l and its temperature-flattened counterpart
    * q_l = p_l^α / Σ p^α, at α = 1/2 — head languages are damped, tail
    * languages boosted. Because the total-token factor cancels inside the
    * normalized power, q_l = √n_l / Σ √n, so the only irrational step is
    * `sqrt`, which IEEE 754 requires correctly rounded — the one power both
    * engines compute bit-identically (a general `pow` is libm-dependent and
    * would break the hash gate; α = 1/2 is chosen for exactly that reason).
    * The realized sampling rate keeps the maximum possible data:
    * rate_l = boost_l / max boost with boost = q_l / p_l, so the most
    * boosted language keeps everything and the rest downsample toward the
    * flattened mixture — [[mixSampleOf]] consumes these rates directly.
    *
    * Scale shape: one map-side-combined groupBy to LANGUAGE-sized strata;
    * the √-sum denominator is a LEFT-TO-RIGHT fold over the lang-sorted
    * strata array (float addition is non-associative — a plain `sum` over
    * doubles would be partition-order-dependent and unhashable), built by
    * `collect_list` on the strata table only (control-plane-sized, never
    * the corpus); shares/boosts are single divisions of exact long sums. */
  def corpusMixTemperature(spark: SparkSession, sfDir: String): DataFrame =
    corpusMixTemperatureOf(Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")))

  def corpusMixTemperatureOf(d: DataFrame): DataFrame = {
    val strata = d
      .select(col("lang"), tokenCount0.as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("n_tokens"))
    val denTot = strata.agg(
        sort_array(collect_list(struct(col("lang"), col("n_tokens")))).as("xs"),
        sum(col("n_tokens")).as("tot"))
      .select(col("tot"),
        expr("aggregate(xs, CAST(0.0 AS DOUBLE), " +
             "(acc, x) -> acc + sqrt(CAST(x.n_tokens AS DOUBLE)))").as("den"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // a zero-token language (all-NULL text) takes weight/boost/rate 0 and
    // must not poison anyone else: unguarded, its boost is 0.0/0.0 = NaN,
    // and Spark's max() ranks NaN above every double, so ONE empty stratum
    // would turn every language's rate into NaN (the same guard the
    // sibling mixRatesOf carries for its binding min)
    strata.crossJoin(broadcast(denTot))
      .select(col("lang"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot").cast("double")).as("share"),
        when(col("n_tokens") > 0, sqrt(col("n_tokens").cast("double")) / col("den"))
          .otherwise(lit(0.0)).as("temp_weight"))
      .withColumn("boost",
        when(col("n_tokens") > 0, col("temp_weight") / col("share"))
          .otherwise(lit(0.0)))
      .withColumn("rate",
        when(col("n_tokens") > 0, col("boost") / max(col("boost")).over(wAll))
          .otherwise(lit(0.0)))
      .orderBy(col("lang"))
  }

  /** The COMPOSED temperature pipeline: [[corpusMixTemperature]]'s rates —
    * computed from the corpus itself, not a literal map — broadcast back
    * onto the documents as deterministic hash thresholds, emitting the
    * actually-sampled corpus. This is the end-to-end shape a multilingual
    * training run executes: measure shares, flatten at α = 1/2, keep the
    * most-boosted language whole, downsample the rest reproducibly
    * ([[mixSampleOf]]'s multiplicative hash, so retries and speculation
    * cannot change the kept set). The threshold is `floor(rate · P)` of a
    * deterministic double rate — exact on both engines.
    *
    * Scale shape: the rate table is language-count-sized (broadcast); the
    * corpus side is one narrow projection + filter, no shuffle. */
  def mixSampleTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val P = graft.functions.TextFunctions.HashMod
    val thresholds = corpusMixTemperatureOf(docs.select(col("lang"), col("text")))
      .select(col("lang"), floor(col("rate") * lit(P.toDouble)).cast("long").as("thr"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(broadcast(thresholds), "lang")
      .withColumn("h", ((col("doc_id") % P) * lit(MixMultiplier)) % P)
      .filter(col("h") < col("thr"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * packs. A training run concatenates documents into ~`budget`-token
    * sequences; the assignment here is CONTIGUOUS-GREEDY in doc_id order —
    * pack(d) = floor(tokens-before-d / budget) — which is fully
    * deterministic (no partition-order dependence, retries/speculation
    * cannot move a doc between packs) and a fixed point of the common
    * "pack in corpus order" practice.
    *
    * The global running token sum is a TWO-LEVEL distributed prefix sum,
    * all declarative: an in-chunk prefix window partitioned by
    * `doc_id div chunk` (parallel, spillable), chunk totals (one tiny
    * aggregate), and a broadcast join of the chunk-offset table. A naive
    * `Window.orderBy(doc_id)` with no partition key would drag the whole
    * corpus through ONE task — the 100 TB failure mode this shape exists to
    * avoid. `chunk` trades offset-table size against in-chunk parallelism
    * (offset rows = id-range/chunk); the result is chunk-invariant by
    * associativity, which PipelineOpsSpec pins. */
  def packAssign(spark: SparkSession, sfDir: String,
                 budget: Long = 2048L, chunk: Long = 4096L): DataFrame =
    // UNSPREAD projection: the chunk window's own hash exchange is this
    // operator's parallelism (cf. Pipeline's fingerprint branch) — a spread
    // repartition beneath it would be a wasted extra shuffle in BOTH the
    // prefix branch and the offsets branch
    packAssignOf(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      budget, chunk)

  def packAssignOf(d: DataFrame, budget: Long = 2048L,
                   chunk: Long = 4096L): DataFrame = {
    require(budget > 0, s"budget must be positive")
    packStartsOf(d, chunk)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start div $budget").as("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** The two-level distributed prefix sum shared by [[packAssignOf]] and
    * [[packSegmentsOf]]: per document, `start` = total tokens of all prior
    * documents (doc_id order). In-chunk prefix window partitioned by
    * `doc_id div chunk` + broadcast chunk-offset table — see
    * [[packAssign]]'s scale note. */
  private def packStartsOf(d: DataFrame, chunk: Long): DataFrame = {
    require(chunk > 0, s"chunk must be positive")
    val toks = d.select(col("doc_id"), tokenCount0.as("n_tokens"))
      .withColumn("chk", expr(s"doc_id div $chunk"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chk")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val inChunk = toks.withColumn("pre_in",
      coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    // offset of each chunk = total tokens of all prior chunks; the table is
    // chunk-count-sized (tiny), so its prefix window and the join broadcast
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("chk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = toks.groupBy(col("chk")).agg(sum(col("n_tokens")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(wOff), lit(0L)))
      .select(col("chk"), col("off"))
    inChunk.join(broadcast(offsets), "chk")
      .select(col("doc_id"), col("n_tokens"), (col("pre_in") + col("off")).as("start"))
  }

  /** Sequence packing with DOCUMENT SPLITTING — how training packs are
    * actually materialized: the corpus token stream is cut every `budget`
    * tokens, and a document straddling a cut contributes a SEGMENT to each
    * pack it spans. Emits one row per (document, pack) with the
    * doc-relative INCLUSIVE token span [tok_from, tok_to] — the segments of
    * a pack always sum to exactly `budget` tokens (the final partial pack
    * excepted), and each document's segments tile [0, n_tokens-1]
    * contiguously. [[packAssignOf]] is the whole-document assignment
    * (pack of the document's FIRST token, = the first segment's pack here).
    *
    * Same two-level prefix sum as [[packAssignOf]], then a per-document
    * explode over the spanned pack range — output rows = corpus tokens /
    * budget + documents, never quadratic. Zero-token documents occupy no
    * span and emit nothing. */
  def packSegments(spark: SparkSession, sfDir: String,
                   budget: Long = 2048L, chunk: Long = 4096L): DataFrame =
    packSegmentsOf(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      budget, chunk)

  def packSegmentsOf(d: DataFrame, budget: Long = 2048L,
                     chunk: Long = 4096L): DataFrame = {
    require(budget > 0, s"budget must be positive")
    packStartsOf(d, chunk)
      .filter(col("n_tokens") > 0)
      .withColumn("last", col("start") + col("n_tokens") - 1)
      .withColumn("pack_id",
        explode(sequence(expr(s"start div $budget"), expr(s"last div $budget"))))
      .select(col("doc_id"), col("pack_id"),
        (greatest(col("pack_id") * budget, col("start")) - col("start")).as("tok_from"),
        (least((col("pack_id") + 1) * budget - 1, col("last")) - col("start")).as("tok_to"))
      .orderBy(col("doc_id"), col("pack_id"))
  }

  /** Per-document top-k terms by TF-IDF — the featurization step after
    * [[vocabTopK]]'s vocabulary build. The IDF is the LOG-FREE rational
    * `N / df` (score = tf * N / df): `ln` is a libm call whose last ulp
    * differs across engines, while integer multiply + one correctly-rounded
    * double division is bit-identical everywhere — the ranking it induces is
    * the same as log-idf's (log is monotone).
    *
    * Shuffle shape: one groupBy (doc, token) for tf, one groupBy token for
    * df (Zipfian head absorbed by partial aggregation), a join on token
    * (vocab-sized right side — planner's choice of broadcast vs shuffle),
    * and the per-doc top-k window. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    tfidfTopTermsOf(documentsFor(spark, sfDir), k)

  /** FEATURE HASHING (the hashing trick, Weinberger 2009) — the
    * vocabulary-free featurizer a linear model or a quick quality probe
    * runs at corpus scale: token → fixed slot `hash % dim`, per-doc slot
    * counts. The whole point at 100 TB is what it REMOVES — no vocabulary
    * pass, no fit step, no dictionary broadcast, constant output width
    * regardless of corpus; collisions are the accepted trade and the slot
    * space is sized by the caller. One explode + one map-side-combinable
    * groupBy over the codegen'd [[graft.functions]] token hashes (mod P,
    * non-negative by construction, so `%` agrees between engines); the
    * oracle states the identical polynomial hash and slot rule. */
  def featureHashVectors(spark: SparkSession, sfDir: String,
                         dim: Int = 64): DataFrame =
    documentsFor(spark, sfDir)
      .select(col("doc_id"), explode(tokenHashes(col("text"))).as("th"))
      .groupBy(col("doc_id"), (col("th") % dim).as("slot"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("doc_id"), col("slot"))

  def tfidfTopTermsOf(d: DataFrame, k: Int = 3): DataFrame = {
    val docs = d.select(col("doc_id"), col("text"))
    val tf = docs.select(col("doc_id"), explode(tokenHashes(col("text"))).as("th"))
      .groupBy(col("doc_id"), col("th")).agg(count(lit(1)).as("tf"))
    // df derives from tf (one row per (doc, token), so the per-token row
    // count IS the document frequency). Catalyst inlines the tf subplan into
    // both consumers rather than materializing it — the right trade: the
    // duplicated work is one more column-pruned scan + explode, while
    // caching the token-level frame at corpus scale would dwarf it.
    val dfreq = tf.groupBy(col("th")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("th").asc)
    tf.join(dfreq, "th")
      .crossJoin(nDocs)
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("th"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Winnowing fingerprints (the MOSS local-fingerprint scheme): over the
    * word-n-gram shingle-hash sequence, take the minimum hash of every
    * window of `w` consecutive shingles, then the distinct set per document.
    * Guarantees any shared run of >= w+n-1 tokens between two documents
    * yields at least one shared fingerprint, with ~2/(w+1) of the shingles
    * kept — the robust, position-aware alternative to whole-doc hashing.
    * Pure projection + explode: zero shuffles before the final sort. */
  def winnowFingerprints(spark: SparkSession, sfDir: String,
                         n: Int = 3, w: Int = 4): DataFrame =
    winnowFingerprintsOf(documentsFor(spark, sfDir), n, w)

  /** Benchmark decontamination: training documents sharing winnowing
    * fingerprints with an eval/benchmark set. A shared fingerprint witnesses
    * a shared token run of >= w+n-1 tokens ([[winnowFingerprints]]'s
    * guarantee), so `n_shared` counts independent overlapping passages and
    * `overlap` (= n_shared / the eval doc's fingerprint count) is the
    * contamination score an exclusion decision thresholds on.
    *
    * The default eval set is the deterministic `doc_id % evalMod` slice —
    * the stand-in for an external benchmark table; [[contaminationOf]] takes
    * any two (doc_id, text) frames. Train-side fingerprints above
    * `maxFpFreq` are dropped before the join (the hot-shingle cap of
    * [[Dedup.ngramJaccardOf]] applied to fingerprints): a boilerplate
    * passage shared by half the corpus would otherwise fan the join out
    * quadratically while witnessing nothing about specific contamination.
    *
    * Shuffle shape: one window+join co-partitioned on fingerprint, one
    * group-by pair, one (small) eval-size join. */
  def contamination(spark: SparkSession, sfDir: String,
                    evalMod: Int = 50, n: Int = 3, w: Int = 4,
                    minShared: Long = 2L, maxFpFreq: Int = 100): DataFrame = {
    val d = documentsFor(spark, sfDir)
    contaminationOf(d, d.filter(col("doc_id") % evalMod === 0),
      n, w, minShared, maxFpFreq)
  }

  /** [[contamination]] against an EXTERNAL eval frame: the eval set is a
    * DISTINCT derived table — documents with `doc_id % evalMod == 0`, text
    * truncated to its first `headTokens` tokens, ids offset into their own
    * id space — so the gate exercises the genuine two-corpus join path
    * (separate fingerprint extraction per frame, join across frames), not
    * the self-slice shortcut. Every eval doc shares its truncated prefix
    * with its source document, so hits are guaranteed and the overlap
    * scores are non-trivial. */
  def contaminationExternal(spark: SparkSession, sfDir: String,
                            evalMod: Int = 37, headTokens: Int = 30,
                            idOffset: Long = 1000000L): DataFrame = {
    val d = documentsFor(spark, sfDir)
    val ev = d.filter(col("doc_id") % evalMod === 0)
      .select((col("doc_id") + idOffset).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, headTokens)).as("text"))
    contaminationOf(d, ev)
  }

  def contaminationOf(corpus: DataFrame, evalSet: DataFrame,
                      n: Int = 3, w: Int = 4,
                      minShared: Long = 2L, maxFpFreq: Int = 100): DataFrame =
    contaminationJoin(winnowFps(corpus, "train_id", n, w),
      winnowFps(evalSet, "eval_id", n, w), minShared, maxFpFreq)

  /** [[contaminationExternal]] with a BLOOM-FILTER prefilter on the train
    * side — the decontamination shape that actually fits 100 TB: the eval
    * set is benchmark-sized, so its fingerprints fold into a constant-size
    * bit array (built in-plan, collected once as a fixed-size sketch — the
    * same control-plane pattern as the k-means centroids), and the
    * corpus-side fingerprint stream drops every row the bloom rejects
    * BEFORE the frequency window and the join shuffle. Only bloom hits
    * (true matches + the ~(kn/m)^k false-positive sliver) ever shuffle;
    * the full train fingerprint stream stays map-side.
    *
    * The result is EXACT, same oracle as `contamination_external`:
    * - no false negatives: a bloom rejects only fingerprints that are
    *   definitely not in the eval set, and those can't contribute a join row;
    * - false positives are eliminated by the exact fingerprint join that
    *   follows, which only ever produced rows for true matches;
    * - the hot-fingerprint cap is UNCHANGED by prefiltering: the bloom
    *   decision is a pure function of the fingerprint VALUE, so for any
    *   value either every occurrence survives or none does — the
    *   per-surviving-value window count equals the full-corpus count.
    */
  def contaminationBloom(spark: SparkSession, sfDir: String,
                         evalMod: Int = 37, headTokens: Int = 30,
                         idOffset: Long = 1000000L): DataFrame = {
    val d = documentsFor(spark, sfDir)
    val ev = d.filter(col("doc_id") % evalMod === 0)
      .select((col("doc_id") + idOffset).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, headTokens)).as("text"))
    contaminationBloomOf(d, ev)
  }

  def contaminationBloomOf(corpus: DataFrame, evalSet: DataFrame,
                           n: Int = 3, w: Int = 4,
                           minShared: Long = 2L, maxFpFreq: Int = 100,
                           mBits: Int = 1 << 16, kProbes: Int = 3): DataFrame = {
    // the eval fingerprints feed BOTH the bloom build (an action, below) and
    // the exact join, so the winnow kernel runs twice over the eval frame.
    // That recompute is DELIBERATE: the eval set is benchmark-sized by this
    // operator's contract, while pinning it (localCheckpoint loses blocks
    // with decommissioned executors and fails the join unrecoverably;
    // persist with no unpersist point leaks storage per call) trades a tiny
    // recompute for a real operational hazard at scale
    val ev = winnowFps(evalSet, "eval_id", n, w)
    val words = bloomWordsOf(ev.select(col("fp")), mBits, kProbes)
    val tr = winnowFps(corpus, "train_id", n, w)
      .filter(bloomMightContain(words, mBits, kProbes, col("fp")))
    contaminationJoin(tr, ev, minShared, maxFpFreq)
  }

  /** RAW N-GRAM overlap decontamination — the GPT-3/PaLM-style method
    * (flag a training document on ANY shared n-gram with the benchmark,
    * n chosen long enough that chance collisions vanish), where the
    * winnowing family above SAMPLES fingerprints: winnowing guarantees a
    * hit only for runs of >= w+n-1 tokens, while this form is exhaustive
    * at exactly n. Same eval-set construction as [[contaminationExternal]]
    * (head-truncated external slice in its own id space), same hot-shingle
    * cap and join tail ([[contaminationJoin]]) — the per-doc
    * `array_distinct` keeps a shingle repeated inside one document from
    * inflating `n_shared`, so `overlap` = the fraction of the eval doc's
    * DISTINCT n-grams found in the training doc. minShared = 1: one
    * shared 5-gram IS the flag in the raw method; the winnow family owns
    * the >= 2 convention.
    *
    * Scale shape: identical to the winnow join — explode, fingerprint-
    * bucketed join, pair group-by; at 100 TB the bloom prefilter of
    * [[contaminationBloomOf]] composes unchanged (the cap argument there
    * is value-pure and n-gram hashes are values like any other). */
  def contaminationNgram(spark: SparkSession, sfDir: String,
                         evalMod: Int = 37, headTokens: Int = 30,
                         idOffset: Long = 1000000L, n: Int = 5,
                         minShared: Long = 1L, maxFpFreq: Int = 100): DataFrame = {
    val d = documentsFor(spark, sfDir)
    val ev = d.filter(col("doc_id") % evalMod === 0)
      .select((col("doc_id") + idOffset).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, headTokens)).as("text"))
    val tr = d.select(col("doc_id").as("train_id"),
      explode(array_distinct(shingleHashes(col("text"), n))).as("fp"))
    val evf = ev.select(col("doc_id").as("eval_id"),
      explode(array_distinct(shingleHashes(col("text"), n))).as("fp"))
    contaminationJoin(tr, evf, minShared, maxFpFreq)
  }

  /** (doc_id → `idAs`, exploded winnowing fingerprint) stream of a corpus. */
  private def winnowFps(df: DataFrame, idAs: String, n: Int, w: Int): DataFrame =
    df.select(
      col("doc_id").as(idAs),
      explode(graft.functions.HashExpressions.winnow_mins(
        shingleHashes(col("text"), n), w)).as("fp"))

  /** The shared contamination tail: hot-fingerprint cap on the train stream,
    * fingerprint-bucketed train×eval join, per-pair shared count, overlap
    * score against the eval doc's fingerprint total. */
  private def contaminationJoin(tr0: DataFrame, ev: DataFrame,
                                minShared: Long, maxFpFreq: Int): DataFrame = {
    val fpW = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val tr = tr0
      .withColumn("freq", count(lit(1)).over(fpW))
      .filter(col("freq") <= maxFpFreq)
      .drop("freq")
    val evSize = ev.groupBy(col("eval_id")).agg(count(lit(1)).as("n_fp"))
    tr.join(ev, "fp")
      .filter(col("train_id") =!= col("eval_id"))
      .groupBy(col("train_id"), col("eval_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(evSize, "eval_id")
      .select(col("train_id"), col("eval_id"), col("n_shared"),
              (col("n_shared").cast("double") / col("n_fp")).as("overlap"))
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Fold a fingerprint frame into Bloom-filter words: k probe positions per
    * fingerprint (`xxhash64(i, fp) mod m` — the probe side recomputes the
    * identical built-in, so build/probe parity is by construction, not by
    * replicating engine internals), OR-aggregated into 64-bit words. The
    * result is a CONSTANT-size mergeable sketch (m/64 longs regardless of
    * input rows) — collecting it is control plane, not data plane. */
  private def bloomWordsOf(fps: DataFrame, mBits: Int, kProbes: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64")
    val rows = fps.select(explode(array((0 until kProbes).map(i =>
        pmod(xxhash64(lit(i), col("fp")), lit(mBits.toLong))): _*)).as("pos"))
      .distinct()
      .selectExpr("CAST(pos div 64 AS INT) AS wi",
                  "shiftleft(1L, CAST(pmod(pos, 64) AS INT)) AS bit")
      .groupBy(col("wi")).agg(expr("bit_or(bit)").as("word"))
      .collect()
    val words = new Array[Long](mBits / 64)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Codegen-friendly membership probe against literal bloom words: k bit
    * tests over an array literal, ANDed — built-in expressions only, so the
    * filter rides whole-stage codegen right behind the fingerprint kernel. */
  private def bloomMightContain(words: Array[Long], mBits: Int, kProbes: Int,
                                fp: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val wl = lit(words)
    (0 until kProbes).map { i =>
      val pos = pmod(xxhash64(lit(i), fp), lit(mBits.toLong))
      val word = element_at(wl, (shiftright(pos, 6) + lit(1)).cast("int"))
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Corpus-statistics quality scoring (the CCNet-style two-pass shape, on
    * unigram counts instead of an LM): pass 1 aggregates corpus-wide token
    * occurrence counts — ONE token shuffle whose output is vocabulary-sized,
    * not corpus-sized; pass 2 broadcasts the counts back onto the token
    * stream and scores each document map-side: mean corpus frequency of its
    * tokens and the fraction of "rare" tokens (count × 1000 < corpus total —
    * an INTEGER comparison, so the gate is exact). High rare_frac flags
    * gibberish/noise docs; high mean_cnt flags boilerplate.
    *
    * Numeric policy: everything is integer (counts, sums) until the two
    * final divisions of exactly-represented longs — bit-deterministic under
    * any aggregation order, so the DuckDB oracle hash-matches.
    *
    * 100 TB: the broadcast assumes a bounded vocabulary (true after
    * tokenization); the open-vocabulary path is [[tokenRaritySketch]] —
    * REGISTERED as `token_rarity_sketch` — which swaps the exact counts for
    * [[FreqSketch.CMAgg]] point estimates with a constant-size matrix in
    * place of the broadcast. */
  def tokenRarity(spark: SparkSession, sfDir: String): DataFrame =
    tokenRarityOf(documentsFor(spark, sfDir))

  def tokenRarityOf(d: DataFrame): DataFrame = {
    val tk = d.select(col("doc_id"), explode(tokenHashes(col("text"))).as("th"))
    val counts = tk.groupBy(col("th")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("total"))
    tk.join(broadcast(counts.crossJoin(broadcast(total))), "th")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
           sum(col("cnt")).cast("long").as("sum_cnt"),
           sum(when(col("cnt") * lit(1000L) < col("total"), 1L)
             .otherwise(0L)).cast("long").as("rare_n"))
      .select(col("doc_id"), col("n_tokens"), col("sum_cnt"), col("rare_n"),
              (col("sum_cnt").cast("double") / col("n_tokens")).as("mean_cnt"),
              (col("rare_n").cast("double") / col("n_tokens")).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  /** [[tokenRarityOf]]'s OPEN-VOCABULARY form — the fallback the exact
    * variant's doc comment promises: corpus-wide token counts come from one
    * Count–Min pass ([[FreqSketch.CMAgg]] — a constant d×w counter matrix,
    * folded map-side, merged by elementwise sum) instead of an exact
    * `groupBy(th)` whose broadcast is vocabulary-sized. Pass 2 probes the
    * FROZEN matrix per token through the codegen'd
    * [[graft.functions.HashExpressions.CmEstimate]] expression — d array
    * reads per token, no join at all (the exact form's broadcast hash join
    * disappears; the "broadcast" is now w·d longs riding the expression).
    *
    * At 100 TB this is the shape that survives open vocabularies (URLs,
    * numerals): state is w·d longs regardless of distinct-token count.
    * Estimates never UNDERcount (CM guarantee), so `rare_n` can only lose
    * tokens whose estimate was inflated past the threshold by collisions —
    * and at the default width the test vocabulary (31 tokens) is
    * collision-free, making the sketch form EXACT and registrable under the
    * same oracle as `token_rarity` (the MG-family precedent). */
  def tokenRaritySketch(spark: SparkSession, sfDir: String): DataFrame =
    tokenRaritySketchOf(documentsFor(spark, sfDir))

  def tokenRaritySketchOf(d: DataFrame, w: Int = 1024, dRows: Int = 4): DataFrame = {
    import d.sparkSession.implicits._
    val agg = graft.operators.FreqSketch.CMAgg(w, dRows)
    val tk = d.select(col("doc_id"), explode(tokenHashes(col("text"))).as("th"))
    // pass 1: one corpus fold into the constant-size matrix (no shuffle —
    // partials merge map-side; n rides along as the exact total)
    val cm = tk.select(col("th")).as[Long].select(agg.toColumn).head()
    val est = graft.functions.HashExpressions.cm_estimate(col("th"), cm.cells, w, dRows)
    // pass 2: score map-side off the frozen matrix — same aggregate shape
    // as the exact form, with `cnt` replaced by the point estimate and the
    // exact total carried as a literal
    tk.select(col("doc_id"), est.as("cnt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
           sum(col("cnt")).cast("long").as("sum_cnt"),
           sum(when(col("cnt") * lit(1000L) < lit(cm.n), 1L)
             .otherwise(0L)).cast("long").as("rare_n"))
      .select(col("doc_id"), col("n_tokens"), col("sum_cnt"), col("rare_n"),
              (col("sum_cnt").cast("double") / col("n_tokens")).as("mean_cnt"),
              (col("rare_n").cast("double") / col("n_tokens")).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  /** Retrieval-based data selection: rank the corpus against a seed-query
    * term set (the distinct tokens of doc 0 — deterministic and derived,
    * like the contamination eval set) with a BM25-shaped score. The idf is
    * the RATIONAL core `(N - df + 0.5)/(df + 0.5)` — deliberately log-free,
    * like [[tfidfTopTerms]]'s rational tf-idf, because `ln` is not
    * bit-specified across engines and would break the hash gate; the
    * ranking it induces is the same (the log is monotone). k1 = 1.2,
    * b = 0.75 (the standard constants, as literals).
    *
    * Scale shape: tf AND df are computed AFTER the broadcast query-term
    * semi-join prunes the token stream (scores only exist for query terms;
    * df(th) is the group count of tf, one row per doc containing th) — no
    * aggregate in the plan is keyed on the full vocabulary; doc length and
    * corpus stats are one doc-bounded aggregate each; per-doc summation is
    * DECIMAL-exact so the reduction-tree order never perturbs the ranking. */
  def bm25TopDocs(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame =
    bm25TopDocsOf(documentsFor(spark, sfDir), k)

  def bm25TopDocsOf(d: DataFrame, k: Int = 20): DataFrame = {
    val tk = d.select(col("doc_id"), explode(tokenHashes(col("text"))).as("th"))
    val dl = tk.groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
                       sum(col("dl")).cast("long").as("total_tokens"))
    val q = d.filter(col("doc_id") === 0L)
      .select(explode(array_distinct(tokenHashes(col("text")))).as("th"))
      .distinct()
    // Prune FIRST, aggregate second: the broadcast query-term semi-join cuts
    // the token stream to query-term occurrences before any shuffle, and
    // BOTH tf and df derive from that pruned stream — df(th) = number of
    // (doc, th) groups = docs containing th, identical to the distinct-doc
    // count over the full stream because pruning on th drops no (doc, th)
    // pair for a query term. The earlier form aggregated df over the FULL
    // vocabulary and filtered after: Catalyst cannot push a semi-join below
    // a distinct+aggregate, so at 100 TB that was a corpus-sized shuffle
    // feeding a filter that keeps a few hundred rows. The tf exchange is
    // shared (ReusedExchange) between the probe side and the df branch, so
    // the corpus is tokenized once for tf+df. PlanSpec pins both properties.
    val tf = tk.join(broadcast(q), "th")
      .groupBy(col("doc_id"), col("th")).agg(count(lit(1)).cast("long").as("tf"))
    val dfq = tf.groupBy(col("th")).agg(count(lit(1)).cast("long").as("df"))
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") /
            (col("total_tokens").cast("double") / col("n_docs").cast("double")))))
    tf.join(broadcast(dfq), "th")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * tfn).cast("decimal(28,12)").as("w"))
      .groupBy(col("doc_id")).agg(sum(col("w")).as("wsum"))
      .select(col("doc_id"), col("wsum").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Statistical language-model quality scoring (the CCNet/KenLM shape,
    * made oracle-exact): per document, the mean CONDITIONAL frequency of
    * its adjacent token pairs — `B(t1,t2)/C(t1)` in parts-per-million,
    * where B is the corpus bigram count and C the bigram-left context
    * count. Word salad scores low (common tokens in rare sequences — the
    * signal unigram rarity can't see); boilerplate scores high. The
    * division is INTEGER (ppm quantization), so the score is exact and
    * aggregation-order-free, and the mean is one division of exact longs —
    * the same numeric policy as token_rarity.
    *
    * Scale shape: pass 1 folds the pair stream into TWO constant-size
    * Count–Min matrices (unigram context + bigram, the open-vocabulary
    * answer — bigram vocabularies are quadratically worse than unigram, so
    * the exact-counts broadcast of token_rarity is off the table from the
    * start); pass 2 probes both frozen matrices per pair through the
    * codegen'd [[graft.functions.HashExpressions.CmEstimate]] — NO join
    * anywhere, one doc-keyed aggregation. The bigram key `t1·P + t2` is
    * injective (token hashes live in [0, P), P² < 2⁶³), so at the test
    * vocabulary the estimates are collision-free and the sketch form
    * registers under the exact-count oracle (the MG-family precedent). */
  def lmBigramScoreSketch(spark: SparkSession, sfDir: String): DataFrame =
    lmBigramScoreSketchOf(documentsFor(spark, sfDir))

  def lmBigramScoreSketchOf(d: DataFrame, wUni: Int = 4096, wBi: Int = 65536,
                            dRows: Int = 4): DataFrame = {
    import d.sparkSession.implicits._
    val P = graft.functions.TextFunctions.HashMod
    val pairs = d
      .select(col("doc_id"), tokenHashes(col("text")).as("ths"))
      .filter(size(col("ths")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ths)-2), i -> struct(ths[i] AS t1, ths[i+1] AS t2))")).as("p"))
      .select(col("doc_id"), col("p.t1").as("t1"), col("p.t2").as("t2"))
    val bk = col("t1") * lit(P) + col("t2")
    val uniAgg = graft.operators.FreqSketch.CMAgg(wUni, dRows)
    val biAgg = graft.operators.FreqSketch.CMAgg(wBi, dRows)
    // pass 1: two constant-size folds (control-plane results, like the
    // k-means centroids — the corpus never reaches the driver)
    val uni = pairs.select(col("t1")).as[Long].select(uniAgg.toColumn).head()
    val bi = pairs.select(bk.as("bk")).as[Long].select(biAgg.toColumn).head()
    val uEst = graft.functions.HashExpressions.cm_estimate(col("t1"), uni.cells, wUni, dRows)
    val bEst = graft.functions.HashExpressions.cm_estimate(bk, bi.cells, wBi, dRows)
    pairs
      .select(col("doc_id"), (bEst * lit(1000000L)).as("num"), uEst.as("den"))
      .select(col("doc_id"), expr("num div den").as("ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ppm")).cast("long").as("ppm_sum"))
      .select(col("doc_id"), col("n_pairs"), col("ppm_sum"),
              (col("ppm_sum").cast("double") / col("n_pairs")).as("mean_cond_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Corpus collocation mining: the top-k adjacent token pairs by pointwise
    * mutual information, the classic phrase-detection pass (word2vec's
    * phrase pre-join, Gensim `Phrases`) that decides which bigrams become
    * single vocabulary units before tokenizer training. The score is the
    * LOG-FREE rational `p(ab) / (p(a)·p(b))` = `bc·N²tok / (Npair·uc₁·uc₂)`
    * — `ln` is monotone, so the induced ranking is exactly PMI's (the
    * [[tfidfTopTermsOf]] precedent), and the value is three
    * correctly-rounded double ops over exact longs, bit-identical in any
    * engine. `minCount` (the standard PMI reliability floor) is applied to
    * the bigram counts BEFORE the unigram joins, so the joined stream is
    * the frequent-bigram table, not the quadratically-larger raw one.
    *
    * Shuffle shape: one explode+groupBy for unigrams (vocab-sized result),
    * one pair-explode+groupBy for bigrams (partial aggregation absorbs the
    * Zipfian head), two token-keyed joins of the count-pruned bigram table
    * against the unigram table (vocab-bounded — planner picks broadcast vs
    * shuffle), and a final global top-k. Both corpus totals fold out of
    * one extra pass over the per-doc lengths (a 1-row broadcast); the
    * three passes share one materialized scan spread via AQE exchange
    * reuse. */
  def pmiBigrams(spark: SparkSession, sfDir: String,
                 minCount: Long = 5L, k: Int = 50): DataFrame =
    pmiBigramsOf(documentsFor(spark, sfDir), minCount, k)

  def pmiBigramsOf(d: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    val t = d.select(tokenHashes(col("text")).as("ths"))
    val uni = t.select(explode(col("ths")).as("th"))
      .groupBy(col("th")).agg(count(lit(1)).cast("long").as("uc"))
    val bi = t.filter(size(col("ths")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ths)-2), i -> struct(ths[i] AS t1, ths[i+1] AS t2))")).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).cast("long").as("bc"))
    // both totals fold out of ONE pass over the per-doc lengths (Σ len and
    // Σ max(len-1, 0) ARE the unigram and adjacent-pair totals) — deriving
    // them from the uni/bi aggregates would inline each aggregate subplan a
    // second time, i.e. two more corpus scans for two scalars
    val totals = t.agg(
      sum(size(col("ths")).cast("long")).as("n_tok"),
      sum(greatest(size(col("ths")) - 1, lit(0)).cast("long")).as("n_pair"))
    bi.filter(col("bc") >= minCount)
      .join(uni.select(col("th").as("t1"), col("uc").as("uc1")), "t1")
      .join(uni.select(col("th").as("t2"), col("uc").as("uc2")), "t2")
      .crossJoin(broadcast(totals))
      .withColumn("score",
        col("bc").cast("double") * col("n_tok") * col("n_tok") /
          (col("n_pair").cast("double") * col("uc1") * col("uc2")))
      .select(col("t1"), col("t2"), col("bc"), col("uc1"), col("uc2"), col("score"))
      .orderBy(col("score").desc, col("t1"), col("t2")).limit(k)
  }

  /** Sparse-vector document similarity: the top-k most-similar document
    * PAIRS by tf-idf cosine, computed through a DF-CAPPED inverted index —
    * the sparse/lexical complement to the dense-embedding ANN family
    * ([[Similarity]]): near-dup detection that needs no embedding model.
    * The indexed term is the word-3-GRAM SHINGLE hash, not the unigram:
    * shingles are the unit that witnesses shared phrasing (the
    * [[Dedup.ngramJaccardOf]] unit), and their combinatorial vocabulary
    * keeps the vector space sparse even over a small word vocabulary.
    *
    * The index keeps only terms with `2 <= df <= dfCap`: df=1 terms cannot
    * co-occur (dead weight), and a term in more than `dfCap` documents is
    * boilerplate vocabulary that would fan the posting-list self-join out
    * by df² while contributing the least idf mass — the same
    * cap-before-pair-generation rule as [[Dedup]]'s LSH bucket cap, and
    * what makes the join output linear in corpus size (≤ dfCap·|vocab|
    * pairs) instead of quadratic. Weights and norms live in the SAME
    * capped space on both sides of the cosine, so the metric is exact over
    * the pruned vocabulary.
    *
    * Numerics: the idf is QUANTIZED to the integer `(N·1000) div df` (the
    * ppm-quantization rule of [[lmBigramScoreSketch]]), so every weight
    * `tf·idfq` is an exact long and dot products / squared norms are
    * order-free integer sums (DECIMAL(19,0)×DECIMAL(19,0) products — a
    * multiplication that can never round or wrap); doubles appear
    * only at the final sqrt/divide, which are single correctly-rounded
    * ops. A DECIMAL(28,12) float-product sum was tried first and is
    * UNSOUND here: for products above ~1e5 the 12th fractional digit lies
    * beyond double's 17 significant digits, where Spark's shortest-string
    * BigDecimal cast and an exact-binary-expansion cast legitimately
    * disagree — quantization removes the ambiguity instead of hiding it.
    *
    * Shuffle shape: tf groupBy (doc,term), df groupBy term, one term-keyed
    * join to weight, one doc-keyed groupBy for norms, the capped
    * term-keyed self-join, one pair groupBy, and a global top-k. */
  def docSimSparseTopK(spark: SparkSession, sfDir: String,
                       dfCap: Long = DocSimDfCap, k: Int = 20): DataFrame =
    docSimSparseTopKOf(documentsFor(spark, sfDir), dfCap, k)

  /** The inverted-index df cap — ONE definition shared by
    * [[docSimSparseTopK]] and its headroom observable [[docSimDfStats]]
    * (and interpolated into both oracles), the
    * `Analytics.MaxFuzzyBucketSize` convention. */
  private[graft] val DocSimDfCap = 100L

  /** Per-(doc, shingle) term frequency over word-3-gram shingle hashes —
    * the doc-sim family's term space, shared by the similarity join and
    * its df-stats observable so the instrumented frame IS the indexed
    * frame (the collapsedPartNames convention). */
  private[graft] def docTermTf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"))
      .select(col("doc_id"), explode(shingleHashes(col("text"), 3)).as("th"))
      .groupBy(col("doc_id"), col("th")).agg(count(lit(1)).cast("long").as("tf"))

  def docSimSparseTopKOf(d: DataFrame, dfCap: Long = DocSimDfCap,
                         k: Int = 20): DataFrame = {
    // the (doc, shingle, tf) table — the shingle explode + first groupBy,
    // the expensive half of the index build — is materialized ONCE (eager
    // localCheckpoint) and every consumer (df table, weight table on BOTH
    // self-join sides, norms) reads the checkpointed blocks; left lazy,
    // the join null-filters pushed into individual branches made the
    // sibling tf subtrees non-canonical, so AQE stage reuse could not
    // collapse every re-evaluation (measured r19-opt: 2.553 → 2.233 s
    // interleaved at sf0.1, ProbeDocSim; a .cache() was tried first and
    // LOST — columnar encoding of the corpus-sized frame costs more than
    // the recompute it saves). The k-row result is detached eagerly so
    // the tf blocks can be released before returning; k is a constant of
    // the query, never corpus-sized.
    val tf = docTermTf(d).localCheckpoint(true)
    try docSimTopKFrom(d, tf, dfCap, k).localCheckpoint(true)
    finally
      org.apache.spark.sql.graftbridge.ColumnBridge.checkpointRdd(tf)
        .foreach(_.unpersist(blocking = false))
  }

  /** The similarity pipeline DOWNSTREAM of the materialized (doc, th, tf)
    * table — split out so PlanSpec can pin the executed shape (exchange
    * reuse across the self-join sides, top-k as TakeOrderedAndProject, no
    * cartesian) on exactly the plan the operator runs. */
  private[graft] def docSimTopKFrom(d: DataFrame, tf: DataFrame,
                                    dfCap: Long, k: Int): DataFrame = {
    val docs = d.select(col("doc_id"), col("text"))
    val dfreq = tf.groupBy(col("th")).agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
    val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    val tfw = tf.join(dfreq, "th").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("th"),
        (col("tf") * expr("(n_docs * 1000L) div df")).as("w"))
    // the squares/products multiply as DECIMAL(19,0) — (19,0)×(19,0) →
    // (38,0) can never round, whereas a Long×Long product would WRAP
    // silently (ANSI off) once w ≥ ~3e9 while DuckDB errors: divergent
    // engines and a wrong top-k with no signal
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

  /** DF-HEADROOM OBSERVABILITY for [[docSimSparseTopK]] (the
    * `fuzzyBucketStats` mold — r17's one scaling flag was adjudicated
    * with a one-off pair-count measurement; this makes that measurement a
    * standing oracle-gated number): over the SAME word-3-gram term space
    * the similarity join indexes ([[docTermTf]], shared code), the df
    * distribution vs [[DocSimDfCap]], the candidate-pair bound the
    * indexed terms generate (Σ df·(df−1)/2 — exactly the self-join's
    * output rows), and what the cap drops. One narrow two-stage aggregate
    * — strictly cheaper than the join it instruments. At 100 TB a
    * candidate_pairs spike relative to corpus growth is the df-regime
    * transient (pairs grow quadratically in df until df hits the cap,
    * then linearly) made visible BEFORE the join runs.
    *
    * Numerics: per-term df·(df−1) multiplies as DECIMAL(19,0) —
    * (19,0)×(19,0)→(38,0) can never round or wrap, while a Long product
    * wraps silently past df ≈ 3e9 (a boilerplate shingle at corpus scale)
    * where DuckDB errors; the sum is halved only at the end (every
    * df·(df−1) is even, so the integral halving is exact). */
  def docSimDfStats(spark: SparkSession, sfDir: String,
                    dfCap: Long = DocSimDfCap): DataFrame =
    docSimDfStatsOf(documentsFor(spark, sfDir), dfCap)

  def docSimDfStatsOf(d: DataFrame, dfCap: Long = DocSimDfCap): DataFrame =
    capHeadroomStatsOf(
      docTermTf(d).groupBy(col("th")).agg(count(lit(1)).cast("long").as("f")),
      dfCap,
      Seq("n_terms", "max_df", "n_terms_df1", "n_terms_indexed",
          "n_dropped_terms", "candidate_pairs", "dropped_pairs"))

  /** The shared cap-headroom rollup over a (key, `f` frequency) table —
    * ONE definition of the observables' numerics (DECIMAL(19,0)² products
    * that can never round or wrap, the exact even-product halving, the
    * empty-input coalesces) for BOTH [[docSimDfStatsOf]] (term df vs
    * [[DocSimDfCap]]) and [[Dedup.ngramShingleStatsOf]] (shingle freq vs
    * `Dedup.MaxShingleFreq`); `names` labels the seven output columns:
    * n_keys, max_f, n_f1, n_indexed, n_dropped, candidate_pairs,
    * dropped_pairs. */
  private[graft] def capHeadroomStatsOf(freqs: DataFrame, cap: Long,
                                        names: Seq[String]): DataFrame = {
    require(names.size == 7, s"expected 7 output names, got $names")
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val zero38 = lit(0).cast("decimal(38,0)")
    val pr = (d19(col("f")) * d19(col("f") - lit(1L))).cast("decimal(38,0)")
    val indexed = col("f").between(lit(2L), lit(cap))
    freqs
      .agg(
        count(lit(1)).cast("long").as(names(0)),
        coalesce(max(col("f")), lit(0L)).as(names(1)),
        coalesce(sum(when(col("f") === 1L, 1L).otherwise(0L)), lit(0L))
          .cast("long").as(names(2)),
        coalesce(sum(when(indexed, 1L).otherwise(0L)), lit(0L))
          .cast("long").as(names(3)),
        coalesce(sum(when(col("f") > cap, 1L).otherwise(0L)), lit(0L))
          .cast("long").as(names(4)),
        coalesce(sum(when(indexed, pr).otherwise(zero38)), zero38).as("cp2"),
        coalesce(sum(when(col("f") > cap, pr).otherwise(zero38)), zero38)
          .as("dp2"))
      .select(col(names(0)), col(names(1)), col(names(2)), col(names(3)),
        col(names(4)),
        expr("CAST(cp2 div 2 AS BIGINT)").as(names(5)),
        expr("CAST(dp2 div 2 AS BIGINT)").as(names(6)))
  }

  /** Lexical DIVERSITY per corpus source — the curation dashboard numbers
    * that catch a source collapsing into boilerplate: type-token ratio
    * (V/N) and Simpson diversity (1 − Σc²/N², the probability two random
    * tokens differ). Simpson is the ENTROPY stand-in chosen deliberately:
    * Shannon's Σp·ln p needs a libm `ln` whose last ulp varies across
    * engines, while Simpson is exact longs until two final
    * correctly-rounded double ops — the same monotone-surrogate move as
    * tfidf's log-free idf (both indices rank sources identically for the
    * decisions this feeds).
    *
    * Scale shape: two map-side-combinable groupBys — (source, token)
    * counts, then per-source moments; result is source-cardinality. The
    * Zipfian token head is absorbed by partial aggregation exactly as in
    * [[vocabTopK]]. */
  def tokenDiversityBySource(spark: SparkSession, sfDir: String): DataFrame =
    tokenDiversityBySourceOf(
      Tables.documents(spark, sfDir).select(col("source"), col("text")))

  def tokenDiversityBySourceOf(d: DataFrame): DataFrame =
    d.select(col("source"), explode(tokenHashes(col("text"))).as("th"))
      .groupBy(col("source"), col("th")).agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("source")).agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_distinct"),
        // c² as DECIMAL(19,0)² — a Long square wraps silently past
        // c ≥ ~3e9 (a stopword at corpus scale) where DuckDB errors
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("long").as("sumsq"))
      .select(col("source"), col("n_tokens"), col("n_distinct"), col("sumsq"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("ttr"),
        (lit(1.0) - col("sumsq").cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens"))).as("simpson"))
      .orderBy(col("source"))

  def winnowFingerprintsOf(d: DataFrame, n: Int = 3, w: Int = 4): DataFrame = {
    // native one-pass deque kernel (codegen'd) — the HOF formulation
    // (array_distinct over per-window array_min slices) is interpreted and
    // O(n·w); short docs (< w shingles) yield an empty array, which explode
    // drops, matching the oracle's empty range()
    val wins = graft.functions.HashExpressions.winnow_mins(
      shingleHashes(col("text"), n), w)
    d.select(col("doc_id"), explode(wins).as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  /** LM-score bucket width in ppm: 1,000 ppm per bucket (fixture scores
    * concentrate in 30k–49k mean ppm — probed; 1k width spreads them over
    * ~20 informative buckets). */
  val PplBucketPpm = 1000L

  /** PERPLEXITY-FILTER CALIBRATION HISTOGRAM: document counts and token
    * mass per LM-score bucket — the table a CCNet-style quality filter's
    * threshold is actually chosen from (pick the cut, read off exactly
    * how many docs/tokens survive). Composes [[lmBigramScoreSketch]]:
    * the bucket id is PURE INTEGER arithmetic ((ppm_sum div n_pairs) div
    * [[PplBucketPpm]] — two floor divisions of exact longs, no float boundary to
    * disagree on), and the per-bucket extremes of the mean-ppm double are
    * element SELECTION. Scale: the per-doc score table is doc-count-
    * sized; the histogram collapses it to ≤ 21 buckets map-side. */
  def pplBucketStats(spark: SparkSession, sfDir: String): DataFrame =
    lmBigramScoreSketch(spark, sfDir)
      .withColumn("bucket", expr(s"(ppm_sum div n_pairs) div $PplBucketPpm"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_pairs")).cast("long").as("sum_pairs"),
           min(col("mean_cond_ppm")).as("min_mean_ppm"),
           max(col("mean_cond_ppm")).as("max_mean_ppm"))
      .orderBy(col("bucket"))

  /** Minimum corpus-wide occurrences for a token to enter the drift test —
    * bounds the χ² table and keeps low-count cells (where the χ²
    * approximation is invalid anyway) out. */
  val VocabDriftMinCount = 100L

  /** VOCABULARY DRIFT DETECTION: χ² independence test of token × corpus
    * half — the data-drift monitor a pipeline runs between ingestion
    * generations (a vocabulary whose distribution shifts signals source
    * drift, scraper changes, or contamination upstream of any model).
    * Halves split by doc_id parity (the deterministic stand-in for "old
    * vs new generation"); cells are DENSE over the kept tokens (a token
    * absent from one half contributes its full expected count — the
    * sparse join would silently drop exactly the most drifted cells);
    * the ≥ [[VocabDriftMinCount]] prune is an exact integer test applied
    * BEFORE expected counts. Numerics: exact long counts/marginals,
    * expected and contribution as the chi2_type_weekday fixed double
    * trees, and the table statistic as the INTEGER-MICRO sum (the
    * doc_sim idf-ppm precedent): each cell's contribution quantizes to
    * `floor(contrib·10⁶)` — floor of a double is exact selection with no
    * tie semantics to disagree on — capped at 10¹⁵ micros on BOTH
    * engines (exact in long and double; see the inline note) and the
    * micros sum as DECIMAL(38,0),
    * which is order-free, so no vocab-sized ordered fold (and no
    * single-row collect_list array) exists anywhere in the plan. The
    * reported chi2 re-scales the exact micro total with one
    * correctly-rounded divide. Scale: token counts are map-side
    * combinable; the kept table is frequent-vocabulary-sized and the
    * statistic is a plain partial-aggregable sum. */
  def vocabDriftChi2(spark: SparkSession, sfDir: String): DataFrame = {
    val cells0 = documentsFor(spark, sfDir)
      .select((col("doc_id") % 2).as("half"),
              explode(tokenHashes(col("text"))).as("th"))
      .groupBy(col("th"), col("half")).agg(count(lit(1)).as("obs0"))
    val keep = cells0.groupBy(col("th")).agg(sum(col("obs0")).as("row_tot"))
      .filter(col("row_tot") >= VocabDriftMinCount)
    val halves = cells0.sparkSession.range(2).select(col("id").as("half"))
    val cells = keep.crossJoin(broadcast(halves))
      .join(cells0, Seq("th", "half"), "left_outer")
      .select(col("th"), col("half"), col("row_tot"),
              coalesce(col("obs0"), lit(0L)).as("obs"))
    val colT = cells.groupBy(col("half")).agg(sum(col("obs")).as("col_tot"))
    val tot = cells.agg(sum(col("obs")).as("n_tot"))
    val withExp = cells.join(broadcast(colT), "half").crossJoin(broadcast(tot))
      .select(col("th"), col("half"), col("obs"),
        (col("row_tot").cast("double") * col("col_tot").cast("double") /
          col("n_tot").cast("double")).as("exp"))
      .withColumn("contrib",
        (col("obs").cast("double") - col("exp")) *
          (col("obs").cast("double") - col("exp")) / col("exp"))
    // per-cell micros CAP at 10¹⁵ (= 10⁹ χ² units — beyond any
    // significance threshold by many orders): Spark's floor(double)
    // returns LONG and would clamp implicitly at Long.MaxValue where
    // DuckDB's double floor keeps going, so the cap is stated EXPLICITLY
    // on both engines at a value exact in long AND double (10¹⁵ < 2⁵³) —
    // the fold stays bit-identical at any corpus size, and a saturated
    // cell is maximal drift by definition
    val total = withExp.agg(
        sum(least(floor(col("contrib") * lit(1000000.0)), lit(1000000000000000L))
              .cast("decimal(38,0)"))
          .as("chi2_micros"),
        (countDistinct(col("th")) - 1).as("dof"))
      .select((col("chi2_micros").cast("double") / lit(1000000.0)).as("chi2"),
              col("dof"))
    withExp.crossJoin(broadcast(total))
      .select(col("th"), col("half"), col("obs"), col("exp"),
              col("contrib"), col("chi2"), col("dof"))
      .orderBy(col("th"), col("half"))
  }

  /** Context-window width and stride (tokens) for [[docChunks]] — the
    * shared constants the oracle states verbatim. Stride < window ⇒ a
    * 25% overlap, the standard long-document encoding shape. The values
    * are FIXTURE-SCALED (probed before freezing, the ppl-bucket rule:
    * fixture docs top out at ~100 tokens, so a production 512/384 pair
    * would put every doc in one chunk and the op would discriminate
    * nothing); a real corpus runs the same plan at 512/384. */
  val ChunkWindowTokens = 32L
  val ChunkStrideTokens = 24L

  /** CONTEXT-WINDOW CHUNKING: split every document into overlapping
    * token-index windows (width [[ChunkWindowTokens]], stride
    * [[ChunkStrideTokens]]) — the op that feeds a long document to a
    * fixed-context model (each chunk carries its token span; the text
    * slice itself stays with the reader, this is the METADATA plan a
    * chunker executes from). All INTEGER: n_chunks = ⌈(n−W)/S⌉+1 with
    * positive operands (so Spark `div` and DuckDB `//` agree — the q36
    * rule), spans are pure multiplication/min. A 0-token (null/empty)
    * doc emits ONE empty chunk, explicitly on both engines. Scale: one
    * narrow projection + a ≤⌈n/S⌉-wide explode per doc — no shuffle,
    * embarrassingly parallel; the explode fan-out is bounded by doc
    * length over stride, never corpus-shaped. */
  def docChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val (w, s) = (ChunkWindowTokens, ChunkStrideTokens)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), tokenCount0.as("n_tok"))
      .withColumn("n_chunks",
        when(col("n_tok") <= w, lit(1L))
          .otherwise(expr(s"(n_tok - $w + $s - 1) div $s") + 1L))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * s)
      .withColumn("end_tok", least(col("start_tok") + w, col("n_tok")))
      .select(col("doc_id"), col("chunk_id"), col("lang"), col("source"),
              col("n_tok"), col("start_tok"), col("end_tok"),
              (col("end_tok") - col("start_tok")).as("chunk_tok"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Duplicate-3-gram flag threshold numerator for
    * [[repetitionNgramStats]]: flag when dup·50 ≥ n_ngrams (= 2% of the
    * doc's 3-grams are repeats). Probed for DISCRIMINATION at all three
    * SFs before freezing (8/4/58 docs flag at sf0.001/0.01/0.1 — the
    * clear repeaters, non-vacuous and not everything; the classic 30%
    * literature cut flags ZERO fixture docs). */
  val RepetitionDupDenom = 50L

  /** REPETITION STATISTICS — the duplicate-n-gram quality signal of the
    * Gopher/MassiveText filter family: the fraction of a document's word
    * 3-grams that are repeats of an earlier 3-gram in the SAME document
    * (machine-generated and boilerplate-heavy text repeats itself;
    * natural prose mostly does not). Counts are exact integers over the
    * engine's rolling 3-gram hashes ([[graft.functions.TextFunctions
    * .shingleHashes]], the dedup family's unit), the flag is the
    * CROSS-MULTIPLIED integer test dup·[[RepetitionDupDenom]] ≥ n (no
    * float threshold), and the reported fraction is one final divide —
    * 0.0 explicit for sub-3-token docs on both engines. Scale: narrow
    * projection, per-doc array ops, no shuffle. */
  def repetitionNgramStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(shingleHashes(col("text"), 3)).cast("long")).as("n_ngrams"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(array_distinct(shingleHashes(col("text"), 3))).cast("long"))
          .as("n_distinct"))
      .withColumn("n_dup", col("n_ngrams") - col("n_distinct"))
      .withColumn("dup_frac",
        when(col("n_ngrams") === 0L, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_ngrams").cast("double")))
      .withColumn("is_repetitive",
        (col("n_ngrams") > 0L &&
         col("n_dup") * RepetitionDupDenom >= col("n_ngrams")).cast("long"))
      .orderBy(col("doc_id"))

  /** Target draw count and band width for [[sampleWeightedSystematic]] —
    * shared constants the oracle states verbatim. */
  val SampleWeightedK = 200L
  private val SampleWeightedBand = 64L

  /** WEIGHT-PROPORTIONAL SYSTEMATIC SAMPLING: K deterministic draws with
    * inclusion probability ∝ token count — the "sample by length/quality
    * weight" pipeline op (a uniform doc sample over-represents short docs
    * token-wise). A doc is drawn when its weight interval [cum−w, cum)
    * crosses a quantile boundary: ⌊cum·K/T⌋ > ⌊(cum−w)·K/T⌋ — ALL BIGINT
    * (positive, so Spark's truncating `div` and DuckDB's flooring `//`
    * agree — the q36 rule), zero randomness, replayable.
    *
    * The prefix sum is BANDED from the start (the pareto_parts_abc_scalable
    * two-level machinery): in-band running sums partitioned by
    * `doc_id div 64`, plus a band-offset table whose own prefix window is
    * the only single-partition work (band-count-sized). Integer addition
    * is associative, so the split cumulative equals the single global
    * window bit-for-bit and the op registers under the oracle's textbook
    * one-window statement. Heavy docs spanning several quantiles still
    * emit ONE row (pick_idx jumps) — draws ≤ K, exactly K when no doc
    * outweighs a quantile. */
  def sampleWeightedSystematic(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), tokenCount0.as("w"))
      .withColumn("band", expr(s"doc_id div $SampleWeightedBand"))
    val inBand = d.withColumn("cum_in",
      sum(col("w")).over(W.partitionBy(col("band")).orderBy(col("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)))
    val bandTotals = d.groupBy(col("band")).agg(sum(col("w")).as("band_sum"))
    val offsets = bandTotals
      .withColumn("off", coalesce(sum(col("band_sum"))
        .over(W.orderBy(col("band")).rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("band_sum"))
        .over(W.orderBy(col("band"))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .select(col("band"), col("off"), col("total"))
    inBand.join(broadcast(offsets), "band")
      .withColumn("cum", col("cum_in") + col("off"))
      .filter(col("w") > 0 &&
        expr(s"(cum * $SampleWeightedK) div total") >
        expr(s"((cum - w) * $SampleWeightedK) div total"))
      .select(col("doc_id"), col("lang"), col("source"), col("w"),
              expr(s"(cum * $SampleWeightedK) div total").as("pick_idx"))
      .orderBy(col("doc_id"))
  }

  /** INVERTED-INDEX POSTING LISTS for the mid-frequency token band — the
    * search-index build step (and the exact-match retrieval side of a RAG
    * corpus): for every token hash whose document frequency lies in
    * [dfLo, dfHi], the doc_id-ascending posting list, emitted in EXPLODED
    * row form (th, df, pos, doc_id) capped at `cap` postings per token.
    * The band is the honest scale contract made explicit: stopword-grade
    * tokens (df above the band) would each carry a corpus-sized posting
    * list — the same row-width hazard as the vocab-sized fold vocab_drift
    * retired — and BM25/tf-idf already serve them; hapax tokens below the
    * band retrieve nothing. Both the band and the cap are stated in the
    * oracle, so what is dropped is oracle-visible, never silent.
    *
    * Scale shape: tokenize → distinct (token, doc) pairs (map-side
    * combinable), df groupBy on the same key, band filter BEFORE the
    * posting window, and the row_number window is bounded by dfHi per
    * token — no global sort, no unbounded group. */
  def invertedIndexPostings(spark: SparkSession, sfDir: String,
                            dfLo: Long = 5L, dfHi: Long = 40L,
                            cap: Int = 32): DataFrame =
    invertedIndexPostingsOf(Tables.documentsNarrow(spark, sfDir), dfLo, dfHi, cap)

  def invertedIndexPostingsOf(d: DataFrame, dfLo: Long = 5L, dfHi: Long = 40L,
                              cap: Int = 32): DataFrame = {
    val pairs = d
      .select(explode(tokenHashes(col("text"))).as("th"), col("doc_id"))
      .distinct()
    val dfBand = pairs.groupBy(col("th"))
      .agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") >= dfLo && col("df") <= dfHi)
    pairs.join(dfBand, "th")
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("th")).orderBy(col("doc_id"))).cast("long"))
      .filter(col("pos") <= cap)
      .select(col("th"), col("df"), col("pos"), col("doc_id"))
      .orderBy(col("th"), col("pos"))
  }
}
