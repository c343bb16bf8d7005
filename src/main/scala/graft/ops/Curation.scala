package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators — the steps that turn raw documents into a
  * training corpus: deterministic stratified sampling and the composed
  * quality→dedup keep-list pipeline. Everything is reproducible by
  * construction (hash-based sampling, no rand()), which is what a
  * training-data pipeline needs for auditability and incremental re-runs.
  */
object Curation {

  /** Deterministic stratified sampling: each document hashes (content-
    * independent salt on doc_id) into one of 1000 buckets; per-stratum
    * keep-rates then under/over-sample — here: downsample the dominant
    * 'en' stratum to 20%, keep 80% of the rest (the rebalancing move when
    * one language dwarfs the corpus). Hash-mod sampling is stable across
    * runs and cluster sizes — unlike `sample()`, re-running at 100 TB
    * yields the identical corpus, and adding documents never flips the
    * membership of existing ones. Map-side only: no shuffle at all before
    * the output sort. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val key = concat(col("doc_id").cast(StringType), lit("#strat"))
    val bucket = DedupOps.polyHash(key) % 1000L
    val rate = when(col("lang") === "en", 200L).otherwise(800L)
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), bucket.as("bucket"), rate.as("rate"))
      .filter(col("bucket") < col("rate"))
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** The composed curation pipeline: quality gate (≥5 tokens, ≤60%
    * stopwords) ∘ exact-dedup keep (first doc per content hash) ∘ near-dup
    * cluster keep (canonical member per connected component). Semi-joins
    * only — the keep-lists ship just doc_ids, never text, so the big side
    * streams through two keyed semi-joins and the corpus is read once per
    * stage. This is the query a user runs to materialize the training
    * corpus; every stage is also independently oracle-checked
    * (text_quality / dedup_exact / dedup_clusters). */
  def curateCorpus(spark: SparkSession, dir: String): DataFrame = {
    val exactKeep = DedupOps.dedupExact(spark, dir)
      .select(col("keep_doc_id").as("doc_id"))
    // materialize the cluster DROP-list (paired docs that lose their
    // election — tiny) before the joins: the LSH+verify+label pipeline runs
    // exactly once, singletons keep by default so no full labeled-documents
    // frame is built, and the main query anti-joins a checkpointed doc_id
    // list instead of re-planning the dedup subtree inline
    val clusterDrop = Extended.dedupClusterDrops(spark, dir).localCheckpoint()
    // the quality gate is fused into the corpus scan (same expressions as
    // text_quality, which stays independently oracle-checked) — one pass
    // over documents instead of a second scan plus a self-join on doc_id
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextOps.nTokensCol(col("text")).as("n_tokens"),
        TextOps.stopwordRatioCol(col("text")).as("stopword_ratio"))
      .filter(col("n_tokens") >= 5 && col("stopword_ratio") <= 0.6)
      .select("doc_id", "lang", "n_tokens")
      // no static broadcast hints: the checkpointed drop-list has no stats
      // at plan time, but AQE re-plans the joins from its RUNTIME size —
      // broadcast when the list is actually small (the common case), a
      // keyed shuffle when a dup-heavy corpus makes it huge (a static hint
      // would OOM the build side there). PlanSpec asserts the adaptive
      // final plan broadcasts at this scale.
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(clusterDrop, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  private val duckStratBucket =
    """list_reduce(list_concat([0::BIGINT],
         list_transform(range(1, length(doc_id::VARCHAR || '#strat') + 1),
           i -> ascii((doc_id::VARCHAR || '#strat')[i:i]))),
         (acc, c) -> (acc * 31 + c) % 1000000007) % 1000"""

  val oracles: Map[String, String] = Map(
    "sample_stratified" -> s"""
      WITH h AS (SELECT doc_id, lang, $duckStratBucket AS bucket FROM documents)
      SELECT doc_id, lang, bucket FROM h
      WHERE bucket < CASE WHEN lang = 'en' THEN 200 ELSE 800 END
      ORDER BY doc_id""",
    "curate_corpus" -> s"""
      WITH q0 AS (${TextOps.oracles("text_quality")}),
      quality AS (SELECT doc_id, n_tokens FROM q0
                  WHERE n_tokens >= 5 AND stopword_ratio <= 0.6),
      e0 AS (${DedupOps.oracles("dedup_exact")}),
      c0 AS (${Extended.oracles("dedup_clusters")})
      SELECT d.doc_id AS doc_id, d.lang AS lang, quality.n_tokens AS n_tokens
      FROM documents d
      JOIN quality ON d.doc_id = quality.doc_id
      WHERE d.doc_id IN (SELECT keep_doc_id FROM e0)
        AND d.doc_id IN (SELECT doc_id FROM c0 WHERE keep)
      ORDER BY doc_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_stratified" -> sampleStratified _,
    "curate_corpus" -> curateCorpus _,
  )
}
