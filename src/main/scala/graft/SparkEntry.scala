package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers one named query here with a
  * DuckDB-oracle ANSI-SQL twin in [[oracleSql]] (same column names, explicit
  * deterministic ORDER BY on both sides). Ops live in graft.ops.* /
  * graft.normalize.*; this object is pure wiring.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary: scan → project → filter-free agg →
    * sort, exercising the whole driver loop (SURVEY.md §7 slice 0). */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggByKey(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TimeWindows.queries ++ JsonOps.queries ++
      TextOps.queries ++ DedupOps.queries ++ VectorOps.queries ++
      Multimodal.queries ++ Extended.queries ++ Curation.queries ++
      Formats.queries ++ Bucketing.queries ++ DataQuality.queries ++
      EventOps.queries ++ GraphOps.queries ++ MarketOps.queries ++
      graft.normalize.NormalizeOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TimeWindows.oracles ++ JsonOps.oracles ++
      TextOps.oracles ++ DedupOps.oracles ++ VectorOps.oracles ++
      Multimodal.oracles ++ Extended.oracles ++ Curation.oracles ++
      Formats.oracles ++ Bucketing.oracles ++ DataQuality.oracles ++
      EventOps.oracles ++ GraphOps.oracles ++ MarketOps.oracles ++
      graft.normalize.NormalizeOps.oracles
}
