package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit gate — the conformance checks an ingest pipeline runs
  * before publishing a snapshot (and fails the publish when violations
  * exceed budget): referential orphans, null rates on required columns,
  * domain-range violations, and primary-key duplicates. The reference's
  * analog is its per-row try/except tolerance — the adapters swallow
  * malformed frames row by row (liq-stream `adapters/binance_adapter.py:93-94`,
  * `adapters/hyperliquid_adapter.py:167-170`) and the CSV writer silently
  * drops unknown keys (`writer_csv.py:36`); this op turns those silent
  * drops into MEASURED counts a gate can threshold.
  *
  * Scale shape: each check is an independent aggregate over one scan —
  * count-shaped (map-side partials, a one-row result); the orphan check is
  * a keyed anti-join with no broadcast hint (both sides are fact-sized at
  * scale — AQE picks broadcast when the key side is actually small); the
  * final frame is a 5-row union of one-row aggregates. At 100 TB the checks share the snapshot scan via
  * the usual multi-aggregate rewrite if co-scheduled; they are expressed
  * independently here so each stays individually pruneable. */
object DataQuality {

  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val ord = table(spark, dir, "orders")
    val ev = table(spark, dir, "events")
    def check(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check"), count(lit(1)).as("violations"))
    // no broadcast hint: o_orderkey scales with the snapshot (orders is a
    // fact table, not a bounded dim) — a forced hint would encode an OOM
    // at 100 TB; AQE converts to broadcast at fixture scale on its own
    // (the dedupNgramJaccard rationale)
    val orphans = li.select("l_orderkey")
      .join(ord.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val nullValues = ev.filter(col("value").isNull)
    val nonPositiveQty = li.filter(col("l_quantity") <= 0.0)
    val tsOutOfRange = ev.filter(
      col("ts") < to_timestamp(lit("2020-01-01 00:00:00")) ||
        col("ts") >= to_timestamp(lit("2030-01-01 00:00:00")))
    // duplicate PKs: total minus distinct — 0 iff o_orderkey is unique
    val dupPk = ord.agg(
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("violations"))
      .select(lit("orders_dup_pk").as("check"), col("violations"))
    check("lineitem_orphan_orderkey", orphans)
      .unionByName(check("events_null_value", nullValues))
      .unionByName(check("lineitem_nonpositive_qty", nonPositiveQty))
      .unionByName(check("events_ts_out_of_range", tsOutOfRange))
      .unionByName(dupPk)
      .orderBy("check")
  }

  val oracles: Map[String, String] = Map(
    "dq_audit" ->
      """SELECT * FROM (
           SELECT 'lineitem_orphan_orderkey' AS check, count(*) AS violations
           FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
           UNION ALL
           SELECT 'events_null_value', count(*) FROM events WHERE value IS NULL
           UNION ALL
           SELECT 'lineitem_nonpositive_qty', count(*)
           FROM lineitem WHERE l_quantity <= 0.0
           UNION ALL
           SELECT 'events_ts_out_of_range', count(*) FROM events
           WHERE ts < TIMESTAMP '2020-01-01 00:00:00'
              OR ts >= TIMESTAMP '2030-01-01 00:00:00'
           UNION ALL
           SELECT 'orders_dup_pk', count(*) - count(DISTINCT o_orderkey)
           FROM orders)
         ORDER BY "check"""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_audit" -> dqAudit _,
  )
}
