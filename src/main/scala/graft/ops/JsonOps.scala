package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-surface and timestamp-coercion operators.
  *
  * The reference's rows are born as JSON (every adapter json.loads's frames
  * and re-serializes the original payload into the `raw` column —
  * liq-stream `binance_adapter.py:90`, `writer_pg.py:149-157`), and its
  * timestamp handling is a small zoo: epoch ms, epoch µs, seconds-vs-ms
  * heuristics, ISO strings (SURVEY.md §1.3). These ops re-express that
  * surface over the `events` table's `props` JSON column and `ts`.
  */
object JsonOps {

  /** JSON scalar extraction (get_json_object) — mining the `raw` column.
    * Aggregated so the driver compare stays small. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  /** PERMISSIVE JSON parse + not-null filter — the dead-letter pattern: the
    * reference skips malformed frames per-row and keeps going (liq-stream
    * `binance_adapter.py:93-94`, `okx_adapter.py:106-107`). from_json yields
    * null on garbage; the filter drops it without failing the query. */
  def filterNotnull(spark: SparkSession, dir: String): DataFrame = {
    val parsed = from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
    table(spark, dir, "events")
      .select(col("event_id"), parsed.getField("k").as("k"))
      .filter(col("k").isNotNull)
      .orderBy("event_id")
  }

  /** Compact JSON re-serialization — raw = json.dumps(ev, separators=(",",":"))
    * (liq-stream `binance_adapter.py:90`). Spark's to_json(struct) emits the
    * same compact form. */
  def toJsonRoundtrip(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("raw"))
      .orderBy("event_id")

  /** Two-level explode — OKX payloads nest data[] → details[] and the
    * normalizer iterates both (liq-stream `okx_adapter.py:68-77`). Generators
    * run map-side; no shuffle. */
  def explodeNested(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(sequence(lit(1), col("l_linenumber"))).as("i"))
      .select(col("l_orderkey"), col("l_linenumber"), col("i"),
        explode(sequence(lit(1), col("i"))).as("j"))
      // DuckDB's range() yields BIGINT; match the derived-column types.
      .select(col("l_orderkey"), col("l_linenumber"),
        col("i").cast(LongType).as("i"), col("j").cast(LongType).as("j"))
      .orderBy("l_orderkey", "l_linenumber", "i", "j")

  /** Timestamp fallback chain with unit conversion — Bybit prefers `T` (ms),
    * falls back to `updatedTimeE6` µs/1000, then the envelope ts (liq-stream
    * `bybit_adapter.py:199-206`). Simulated: primary ms is "missing" for
    * high-value rows; fallback derives coarser seconds-resolution ms. */
  def tsCoalesce(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(
        col("event_id"),
        coalesce(
          when(col("value") > 15, lit(null).cast(LongType))
            .otherwise(epochMs(col("ts"))),
          epochSec(col("ts")) * 1000).as("ts_ms"))
      .orderBy("event_id")

  /** Seconds-vs-milliseconds heuristic — numeric < 1e12 means seconds, else
    * ms (liq-stream `hyperliquid_adapter.py:14-36`). Mixed-unit input is
    * synthesized from ts (even ids carry seconds, odd ids carry ms), then
    * normalized back to ms by the heuristic. */
  def tsHeuristic(spark: SparkSession, dir: String): DataFrame = {
    val mixed = when(col("event_id") % 2 === 0, epochSec(col("ts")))
      .otherwise(epochMs(col("ts")))
    table(spark, dir, "events")
      .select(
        col("event_id"),
        when(mixed < 1000000000000L, mixed * 1000).otherwise(mixed).as("ts_ms"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    "json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                count(*) AS cnt
         FROM events GROUP BY 1 ORDER BY k""",
    "filter_notnull" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
         ORDER BY event_id""",
    "to_json_roundtrip" ->
      """SELECT event_id,
                to_json(struct_pack(event_id := event_id, event_type := event_type))::VARCHAR AS raw
         FROM events ORDER BY event_id""",
    "explode_nested" ->
      """SELECT l_orderkey, l_linenumber, i, j
         FROM lineitem,
              unnest(range(1, l_linenumber + 1)) t(i),
              unnest(range(1, i + 1)) u(j)
         WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber, i, j""",
    "ts_coalesce" ->
      """SELECT event_id,
                COALESCE(CASE WHEN value > 15 THEN NULL ELSE epoch_ms(ts) END,
                         (epoch_ms(ts) // 1000) * 1000) AS ts_ms
         FROM events ORDER BY event_id""",
    "ts_heuristic" ->
      """SELECT event_id,
                CASE WHEN m < 1000000000000 THEN m * 1000 ELSE m END AS ts_ms
         FROM (SELECT event_id,
                      CASE WHEN event_id % 2 = 0 THEN epoch_ms(ts) // 1000
                           ELSE epoch_ms(ts) END AS m
               FROM events)
         ORDER BY event_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "json_extract" -> jsonExtract _,
    "filter_notnull" -> filterNotnull _,
    "to_json_roundtrip" -> toJsonRoundtrip _,
    "explode_nested" -> explodeNested _,
    "ts_coalesce" -> tsCoalesce _,
    "ts_heuristic" -> tsHeuristic _,
  )
}
