package graft.normalize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the five normalizers: each runs its golden
  * fixtures ([[Fixtures]]) through the normalizer with a pinned
  * ts_ingest_ms=0, and the DuckDB oracle independently re-derives the unified
  * rows from the same fixture strings with SQL JSON functions. The `raw`
  * column is excluded from the compare (serialization key-order is engine
  *-specific); the ScalaTest golden specs cover it.
  */
object NormalizeOps {

  private val outCols = Seq("exchange", "market", "symbol", "side", "qty",
    "price", "notional", "ts_exch_ms", "ts_ingest_ms")

  private def fixtureDf(spark: SparkSession, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF("raw")
  }

  private def out(df: DataFrame): DataFrame =
    df.select(outCols.map(col): _*).orderBy("symbol", "ts_exch_ms", "qty")

  def normalizeBinance(spark: SparkSession, dir: String): DataFrame =
    out(Normalizers.binance(fixtureDf(spark, Fixtures.binance), "usdt", lit(0L)))

  def normalizeAster(spark: SparkSession, dir: String): DataFrame =
    out(Normalizers.aster(fixtureDf(spark, Fixtures.aster), "usdt", lit(0L)))

  def normalizeBybit(spark: SparkSession, dir: String): DataFrame =
    out(Normalizers.bybit(fixtureDf(spark, Fixtures.bybit), "linear", lit(0L)))

  def normalizeOkx(spark: SparkSession, dir: String): DataFrame =
    out(Normalizers.okx(fixtureDf(spark, Fixtures.okx), "usdt", lit(0L)))

  def normalizeHyperliquid(spark: SparkSession, dir: String): DataFrame =
    out(Normalizers.hyperliquid(fixtureDf(spark, Fixtures.hyperliquid),
      ingestMs = lit(0L)))

  /** All five normalized fixture streams unioned into one frame — the
    * reference's fan-in of 8 concurrent streams to a shared sink
    * (liq-stream `stream.py:169-188`), counted per exchange. */
  def normalizeUnion(spark: SparkSession, dir: String): DataFrame =
    Normalizers.unionAll(Seq(
        Normalizers.binance(fixtureDf(spark, Fixtures.binance), "usdt", lit(0L)),
        Normalizers.aster(fixtureDf(spark, Fixtures.aster), "usdt", lit(0L)),
        Normalizers.bybit(fixtureDf(spark, Fixtures.bybit), "linear", lit(0L)),
        Normalizers.okx(fixtureDf(spark, Fixtures.okx), "usdt", lit(0L)),
        Normalizers.hyperliquid(fixtureDf(spark, Fixtures.hyperliquid), ingestMs = lit(0L))))
      .groupBy("exchange", "market")
      .agg(count(lit(1)).as("cnt"), sumMoneyLocal(col("notional")).as("sum_notional"))
      .orderBy("exchange", "market")

  private def sumMoneyLocal(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .cast(org.apache.spark.sql.types.DoubleType)

  // ── DuckDB oracles ───────────────────────────────────────────────────────

  private def binanceSelect(exchange: String,
      fixtures: Seq[String] = Fixtures.binance): String = s"""
    WITH raw0(raw) AS (VALUES ${Fixtures.sqlValues(fixtures)}),
    valid AS (SELECT raw FROM raw0 WHERE json_valid(raw)),
    arr AS (SELECT CASE WHEN substr(ltrim(raw),1,1)='[' THEN raw
                        ELSE '['||raw||']' END AS a FROM valid),
    ev AS (SELECT json_extract(a, '$$['||i||']') AS e
           FROM arr, unnest(range(0, json_array_length(a)::BIGINT)) t(i)),
    f AS (SELECT
        COALESCE(json_extract_string(e,'$$.o.s'),'') AS symbol,
        upper(json_extract_string(e,'$$.o.S')) AS sideraw,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(e,'$$.o.ap'),''),
                          NULLIF(json_extract_string(e,'$$.o.p'),''), '0') AS DOUBLE) AS price,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(e,'$$.o.l'),''),
                          NULLIF(json_extract_string(e,'$$.o.z'),''),
                          NULLIF(json_extract_string(e,'$$.o.q'),''), '0') AS DOUBLE) AS qty,
        NULLIF(COALESCE(TRY_CAST(json_extract_string(e,'$$.E') AS BIGINT),
                        TRY_CAST(json_extract_string(e,'$$.o.T') AS BIGINT), 0), 0) AS ts_exch_ms
      FROM ev WHERE json_extract(e,'$$.o') IS NOT NULL)
    SELECT '$exchange' AS exchange, 'usdt' AS market, symbol,
           CASE WHEN sideraw='BUY' THEN 'short' WHEN sideraw='SELL' THEN 'long' END AS side,
           qty, price,
           CASE WHEN price<>0 AND qty<>0 THEN price*qty END AS notional,
           ts_exch_ms, CAST(0 AS BIGINT) AS ts_ingest_ms
    FROM f WHERE price IS NOT NULL AND qty IS NOT NULL"""

  private val bybitSelect: String = s"""
    WITH raw0(raw) AS (VALUES ${Fixtures.sqlValues(Fixtures.bybit)}),
    env AS (SELECT json_extract_string(raw,'$$.topic') AS topic,
                   TRY_CAST(json_extract_string(raw,'$$.ts') AS BIGINT) AS env_ts,
                   json_extract(raw,'$$.data') AS d0
            FROM raw0 WHERE json_valid(raw)
              AND (json_extract_string(raw,'$$.topic') LIKE 'allLiquidation.%'
                   OR json_extract_string(raw,'$$.topic') LIKE 'liquidation.%')),
    arr AS (SELECT topic, env_ts,
                   CASE WHEN substr(ltrim(d0::VARCHAR),1,1)='[' THEN d0
                        ELSE json_array(d0) END AS a
            FROM env WHERE d0 IS NOT NULL),
    r AS (SELECT topic, env_ts, json_extract(a,'$$['||i||']') AS d,
                 topic LIKE 'allLiquidation.%' AS isnew
          FROM arr, unnest(range(0, json_array_length(a)::BIGINT)) t(i)),
    f AS (SELECT
        COALESCE(CASE WHEN isnew THEN json_extract_string(d,'$$.s')
                      ELSE json_extract_string(d,'$$.symbol') END,
                 split_part(topic,'.',2)) AS symbol,
        lower(CASE WHEN isnew THEN json_extract_string(d,'$$.S')
                   ELSE json_extract_string(d,'$$.side') END) AS sideraw,
        COALESCE(TRY_CAST(CASE WHEN isnew THEN json_extract_string(d,'$$.p')
                               ELSE json_extract_string(d,'$$.price') END AS DOUBLE), 0.0) AS price,
        COALESCE(TRY_CAST(CASE WHEN isnew THEN json_extract_string(d,'$$.v')
                               ELSE COALESCE(NULLIF(json_extract_string(d,'$$.size'),''),
                                             NULLIF(json_extract_string(d,'$$.qty'),''), '0')
                          END AS DOUBLE), 0.0) AS qty,
        COALESCE(TRY_CAST(json_extract_string(d,'$$.T') AS BIGINT),
                 TRY_CAST(json_extract_string(d,'$$.updatedTimeE6') AS BIGINT)//1000,
                 env_ts) AS ts_exch_ms
      FROM r)
    SELECT 'bybit' AS exchange, 'linear' AS market, symbol,
           CASE WHEN sideraw='sell' THEN 'long' WHEN sideraw='buy' THEN 'short' END AS side,
           qty, price,
           CASE WHEN price<>0 AND qty<>0 THEN price*qty ELSE 0.0 END AS notional,
           ts_exch_ms, CAST(0 AS BIGINT) AS ts_ingest_ms
    FROM f"""

  private val okxSelect: String = s"""
    WITH raw0(raw) AS (VALUES ${Fixtures.sqlValues(Fixtures.okx)}),
    env AS (SELECT raw FROM raw0 WHERE json_valid(raw)
            AND json_extract_string(raw,'$$.arg.channel')='liquidation-orders'),
    inst AS (SELECT json_extract(raw,'$$.data['||i||']') AS inst
             FROM env, unnest(range(0, json_array_length(json_extract(raw,'$$.data'))::BIGINT)) t(i)),
    kept AS (SELECT inst, json_extract_string(inst,'$$.instId') AS instId
             FROM inst WHERE json_extract_string(inst,'$$.instId') LIKE '%-USDT-SWAP'),
    det AS (SELECT instId, json_extract(inst,'$$.details['||j||']') AS d
            FROM kept, unnest(range(0, json_array_length(json_extract(inst,'$$.details'))::BIGINT)) u(j)),
    f AS (SELECT instId,
        json_extract_string(d,'$$.posSide') AS posSide,
        TRY_CAST(COALESCE(NULLIF(json_extract_string(d,'$$.fillPx'),''),
                          NULLIF(json_extract_string(d,'$$.bkPx'),''), '0') AS DOUBLE) AS price,
        COALESCE(TRY_CAST(json_extract_string(d,'$$.sz') AS DOUBLE), 0.0) AS qty,
        TRY_CAST(json_extract_string(d,'$$.ts') AS BIGINT) AS ts_exch_ms
      FROM det)
    SELECT 'okx' AS exchange, 'usdt' AS market, instId AS symbol,
           CASE WHEN posSide IN ('long','short') THEN posSide END AS side,
           qty, price,
           CASE WHEN price<>0 AND qty<>0 THEN price*qty END AS notional,
           ts_exch_ms, CAST(0 AS BIGINT) AS ts_ingest_ms
    FROM f WHERE price IS NOT NULL"""

  private val hyperliquidSelect: String = s"""
    WITH raw0(raw) AS (VALUES ${Fixtures.sqlValues(Fixtures.hyperliquid)}),
    lines AS (SELECT raw FROM raw0 WHERE raw LIKE '%liquidation%' AND json_valid(raw)),
    pair AS (SELECT raw,
                    json_extract_string(raw,'$$.block_time') AS block_time,
                    json_extract_string(raw,'$$.local_time') AS local_time,
                    json_extract(raw,'$$.events['||i||']') AS p
             FROM lines, unnest(range(0, json_array_length(json_extract(raw,'$$.events'))::BIGINT)) t(i)),
    f0 AS (SELECT block_time, local_time,
                  lower(json_extract_string(p,'$$[0]')) AS taker,
                  json_extract(p,'$$[1]') AS fill
           FROM pair WHERE json_array_length(p) >= 2),
    f1 AS (SELECT *,
             CASE WHEN TRY_CAST(block_time AS DOUBLE) IS NOT NULL THEN
                    CASE WHEN TRY_CAST(block_time AS DOUBLE) < 1e12
                         THEN CAST(TRY_CAST(block_time AS DOUBLE)*1000 AS BIGINT)
                         ELSE CAST(TRY_CAST(block_time AS DOUBLE) AS BIGINT) END
                  ELSE COALESCE(epoch_ms(TRY_CAST(block_time AS TIMESTAMP)),
                                epoch_ms(TRY_CAST(local_time AS TIMESTAMP))) END AS ts_ms
           FROM f0
           WHERE json_extract(fill,'$$.liquidation') IS NOT NULL
             AND lower(json_extract_string(fill,'$$.liquidation.liquidatedUser')) = taker
             AND abs(COALESCE(TRY_CAST(json_extract_string(fill,'$$.sz') AS DOUBLE),0.0)) >= 0.0),
    dedup AS (SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY TRY_CAST(json_extract_string(fill,'$$.tid') AS BIGINT), taker,
                         json_extract_string(fill,'$$.coin')
            ORDER BY ts_ms) AS rn
        FROM f1) WHERE rn = 1),
    f AS (SELECT
        upper(json_extract_string(fill,'$$.coin'))||'USDC' AS symbol,
        lower(json_extract_string(fill,'$$.dir')) AS dirl,
        upper(json_extract_string(fill,'$$.side')) AS sideu,
        COALESCE(TRY_CAST(json_extract_string(fill,'$$.px') AS DOUBLE),0.0) AS price,
        abs(COALESCE(TRY_CAST(json_extract_string(fill,'$$.sz') AS DOUBLE),0.0)) AS qty,
        ts_ms AS ts_exch_ms
      FROM dedup)
    SELECT 'hyperliquid' AS exchange, 'usdc' AS market, symbol,
           CASE WHEN dirl LIKE '%close long%' THEN 'long'
                WHEN dirl LIKE '%close short%' THEN 'short'
                WHEN sideu='A' THEN 'long' WHEN sideu='B' THEN 'short' END AS side,
           qty, price,
           CASE WHEN price<>0 AND qty<>0 THEN price*qty END AS notional,
           ts_exch_ms, CAST(0 AS BIGINT) AS ts_ingest_ms
    FROM f"""

  private def ordered(sel: String): String =
    s"SELECT * FROM ($sel) ORDER BY symbol, ts_exch_ms, qty"

  val oracles: Map[String, String] = Map(
    "normalize_binance" -> ordered(binanceSelect("binance")),
    "normalize_aster" -> ordered(binanceSelect("aster", Fixtures.aster)),
    "normalize_bybit" -> ordered(bybitSelect),
    "normalize_okx" -> ordered(okxSelect),
    "normalize_hl" -> ordered(hyperliquidSelect),
    "normalize_union" -> s"""
      SELECT exchange, market, count(*) AS cnt,
             CAST(SUM(CAST(notional AS DECIMAL(18,2))) AS DOUBLE) AS sum_notional
      FROM ((${binanceSelect("binance")}) UNION ALL (${binanceSelect("aster", Fixtures.aster)})
            UNION ALL ($bybitSelect) UNION ALL ($okxSelect)
            UNION ALL ($hyperliquidSelect))
      GROUP BY exchange, market ORDER BY exchange, market""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "normalize_binance" -> normalizeBinance _,
    "normalize_aster" -> normalizeAster _,
    "normalize_bybit" -> normalizeBybit _,
    "normalize_okx" -> normalizeOkx _,
    "normalize_hl" -> normalizeHyperliquid _,
    "normalize_union" -> normalizeUnion _,
  )
}
