package graft.model

import org.apache.spark.sql.types._

/** Typed row of the unified liquidation-event stream.
  *
  * Mirrors the reference's 10-column contract (liq-stream `writer_csv.py:7-10`,
  * Postgres DDL `writer_pg.py:23-36`): one liquidation event = one flat row.
  */
final case class LiquidationEvent(
    exchange: String,
    market: String,
    symbol: String,
    side: Option[String],
    qty: Option[Double],
    price: Option[Double],
    notional: Option[Double],
    ts_exch_ms: Option[Long],
    ts_ingest_ms: Long,
    raw: String,
)

/** Schemas: the unified output schema plus the five upstream payload shapes
  * documented in the reference adapters' docstrings (see FIXTURES.md §A).
  * Numeric fields arrive as JSON *strings* on most exchanges, so the payload
  * schemas keep them as StringType and the normalizers cast explicitly.
  */
object Schemas {

  /** Unified schema (liq-stream `writer_pg.py:23-36`). */
  val unified: StructType = StructType(Seq(
    StructField("exchange", StringType, nullable = false),
    StructField("market", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("side", StringType),
    StructField("qty", DoubleType),
    StructField("price", DoubleType),
    StructField("notional", DoubleType),
    StructField("ts_exch_ms", LongType),
    StructField("ts_ingest_ms", LongType),
    StructField("raw", StringType),
  ))

  /** Binance / Aster `!forceOrder@arr` event (liq-stream
    * `binance_adapter.py:43-57`, `aster_adapter.py:36-52`). The payload may be
    * a single event object or an array of them (`binance_adapter.py:60-61`);
    * normalizers wrap the single case into a 1-element array before explode.
    */
  val binanceEvent: StructType = StructType(Seq(
    StructField("e", StringType),
    StructField("E", LongType),
    StructField("o", StructType(Seq(
      StructField("s", StringType),
      StructField("S", StringType),
      StructField("o", StringType),
      StructField("f", StringType),
      StructField("q", StringType),
      StructField("p", StringType),
      StructField("ap", StringType),
      StructField("X", StringType),
      StructField("l", StringType),
      StructField("z", StringType),
      StructField("T", LongType),
    ))),
  ))

  /** Bybit v5 envelope: `{"topic":"allLiquidation.SYM","ts":ms,"data":...}`
    * (liq-stream `bybit_adapter.py:151-156,174-182`). `data` is a list on the
    * new topic but may be a bare dict on the legacy one (`:160-169`), so it
    * is captured as raw JSON text and array-wrapped by the normalizer. */
  val bybitEnvelope: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("ts", LongType),
    StructField("data", StringType),
  ))

  /** One Bybit liquidation row — covers the new `{T,s,S,v,p}` and legacy
    * `{updatedTimeE6,symbol,side,size,qty,price}` schemas in one struct. */
  val bybitRow: StructType = StructType(Seq(
    // new allLiquidation schema
    StructField("T", LongType),
    StructField("s", StringType),
    StructField("S", StringType),
    StructField("v", StringType),
    StructField("p", StringType),
    // legacy liquidation schema
    StructField("updatedTimeE6", StringType),
    StructField("symbol", StringType),
    StructField("side", StringType),
    StructField("size", StringType),
    StructField("qty", StringType),
    StructField("price", StringType),
  ))

  /** OKX `liquidation-orders` message: two-level nesting `data[] → details[]`
    * (liq-stream `okx_adapter.py:44-57`). */
  val okxEnvelope: StructType = StructType(Seq(
    StructField("arg", StructType(Seq(
      StructField("channel", StringType),
      StructField("instType", StringType),
    ))),
    StructField("data", ArrayType(StructType(Seq(
      StructField("instType", StringType),
      StructField("instId", StringType),
      StructField("details", ArrayType(StructType(Seq(
        StructField("posSide", StringType),
        StructField("side", StringType),
        StructField("bkPx", StringType),
        StructField("fillPx", StringType),
        StructField("sz", StringType),
        StructField("ts", StringType),
      )))),
    )))),
  ))

  /** Hyperliquid node-fill line (liq-stream `hyperliquid_adapter.py:108-125`).
    * `events` is an array of `[taker_address, fill_object]` pairs — a
    * heterogeneous JSON tuple. Spark's JSON parser renders a non-string token
    * into a StringType slot as its raw JSON text, so `array<array<string>>`
    * yields `[taker, "{...fill json...}"]` and the fill is re-parsed with
    * [[hyperliquidFill]]. This keeps the whole pipeline in Catalyst (no UDFs).
    */
  val hyperliquidLine: StructType = StructType(Seq(
    StructField("local_time", StringType),
    StructField("block_time", StringType), // numeric-or-ISO; coerced by heuristic
    StructField("block_number", LongType),
    StructField("events", ArrayType(ArrayType(StringType))),
  ))

  /** The fill object inside a Hyperliquid event pair
    * (liq-stream `hyperliquid_adapter.py:108-125,166-212`). */
  val hyperliquidFill: StructType = StructType(Seq(
    StructField("coin", StringType),
    StructField("px", StringType),
    StructField("sz", StringType),
    StructField("dir", StringType),
    StructField("side", StringType),
    StructField("time", StringType),
    StructField("fee", StringType),
    StructField("feeToken", StringType),
    StructField("hash", StringType),
    StructField("tid", LongType),
    StructField("liquidation", StructType(Seq(
      StructField("liquidatedUser", StringType),
      StructField("markPx", StringType),
      StructField("method", StringType),
    ))),
  ))
}
