package graft.normalize

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Schemas

/** Golden-fixture specs for the five normalizers — the reference's de-facto
  * correctness spec transcribed from its adapter docstrings (FIXTURES.md §A;
  * SURVEY.md §5 test plan): coalesce preference order, side decode tables,
  * µs→ms and seconds-vs-ms conversions, self-liquidation filter, dedup,
  * dead-letter tolerance.
  */
class NormalizerSpec extends SparkSpec {

  private def fx(rows: Seq[String]) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("raw")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("symbol", "ts_exch_ms").collect().toSeq

  test("unified schema is exact for every normalizer") {
    val outs = Seq(
      Normalizers.binance(fx(Fixtures.binance), "usdt", lit(0L)),
      Normalizers.aster(fx(Fixtures.binance), "usdt", lit(0L)),
      Normalizers.bybit(fx(Fixtures.bybit), "linear", lit(0L)),
      Normalizers.okx(fx(Fixtures.okx), "usdt", lit(0L)),
      Normalizers.hyperliquid(fx(Fixtures.hyperliquid), ingestMs = lit(0L)))
    outs.foreach { df =>
      assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        Schemas.unified.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }

  test("binance: coalesce order ap>p / l>z>q, side decode, E>o.T, dead letters") {
    val rows = rowsOf(Normalizers.binance(fx(Fixtures.binance), "usdt", lit(0L)))
    // 5 fixture frames -> 4 events survive (missing-o and malformed dropped)
    assert(rows.size == 4)
    val bySym = rows.map(r => r.getString(2) -> r).toMap
    val btc = bySym("BTCUSDT")
    assert(btc.getString(3) == "long")              // SELL -> long
    assert(btc.getDouble(5) == 61990.10)            // ap preferred over p
    assert(btc.getDouble(4) == 0.010)               // l preferred over z/q
    assert(btc.getLong(7) == 1710000000000L)        // E preferred over o.T
    assert(btc.getDouble(6) == 61990.10 * 0.010)    // notional = price*qty
    assert(btc.getString(9).startsWith("{"))        // raw round-trip JSON
    val eth = bySym("ETHUSDT")
    assert(eth.getString(3) == "short")             // BUY -> short
    val sol = bySym("SOLUSDT")
    assert(sol.getDouble(5) == 150.25)              // ap missing -> p
    assert(sol.getDouble(4) == 9.0)                 // l missing -> z
    val xrp = bySym("XRPUSDT")
    assert(xrp.getLong(7) == 1710000003003L)        // E missing -> o.T
    assert(xrp.getDouble(5) == 0.0)                 // price "0"
    assert(xrp.isNullAt(6))                         // zero price -> null notional
  }

  test("bybit: new+legacy schemas, dict data, us->ms, env-ts fallback, _to_float") {
    val rows = rowsOf(Normalizers.bybit(fx(Fixtures.bybit), "linear", lit(0L)))
    assert(rows.size == 4)                          // pong topic dropped
    val rose = rows.filter(_.getString(2) == "ROSEUSDT")
    assert(rose.map(_.getString(3)).sorted == Seq("long", "short")) // Sell/Buy
    assert(rose.head.getLong(7) == 1739502302929L)
    val btc = rows.find(_.getString(2) == "BTCUSDT").get
    assert(btc.getString(3) == "short")             // Buy -> short
    assert(btc.getLong(7) == 1739502302929L)        // updatedTimeE6 / 1000
    assert(btc.getDouble(6) == 30000 * 0.01)        // notional
    val eth = rows.find(_.getString(2) == "ETHUSDT").get
    assert(eth.getDouble(4) == 0.0)                 // _to_float("oops") -> 0.0
    assert(eth.getDouble(6) == 0.0)                 // bybit notional 0.0, not null
    assert(eth.getLong(7) == 1739502303000L)        // envelope ts fallback
  }

  test("okx: channel guard, suffix filter, details explode, fillPx>bkPx") {
    val rows = rowsOf(Normalizers.okx(fx(Fixtures.okx), "usdt", lit(0L)))
    assert(rows.size == 2)                          // USD-SWAP + acks dropped
    assert(rows.forall(_.getString(2) == "BTC-USDT-SWAP"))
    val first = rows.head                           // ts 1710000000456
    assert(first.getString(3) == "long")            // posSide passthrough
    assert(first.getDouble(5) == 61490.5)           // fillPx preferred
    val second = rows(1)
    assert(second.getDouble(5) == 61600.0)          // fillPx missing -> bkPx
    assert(second.getString(3) == "short")
  }

  test("okx coin market: the -USD-SWAP suffix branch keeps inverse instruments") {
    // the usdt test above shows the USD-SWAP instrument being DROPPED; the
    // coin market must invert the selection (okx_adapter.py:15-21)
    val rows = rowsOf(Normalizers.okx(fx(Fixtures.okx), "coin", lit(0L)))
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(2).endsWith("-USD-SWAP")))
    assert(rows.forall(_.getString(1) == "coin"))
  }

  test("hyperliquid: self-liq filter, dedup, ts heuristics, side decode") {
    val rows = rowsOf(Normalizers.hyperliquid(fx(Fixtures.hyperliquid), ingestMs = lit(0L)))
    assert(rows.size == 3)              // non-liq fill, taker mismatch, dup dropped
    val eth = rows.find(_.getString(2) == "ETHUSDC").get
    assert(eth.getString(3) == "long")              // dir "Close Long"
    assert(eth.getDouble(4) == 1.25)                // qty = abs(sz)
    assert(eth.getLong(7) == 1758630896789L)        // dedup keeps first (ms unit)
    val sol = rows.find(_.getString(2) == "SOLUSDC").get
    assert(sol.getString(3) == "short")             // no dir match -> side B
    assert(sol.getLong(7) == 1758630960000L)        // seconds heuristic *1000
    val doge = rows.find(_.getString(2) == "DOGEUSDC").get
    val expected = java.time.Instant.parse("2025-09-23T12:37:00.500Z").toEpochMilli
    assert(doge.getLong(7) == expected)             // ISO local_time fallback
  }

  test("normalizers are total: arbitrary garbage input never throws") {
    val garbage = Seq("", "{", "[]", "null", "42", "\"str\"", "{}",
      """{"e":1,"o":2}""", """{"topic":null}""", """{"arg":{}}""",
      """{"events":"nope"}""", "\u0000\u0001", "}{", """{"o":{"ap":"x"}}""",
      """[[1,2],[3]]""", """{"data":{"size":{}}}""")
    val df = fx(garbage)
    assert(Normalizers.binance(df, "usdt", lit(0L)).count() >= 0)
    assert(Normalizers.bybit(df, "linear", lit(0L)).count() >= 0)
    assert(Normalizers.okx(df, "usdt", lit(0L)).count() >= 0)
    assert(Normalizers.hyperliquid(df, ingestMs = lit(0L)).count() >= 0)
  }

  test("dedup is idempotent: processing the same lines twice emits once") {
    val twice = fx(Fixtures.hyperliquid ++ Fixtures.hyperliquid)
    assert(Normalizers.hyperliquid(twice, ingestMs = lit(0L)).count() == 3)
  }

  test("unionAll fans heterogeneous streams into one unified frame") {
    val u = Normalizers.unionAll(Seq(
      Normalizers.binance(fx(Fixtures.binance), "usdt", lit(0L)),
      Normalizers.okx(fx(Fixtures.okx), "usdt", lit(0L))))
    assert(u.count() == 6)
    assert(u.select("exchange").distinct().count() == 2)
  }
}
