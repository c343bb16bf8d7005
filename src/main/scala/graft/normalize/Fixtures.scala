package graft.normalize

/** Golden input fixtures — the exchange payload shapes documented verbatim in
  * the reference adapters' docstrings (FIXTURES.md §A; liq-stream
  * `binance_adapter.py:43-57`, `bybit_adapter.py:174-182`,
  * `okx_adapter.py:44-57`, `hyperliquid_adapter.py:108-125`), plus the edge
  * cases every normalizer must tolerate (malformed JSON, missing envelope,
  * zero price, unit quirks). Shared by the driver-checked normalize_* queries
  * and the ScalaTest golden specs.
  */
object Fixtures {

  val binance: Seq[String] = Seq(
    // single event: SELL→long, ap preferred over p, l over z/q, E over o.T
    """{"e":"forceOrder","E":1710000000000,"o":{"s":"BTCUSDT","S":"SELL","o":"LIMIT","f":"IOC","q":"0.010","p":"62000.00","ap":"61990.10","X":"FILLED","l":"0.010","z":"0.010","T":1710000000123}}""",
    // array payload: BUY→short; second event missing ap → p used, missing l → z used
    """[{"e":"forceOrder","E":1710000001000,"o":{"s":"ETHUSDT","S":"BUY","q":"1.5","p":"3000.5","ap":"3001.0","l":"1.5","z":"1.5","T":1710000001001}},{"e":"forceOrder","E":1710000002000,"o":{"s":"SOLUSDT","S":"SELL","q":"10","p":"150.25","z":"9","T":1710000002002}}]""",
    // missing E → o.T fallback; zero price → notional null
    """{"e":"forceOrder","o":{"s":"XRPUSDT","S":"SELL","q":"100","p":"0","l":"100","T":1710000003003}}""",
    // event without o → dropped (binance_adapter.py:64-65)
    """{"e":"forceOrder","E":1710000004000}""",
    // malformed JSON → dropped (dead-letter tolerance)
    """{"e":"forceOrder","E":17100""",
  )

  /** Aster `!forceOrder@arr` frames — Binance-shaped by contract (liq-stream
    * `aster_adapter.py:36-57` documents the identical event shape), so the
    * fixtures mirror the Binance edge cases over Aster-listed symbols. */
  val aster: Seq[String] = Seq(
    // single event: SELL→long, ap over p, l over z/q, E over o.T
    """{"e":"forceOrder","E":1720000000000,"o":{"s":"ASTERUSDT","S":"SELL","o":"LIMIT","f":"IOC","q":"250","p":"1.91","ap":"1.9050","X":"FILLED","l":"250","z":"250","T":1720000000111}}""",
    // array payload: BUY→short; second event missing ap → p, missing l → z
    """[{"e":"forceOrder","E":1720000001000,"o":{"s":"BNBUSDT","S":"BUY","q":"3.2","p":"580.10","ap":"580.55","l":"3.2","z":"3.2","T":1720000001001}},{"e":"forceOrder","E":1720000002000,"o":{"s":"SUIUSDT","S":"SELL","q":"40","p":"0.985","z":"38","T":1720000002002}}]""",
    // missing E → o.T fallback; zero price → notional null
    """{"e":"forceOrder","o":{"s":"PEPEUSDT","S":"BUY","q":"9000000","p":"0","l":"9000000","T":1720000003003}}""",
    // event without o → dropped (aster_adapter.py:59-61)
    """{"e":"forceOrder","E":1720000004000}""",
    // malformed JSON → dropped (dead-letter tolerance)
    """{"e":"forceOrder","E":17200""",
  )

  val bybit: Seq[String] = Seq(
    // new allLiquidation schema: Sell→long
    """{"topic":"allLiquidation.ROSEUSDT","ts":1739502302930,"data":[{"T":1739502302929,"s":"ROSEUSDT","S":"Sell","v":"20000","p":"0.04499"},{"T":1739502302931,"s":"ROSEUSDT","S":"Buy","v":"500","p":"0.04501"}]}""",
    // legacy schema, dict (not list) data: µs→ms conversion, Buy→short
    """{"topic":"liquidation.BTCUSDT","ts":1739502302000,"data":{"updatedTimeE6":"1739502302929000","symbol":"BTCUSDT","side":"Buy","size":"0.01","price":"30000"}}""",
    // legacy without updatedTimeE6 → envelope ts fallback; garbage size → 0.0
    """{"topic":"liquidation.ETHUSDT","ts":1739502303000,"data":{"symbol":"ETHUSDT","side":"Sell","size":"oops","price":"2500"}}""",
    // unrelated topic → dropped (bybit_adapter.py:145-170)
    """{"topic":"pong","ts":1739502304000}""",
  )

  val okx: Seq[String] = Seq(
    // two instruments: USDT-SWAP kept, USD-SWAP filtered in usdt mode;
    // details explode; fillPx preferred over bkPx; second detail falls back
    """{"arg":{"channel":"liquidation-orders","instType":"SWAP"},"data":[{"instType":"SWAP","instId":"BTC-USDT-SWAP","details":[{"posSide":"long","side":"sell","bkPx":"61500","fillPx":"61490.5","sz":"2","ts":"1710000000456"},{"posSide":"short","side":"buy","bkPx":"61600","sz":"1.5","ts":"1710000000789"}]},{"instType":"SWAP","instId":"BTC-USD-SWAP","details":[{"posSide":"long","side":"sell","bkPx":"61500","fillPx":"61490.5","sz":"3","ts":"1710000000456"}]}]}""",
    // subscribe ack: wrong channel → dropped (okx_adapter.py:60-65)
    """{"arg":{"channel":"liquidation-orders","instType":"SWAP"},"data":[]}""",
    """{"event":"subscribe","arg":{"channel":"liquidation-orders"}}""",
  )

  val hyperliquid: Seq[String] = Seq(
    // liquidation fill, taker==liquidatedUser, ms block_time; plus a
    // non-liquidation fill in the same line (skipped)
    """{"local_time":"2025-09-23T12:34:56.789Z","block_time":1758630896789,"block_number":123456,"events":[["0xabc",{"coin":"ETH","px":"2450.5","sz":"-1.25","dir":"Close Long","side":"A","fee":"0.61","feeToken":"USDC","hash":"0xdead","tid":987654321,"liquidation":{"liquidatedUser":"0xabc","markPx":"2451.0","method":"market"}}],["0xother",{"coin":"ETH","px":"2450.5","sz":"0.5","dir":"Open Long","side":"B","fee":"0.1","feeToken":"USDC","hash":"0xbeef","tid":987654322}]]}""",
    // taker != liquidatedUser → dropped (hyperliquid_adapter.py:185-188)
    """{"local_time":"2025-09-23T12:35:00.000Z","block_time":1758630900000,"block_number":123457,"events":[["0xaaa",{"coin":"BTC","px":"64000","sz":"0.2","dir":"Close Short","side":"B","tid":987654323,"liquidation":{"liquidatedUser":"0xbbb","markPx":"64010","method":"market"}}]]}""",
    // duplicate tid|user|coin of line 1 → deduped (ring analog, :148-164)
    """{"local_time":"2025-09-23T12:35:05.000Z","block_time":1758630905000,"block_number":123458,"events":[["0xabc",{"coin":"ETH","px":"2450.5","sz":"-1.25","dir":"Close Long","side":"A","tid":987654321,"liquidation":{"liquidatedUser":"0xabc","markPx":"2451.0","method":"market"}}]]}""",
    // seconds-unit block_time (heuristic ×1000), side B→short, no dir match
    """{"local_time":"2025-09-23T12:36:00.000Z","block_time":1758630960,"block_number":123459,"events":[["0xccc",{"coin":"SOL","px":"150.5","sz":"10","dir":"Liquidation","side":"B","tid":987654324,"liquidation":{"liquidatedUser":"0xccc","markPx":"150.6","method":"market"}}]]}""",
    // missing block_time → ISO local_time fallback
    """{"local_time":"2025-09-23T12:37:00.500Z","block_number":123460,"events":[["0xddd",{"coin":"DOGE","px":"0.12","sz":"-1000","dir":"Close Long","side":"A","tid":987654325,"liquidation":{"liquidatedUser":"0xddd","markPx":"0.121","method":"market"}}]]}""",
    // line without the substring "liquidation" → prefiltered before parse
    """{"local_time":"2025-09-23T12:38:00.000Z","block_time":1758631080000,"block_number":123461,"events":[]}""",
    // malformed line → dropped
    """{"local_time":"2025-09-23T12:39:00.000Z","block_time":17586""",
  )

  /** SQL VALUES clause of the fixture strings (for the DuckDB oracles). */
  def sqlValues(rows: Seq[String]): String =
    rows.map(s => "('" + s.replace("'", "''") + "')").mkString(", ")
}
