package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, WebSocket}
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

/** PRODUCTION implementations of the transport seams over the JDK's
  * built-in `java.net.http` client (Java 11+): the live half the recorded
  * doubles stand in for. Everything here is driver-side bootstrap/pump
  * I/O, exactly where the reference keeps it — the adapters own their
  * socket loop (liq-stream `binance_adapter.py:96-129`: while True →
  * connect → subscribe → drain → on error sleep backoff → reconnect;
  * `bybit_adapter.py:124-143`), and nothing downstream of
  * [[WsTransport.pumpTo]]'s capture file knows or cares which transport
  * produced the bytes. No third-party dependency: the JDK ships both the
  * HTTP client and an RFC 6455 WebSocket client.
  *
  * LiveTransportSpec drives both classes against REAL localhost sockets
  * (an in-test RFC 6455 server — handshake, masked client frames, abrupt
  * drops) and pins that the subscribe handshake bytes equal the
  * recorded-double path's, so swapping doubles for these classes is
  * proven behavior-preserving without network egress. */
object LiveTransport {

  /** One-shot GET over `java.net.http.HttpClient` (follows redirects,
    * like the reference's `requests.get`). Non-2xx → IOException: the
    * seam contract says a failed request throws and the CALLER owns
    * retry policy for the REST bootstrap (`bybit_adapter.py:108-122`
    * lets the error propagate and the supervisor restart). */
  final class JdkHttpTransport(connectTimeoutMs: Long = 10000L)
      extends HttpTransport {
    private val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    override def get(url: String): String = {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  /** Sentinels the listener enqueues beside data frames. */
  private case object Closed  // clean close (1000) — the stream is done
  private case object Dropped // abnormal close / socket error — reconnect

  /** Bridges the JDK's async listener to the seam's pull iterator: text
    * messages (reassembled across continuation fragments via the `last`
    * flag) land on a queue the iterator drains. */
  private final class QueueListener(
      q: LinkedBlockingQueue[AnyRef]) extends WebSocket.Listener {
    private val partial = new java.lang.StringBuilder
    override def onText(ws: WebSocket, data: CharSequence,
        last: Boolean): CompletionStage[_] = {
      partial.append(data)
      if (last) { q.put(partial.toString); partial.setLength(0) }
      ws.request(1)
      null
    }
    override def onClose(ws: WebSocket, statusCode: Int,
        reason: String): CompletionStage[_] = {
      q.put(if (statusCode == WebSocket.NORMAL_CLOSURE) Closed else Dropped)
      null
    }
    override def onError(ws: WebSocket, error: Throwable): Unit =
      q.put(Dropped)
  }

  /** RFC 6455 client with the reference's reconnect loop INSIDE the
    * implementation (the seam doc's contract): connect, send the
    * subscribe frames, yield incoming text frames; on an abnormal close
    * or socket error, sleep an exponential backoff (base `backoffMs`,
    * doubling, capped at 32×) and reconnect + resubscribe, up to
    * `maxReconnects` times — then fail loudly. A clean close (1000) ends
    * the iterator. `idleTimeoutMs` bounds a silent peer: no frame for
    * that long aborts the socket and takes the reconnect path, the same
    * watchdog role as the reference's recv timeout. Frames may repeat
    * across a reconnect (the wire gives no resume cursor); dedup is
    * downstream's job, exactly as in the reference (its dedup ring). */
  final class JdkWsTransport(
      maxReconnects: Int = 8,
      backoffMs: Long = 1000L,
      idleTimeoutMs: Long = 30000L,
      connectTimeoutMs: Long = 10000L) extends WsTransport {

    override def connect(url: String,
        subscribeFrames: Seq[String]): Iterator[String] = {
      val client = HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
        .build()

      new Iterator[String] {
        // Each connection GENERATION owns a fresh queue + listener: a
        // late Dropped/Closed sentinel (or data frame) from an abandoned
        // socket lands on that generation's dead queue and can never be
        // attributed to the current healthy connection (which would have
        // cost a spurious attempt++ and a leaked socket).
        private var q: LinkedBlockingQueue[AnyRef] = _
        private var ws: WebSocket = _
        private var attempts = 0
        private var nextFrame: String = null
        private var done = false

        /** One failed attempt against the shared budget: throws once the
          * budget is spent, else sleeps the exponential backoff. Connect
          * and subscribe failures spend the SAME budget as mid-stream
          * drops — the reference keeps `websockets.connect` INSIDE its
          * try/except-backoff loop (`binance_adapter.py:96-129`), so a
          * refused connection or failed handshake retries with backoff
          * instead of killing the pump. */
        private def spendAttempt(): Unit = {
          if (attempts >= maxReconnects) {
            done = true
            throw new java.io.IOException(
              s"websocket $url: gave up after $maxReconnects reconnects")
          }
          attempts += 1
          Thread.sleep(math.min(32L, 1L << math.min(attempts - 1, 5)) * backoffMs)
        }

        /** Abort the previous generation's socket (never leak it), then
          * connect + resubscribe until success or budget exhaustion. */
        private def reopen(): Unit = {
          if (ws != null) { ws.abort(); ws = null }
          var connected = false
          while (!connected) {
            val genQ = new LinkedBlockingQueue[AnyRef]()
            try {
              val sock = client.newWebSocketBuilder()
                .buildAsync(URI.create(url), new QueueListener(genQ)).join()
              try {
                subscribeFrames.foreach(f => sock.sendText(f, true).join(): Unit)
                q = genQ
                ws = sock
                connected = true
              } catch {
                case e if scala.util.control.NonFatal(e) =>
                  sock.abort() // subscribe failed: don't leak the socket
                  throw e
              }
            } catch {
              case e if scala.util.control.NonFatal(e) => spendAttempt()
            }
          }
        }

        @annotation.tailrec
        private def pump(): Unit = {
          if (ws == null) reopen() // initial connect retries too
          val item = q.poll(idleTimeoutMs, TimeUnit.MILLISECONDS)
          item match {
            case s: String =>
              nextFrame = s
              // a frame means the (re)connect SUCCEEDED: the budget counts
              // consecutive failures without progress, not lifetime drops —
              // the reference's loop likewise re-arms its backoff after a
              // successful connect (binance_adapter.py:96-129)
              attempts = 0
            case Closed    => done = true
            case _ => // Dropped, or null = idle timeout (silent peer)
              spendAttempt()
              reopen()
              pump()
          }
        }

        override def hasNext: Boolean = {
          if (nextFrame == null && !done) pump()
          nextFrame != null
        }
        override def next(): String = {
          if (!hasNext) throw new NoSuchElementException
          val f = nextFrame
          nextFrame = null
          f
        }
      }
    }
  }
}
