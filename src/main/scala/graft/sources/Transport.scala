package graft.sources

/** Injectable TRANSPORT SEAMS for the live-network half of the adapter
  * surface — the one piece of the reference a zero-egress sandbox cannot
  * exercise directly: the WS adapters own a socket connect/subscribe loop
  * (liq-stream `binance_adapter.py:96-129`, `bybit_adapter.py:66-143`)
  * and Bybit's bootstrap does a REST GET (`bybit_adapter.py:108-122`).
  * Everything downstream of the wire is already modeled (frame indexing,
  * control-frame handling, normalization, sinks); these traits are the
  * boundary where a REAL client drops in without touching any of it:
  *
  *   - [[HttpTransport]] — one-shot GET; production implements it over
  *     any HTTP client, [[RecordedHttpTransport]] replays a captured
  *     response body and logs the request (the test double).
  *   - [[WsTransport]] — connect + subscribe, yielding raw frames in
  *     arrival order; production implements the socket loop (reconnect /
  *     backoff lives INSIDE the implementation, exactly where the
  *     reference keeps it), [[RecordedWsTransport]] replays captured
  *     frames and logs the subscribe handshake.
  *
  * The bridge to Spark is [[WsTransport.pumpTo]]: frames drain into a
  * line-framed capture file that [[WsReplayProvider]]'s incremental
  * [[FrameIndex]] already serves as a `MicroBatchStream` — so "live"
  * means a pump thread appending while the streaming query triggers, the
  * same capture-then-tail shape the reference's Hyperliquid adapter uses
  * for its node files (`hyperliquid_adapter.py:96-125`). */
trait HttpTransport {
  /** GET `url`, returning the response body. Implementations own retry
    * policy; a failed request should throw. */
  def get(url: String): String
}

/** Framed push connection: connect to `url`, send the subscribe frames,
  * then yield incoming raw frames in arrival order until the peer (or the
  * consumer) closes. */
trait WsTransport {
  def connect(url: String, subscribeFrames: Seq[String]): Iterator[String]
}

/** Replay double for [[HttpTransport]]: serves recorded response bodies
  * keyed by exact url and records every request made through the seam. */
final class RecordedHttpTransport(responses: Map[String, String])
    extends HttpTransport {
  private val log = scala.collection.mutable.ArrayBuffer[String]()
  def requested: Seq[String] = log.toSeq
  override def get(url: String): String = {
    log += url
    responses.getOrElse(url,
      throw new java.io.FileNotFoundException(s"no recorded response for $url"))
  }
}

/** Replay double for [[WsTransport]]: yields the recorded frames and
  * records each (url, subscribe handshake) so specs can assert the
  * protocol side of the bootstrap. */
final class RecordedWsTransport(frames: Seq[String]) extends WsTransport {
  private val log =
    scala.collection.mutable.ArrayBuffer[(String, Seq[String])]()
  def connections: Seq[(String, Seq[String])] = log.toSeq
  override def connect(url: String,
      subscribeFrames: Seq[String]): Iterator[String] = {
    log += ((url, subscribeFrames))
    frames.iterator
  }
}

object WsTransport {
  /** Drain a connected transport into a line-framed capture file (append;
    * one frame per line), the format [[WsReplayProvider]] serves
    * incrementally. Returns the frame count written. `maxFrames` bounds a
    * pump slice so a driver-side thread can interleave pumping with
    * triggers; a production deployment runs the pump as a long-lived
    * thread (or sidecar — the capture file is the only coupling) while
    * the streaming query tails the growing file. */
  def pumpTo(transport: WsTransport, url: String,
      subscribeFrames: Seq[String], path: String,
      maxFrames: Long = Long.MaxValue): Long = {
    val it = transport.connect(url, subscribeFrames)
    val out = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    var n = 0L
    try {
      while (n < maxFrames && it.hasNext) {
        out.write(it.next())
        out.write("\n")
        // flush per frame: the capture is a LIVE tail target — a
        // concurrently-triggering replay query must see frames at line
        // grain, not at 8 KB buffer boundaries (the reference's capture
        // files are line-buffered for the same reason:
        // hyperliquid_adapter.py's hour files grow line by line). The
        // pump is network-bound; the extra flush is noise against a
        // socket read.
        out.flush()
        n += 1
      }
    } finally out.close()
    n
  }
}
