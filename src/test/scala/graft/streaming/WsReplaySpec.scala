package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.normalize.Normalizers
import graft.sources.WsReplay

/** End-to-end spec for the WebSocket-shaped replay source
  * ([[graft.sources.WsReplayProvider]]): admission-controlled micro-batches,
  * control-frame dropping, and exactly-once delivery across a checkpoint
  * restart mid-stream — the source-contract analog of the reference
  * adapters' reconnect loop (liq-stream `binance_adapter.py:96-129`). */
class WsReplaySpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def frame(sym: String, ts: Long): String =
    s"""{"e":"forceOrder","E":$ts,"o":{"s":"$sym","S":"SELL","q":"2","p":"10","l":"2","T":$ts}}"""

  test("control-frame classifier matches the reference's ping/pong handling") {
    assert(WsReplay.isControlFrame("ping"))                      // okx string ping
    assert(WsReplay.isControlFrame(" pong \n"))
    assert(WsReplay.isControlFrame("""{"op":"ping"}"""))         // bybit heartbeat
    assert(WsReplay.isControlFrame("""{"event":"pong"}"""))      // okx json pong
    assert(!WsReplay.isControlFrame(frame("BTCUSDT", 1L)))       // data frame
    assert(!WsReplay.isControlFrame("""{"op":"subscribe","args":["ping-topic"]}"""))
  }

  test("ws-replay: paced batches, ping/pong dropped, exactly-once across restart") {
    val framesFile = s"${tmp("ws_frames")}/frames.jsonl"
    // 40 data frames with a ping/pong heartbeat every 10th — control frames
    // advance the offset but must emit no rows
    val lines = (1 to 40).flatMap { i =>
      val f = frame(f"SYM$i%03dUSDT", 1710000000000L + i * 1000L)
      if (i % 10 == 0) Seq("""{"op":"ping"}""", f) else Seq(f)
    }
    Files.write(Paths.get(framesFile), lines.mkString("\n").getBytes)

    val outDir = tmp("ws_out"); val ckpt = tmp("ws_ckpt")
    def start() = {
      val raw = spark.readStream
        .format("graft.sources.WsReplayProvider")
        .option("path", framesFile)
        .option("framesPerBatch", 2)
        .load()
      Normalizers.binance(raw.select(col("raw")), "usdt")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(100L))
        .format("parquet").option("path", outDir)
        .start()
    }

    // phase 1: stop mid-stream, shortly after the first committed batch
    val q1 = start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (q1.recentProgress.map(_.numInputRows).sum == 0 &&
          System.currentTimeMillis() < deadline) Thread.sleep(25)
    } finally q1.stop()
    val mid = spark.read.parquet(outDir).count()
    assert(mid > 0, "phase 1 should commit at least one micro-batch")
    assert(mid < 40, s"phase 1 should stop mid-stream, saw $mid rows")

    // phase 2: restart from the checkpoint, drain the rest
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(outDir)
    // exactly-once: all 40 data frames, none duplicated, pings gone
    assert(out.count() == 40)
    assert(out.select("symbol").distinct().count() == 40)
    assert(out.select("qty").collect().forall(_.getDouble(0) == 2.0))
  }

  test("frames appended to the capture file flow into later micro-batches") {
    import java.nio.file.StandardOpenOption.APPEND
    val framesFile = s"${tmp("ws_live")}/frames.jsonl"
    Files.write(Paths.get(framesFile),
      (1 to 4).map(i => frame(s"AAA${i}USDT", 1710000000000L + i))
        .mkString("\n").getBytes)
    val outDir = tmp("ws_live_out"); val ckpt = tmp("ws_live_ckpt")
    val raw = spark.readStream
      .format("graft.sources.WsReplayProvider")
      .option("path", framesFile)
      .option("framesPerBatch", 10)
      .load()
    val q = Normalizers.binance(raw.select(col("raw")), "usdt")
      .writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 4)
      // a live capture process appends more frames — the next trigger's
      // recount must pick them up
      Files.write(Paths.get(framesFile),
        ("\n" + (5 to 7).map(i => frame(s"AAA${i}USDT", 1710000000000L + i))
          .mkString("\n")).getBytes, APPEND)
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 7)
    } finally q.stop()
  }
}
