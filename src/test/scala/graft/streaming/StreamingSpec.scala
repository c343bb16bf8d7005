package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.normalize.{Fixtures, Normalizers}

/** End-to-end Structured Streaming specs: file-tail ingest (the Hyperliquid
  * adapter's backfill+tail), watermark-bounded dedup across micro-batches,
  * fan-out sinks, and the streaming dashboard aggregate. */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("file-tail stream: backfill + new-file rollover, dedup across batches") {
    val root = tmp("hl_root")
    val outDir = tmp("hl_out")
    val ckpt = tmp("hl_ckpt")
    // phase 1 backfill: first two fixture lines already present
    Files.write(java.nio.file.Paths.get(s"$root/hour1.json"),
      Fixtures.hyperliquid.take(2).mkString("", "\n", "\n").getBytes)

    val unified = StreamAssembly.hyperliquidNormalizedStream(
      StreamAssembly.hyperliquidFileStream(spark, root))
    val q = unified.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q.awaitTermination(60000)

    val afterBackfill = spark.read.parquet(outDir).count()
    assert(afterBackfill == 1)    // line 1 has the only self-liq fill; line 2 mismatch

    // phase 2 "tail": a new hour file arrives containing a duplicate of the
    // line-1 fill (same tid|user|coin) plus the rest of the fixtures
    Files.write(java.nio.file.Paths.get(s"$root/hour2.json"),
      Fixtures.hyperliquid.drop(2).mkString("", "\n", "\n").getBytes)
    val q2 = unified.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q2.awaitTermination(60000)

    val out = spark.read.parquet(outDir)
    // dup suppressed by dropDuplicatesWithinWatermark state across batches
    assert(out.count() == 3)
    assert(out.select("symbol").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("DOGEUSDC", "ETHUSDC", "SOLUSDC"))
  }

  test("fan-out sink: one micro-batch lands in CSV (daily-partitioned) and parquet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val csvDir = tmp("fan_csv"); val pqDir = tmp("fan_pq"); val ckpt = tmp("fan_ckpt")
    val mem = MemoryStream[String]
    mem.addData(Fixtures.binance: _*)
    val unified = Normalizers.binance(mem.toDF().withColumnRenamed("value", "raw"), "usdt")
    val q = StreamAssembly.fanOutSinks(unified, csvDir, pqDir, ckpt, triggerMs = 100L)
    try q.processAllAvailable() finally q.stop()
    val pq = spark.read.parquet(pqDir)
    assert(pq.count() == 4)
    val csv = spark.read.option("header", "true").csv(csvDir)
    assert(csv.count() == 4)
    assert(csv.columns.contains("day"))   // partition column = daily rotation
  }

  test("streaming dashboard: windowed notional aggregate emits after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val unified = Normalizers.binance(mem.toDF().withColumnRenamed("value", "raw"), "usdt")
    val dash = StreamAssembly.notionalDashboard(unified, watermark = "1 minute")
    val q = dash.writeStream.format("memory").queryName("dash")
      .outputMode("append").start()
    try {
      mem.addData(Fixtures.binance: _*)
      q.processAllAvailable()
      // push the watermark far past the fixture event times to close windows
      mem.addData("""{"e":"forceOrder","E":1710999999000,"o":{"s":"ZZZUSDT","S":"SELL","q":"1","p":"1","l":"1","T":1710999999000}}""")
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM dash").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getLong(3) >= 1))  // cnt per (minute, exchange, symbol)
    } finally q.stop()
  }
}
